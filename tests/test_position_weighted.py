"""Learned position weights training through the sharded path.

ref: torchrec/distributed/grouped_position_weighted.py — the reference
learns per-position weights attached to a model-parallel table as KJT
weights before the pooled lookup. TPU re-design: route the table through
the SEQUENCE (unpooled) sharding so the position weighting + pooling run
in the dense autodiff region — the weights then get exact gradients with
zero extra machinery, at the cost of moving [B, L, D] instead of [B, D]
over the wire for those features (documented trade in PARITY.md).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.modules import EmbeddingConfig, EmbeddingCollection
from torchrec_tpu.modules.feature_processor import PositionWeightedModule
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

B, L, D, ROWS = 16, 4, 16, 80


class PwModel(nn.Module):
    """EmbeddingCollection + learned position-weighted pooling + head."""

    ec: EmbeddingCollection

    @nn.compact
    def __call__(self, sb, labels):
        """Call Args: sb padded sparse batch; labels [B]. Returns
        (loss, (loss, logits))."""
        toks = self.ec(sb)["f0"]  # [B, L, D]
        pw = self.param("pos_w", nn.initializers.ones, (L,))
        mask = (jnp.arange(L)[None, :] < sb.lengths[0][:, None]).astype(
            toks.dtype
        )
        pooled = (toks * (pw[None, :] * mask)[:, :, None]).sum(axis=1)
        logits = nn.Dense(1)(pooled)[:, 0]
        y = labels.astype(logits.dtype)
        loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        return loss, (loss, logits)


def _batch(seed):
    r = np.random.RandomState(seed)
    lengths = np.full((B,), L, np.int32)
    vals = r.randint(0, ROWS, size=(B * L,)).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)
    # target correlates with position 2's embedding content
    labels = (vals.reshape(B, L)[:, 2] % 2).astype(np.float32)
    return sb, jnp.asarray(labels)


@pytest.fixture(scope="module")
def env():
    return ShardingEnv.from_devices()


def test_position_weights_train_sharded(env):
    ec = EmbeddingCollection(
        tables=(
            EmbeddingConfig(
                num_embeddings=ROWS, embedding_dim=D, name="t0",
                feature_names=["f0"],
            ),
        ),
        max_feature_length=L,
    )
    model = PwModel(ec=ec)
    sb, labels = _batch(0)
    plan = ShardingPlan(
        {"ec": {"t0": ParameterSharding(ShardingType.ROW_WISE)}}
    )
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_params={"learning_rate": 0.3},
        dense_optimizer=optax.adam(5e-2),
    )
    state = dmp.init(jax.random.PRNGKey(0), sb, labels)
    pw0 = np.asarray(state.dense_params["pos_w"])
    np.testing.assert_allclose(pw0, 1.0)
    step = dmp.make_train_step(donate=False)
    losses = []
    for i in range(25):
        s, lab = _batch(i % 4)
        state, loss, _ = step(state, s, lab)
        losses.append(float(loss))
    pw1 = np.asarray(state.dense_params["pos_w"])
    assert losses[-1] < losses[0] - 0.05, (losses[0], losses[-1])
    # the position weights actually moved (got gradients)
    assert np.abs(pw1 - pw0).max() > 1e-3


def test_position_weighted_module_attaches_weights():
    """The unsharded PositionWeightedModule produces masked per-position
    weights as KJT weights (ref: feature_processor.py:29)."""
    sb, _ = _batch(1)
    mod = PositionWeightedModule(max_feature_lengths=(("f0", L),))
    params = mod.init(jax.random.PRNGKey(0), sb)
    out = mod.apply(params, sb)
    assert out.weights.shape == (1, B, L)
    np.testing.assert_allclose(np.asarray(out.weights), np.asarray(out.mask()))


class FpModel(nn.Module):
    """FP-EBC (position-weighted POOLED path) + linear head."""

    fpebc: nn.Module

    @nn.compact
    def __call__(self, sb, labels):
        """Call Args: sb padded sparse batch; labels [B]. Returns
        (loss, (loss, logits))."""
        pooled = self.fpebc(sb).values  # [B, D]
        logits = nn.Dense(1)(pooled)[:, 0]
        y = labels.astype(logits.dtype)
        loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        return loss, (loss, logits)


def test_fp_ebc_pooled_sharded_exact_grads(env):
    """Position weights on the POOLED sharded path get EXACT gradients:
    one DMP train step matches the unsharded autodiff golden step
    (ref: grouped_position_weighted.py:52-77 feeding a weighted EBC)."""
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
        FeatureProcessedEmbeddingBagCollection,
    )
    from torchrec_tpu.ops.fused_update import EmbOptimType

    LR_EMB_, LR_DENSE_ = 0.1, 0.05
    fpebc = FeatureProcessedEmbeddingBagCollection(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=(
                EmbeddingBagConfig(
                    num_embeddings=ROWS, embedding_dim=D, name="t0",
                    feature_names=["f0"],
                ),
            ),
            is_weighted=True,
            max_feature_length=L,
        ),
        feature_processor=PositionWeightedModule(
            max_feature_lengths=(("f0", L),)
        ),
    )
    model = FpModel(fpebc=fpebc)
    sb, labels = _batch(0)

    # unsharded golden: full autodiff, SGD everywhere
    params = model.init(jax.random.PRNGKey(0), sb, labels)["params"]
    # non-trivial position weights so the weighted path is exercised
    pw0 = jnp.asarray(np.linspace(0.5, 1.5, L, dtype=np.float32))
    params["fpebc"]["feature_processor"]["position_weight_f0"] = pw0
    (g_loss, (_, g_logits)), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, sb, labels), has_aux=True
    )(params)
    g_pw = grads["fpebc"]["feature_processor"]["position_weight_f0"]
    assert float(jnp.abs(g_pw).max()) > 1e-6  # the test is meaningful

    dmp = DistributedModelParallel(
        model,
        env=env,
        plan=ShardingPlan(
            {"fpebc": {"t0": ParameterSharding(ShardingType.ROW_WISE)}}
        ),
        fused_optim=EmbOptimType.EXACT_SGD,
        fused_params={"learning_rate": LR_EMB_},
        dense_optimizer=optax.sgd(LR_DENSE_),
    )
    state = dmp.init(jax.random.PRNGKey(0), sb, labels)
    # copy the golden params in
    new_dense = dict(state.dense_params)
    new_dense["fpebc"] = {
        "feature_processor": jax.tree.map(
            jnp.asarray, dict(params["fpebc"]["feature_processor"])
        )
    }
    new_dense["Dense_0"] = jax.tree.map(jnp.asarray, dict(params["Dense_0"]))
    state = state.replace(
        dense_params=new_dense,
        dense_opt=dmp.dense_optimizer.init(new_dense),
    )
    state = dmp.load_tables(
        state,
        {"fpebc": {"t0": np.asarray(
            params["fpebc"]["embedding_bag_collection"]["t0"]
        )}},
    )

    # forward parity
    loss0, (_, logits0) = dmp.forward(state, sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(g_logits), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(loss0), float(g_loss), rtol=1e-5)

    # one train step each; every param must match the golden SGD step
    step = dmp.make_train_step(donate=False)
    new_state, loss, _ = step(state, sb, labels)
    np.testing.assert_allclose(float(loss), float(g_loss), rtol=1e-5)

    got_pw = np.asarray(
        new_state.dense_params["fpebc"]["feature_processor"][
            "position_weight_f0"
        ]
    )
    np.testing.assert_allclose(
        got_pw, np.asarray(pw0 - LR_DENSE_ * g_pw), rtol=1e-5, atol=1e-6
    )
    got_t0 = dmp.state_dict(new_state)["embeddings/fpebc"]["t0"]
    ref_t0 = np.asarray(
        params["fpebc"]["embedding_bag_collection"]["t0"]
        - LR_EMB_ * grads["fpebc"]["embedding_bag_collection"]["t0"]
    )
    np.testing.assert_allclose(got_t0, ref_t0, rtol=1e-4, atol=1e-6)
