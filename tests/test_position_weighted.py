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
