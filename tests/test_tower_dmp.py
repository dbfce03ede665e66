"""Embedding towers through DistributedModelParallel (VERDICT r1 item 2).

ref: the reference swaps EmbeddingTower(Collection) via
EmbeddingTower(Collection)Sharder inside DMP (model_parallel.py:310-341,
embedding_tower_sharding.py:835-941) and the planner keeps each tower's
tables on one rank (planner/enumerators.py:130-135 dependency tagging).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.modules.embedding_tower import (
    EmbeddingTower,
    EmbeddingTowerCollection,
)
from torchrec_tpu.modules.mlp import MLP
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ShardingEnv,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

B, L, DIM, LR = 16, 2, 8, 0.1


def _towers():
    return (
        EmbeddingTower(
            embedding_module=EmbeddingBagCollection(
                tables=(
                    EmbeddingBagConfig(num_embeddings=50, embedding_dim=DIM,
                                       name="a0", feature_names=["fa0"]),
                    EmbeddingBagConfig(num_embeddings=30, embedding_dim=DIM,
                                       name="a1",
                                       feature_names=["fa1", "fa2"]),
                ),
                max_feature_length=L,
            ),
            interaction_module=MLP(layer_sizes=(12, 6)),
        ),
        EmbeddingTower(
            embedding_module=EmbeddingBagCollection(
                tables=(
                    EmbeddingBagConfig(num_embeddings=40, embedding_dim=DIM,
                                       name="b0", feature_names=["fb0"]),
                ),
                max_feature_length=L,
            ),
            interaction_module=MLP(layer_sizes=(10,)),
        ),
    )


class TowerModel(nn.Module):
    etc: EmbeddingTowerCollection

    @nn.compact
    def __call__(self, sb, labels):
        """Call Args: sb padded sparse batch; labels [B]. Returns
        (loss, (loss, logits))."""
        logits = nn.Dense(1)(self.etc(sb))[:, 0]
        y = labels.astype(logits.dtype)
        loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        return loss, (loss, logits)


def _batch(seed=7):
    rng = np.random.RandomState(seed)
    feats = ["fa0", "fa1", "fa2", "fb0"]
    rows = {"fa0": 50, "fa1": 30, "fa2": 30, "fb0": 40}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    values = []
    for fi, f in enumerate(feats):
        for b in range(B):
            n = lengths[fi * B + b]
            values.extend(rng.randint(0, rows[f], size=(n,)).tolist())
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(np.asarray(values, np.int32)), jnp.asarray(lengths)
    ).to_padded(L)
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    return sb, labels


@pytest.fixture(scope="module")
def golden():
    model = TowerModel(etc=EmbeddingTowerCollection(towers=_towers()))
    sb, labels = _batch()
    params = model.init(jax.random.PRNGKey(0), sb, labels)["params"]
    (loss, (_, logits)), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, sb, labels), has_aux=True
    )(params)
    new_params = jax.tree.map(lambda p, g: p - LR * g, params, grads)
    return model, sb, labels, params, loss, logits, new_params


def _make_dmp(model):
    return DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        fused_optim=EmbOptimType.EXACT_SGD,
        fused_params={"learning_rate": LR},
        dense_optimizer=optax.sgd(LR),
    )


def _load_golden(dmp, state, params):
    """Copy the golden init into the DMP state (tables + interaction +
    dense head)."""
    tables = {
        name: np.asarray(params["etc"][f"towers_{i}"]["embedding_module"][name])
        for i, names in enumerate((("a0", "a1"), ("b0",)))
        for name in names
    }
    state = dmp.load_tables(state, {"etc": tables})
    tc_state = state.emb_states["etc"]
    inter = tuple(
        jax.device_put(
            jax.tree.map(
                jnp.asarray,
                dict(params["etc"][f"towers_{i}"]["interaction_module"]),
            ),
            jax.sharding.NamedSharding(
                dmp.env.mesh, jax.sharding.PartitionSpec()
            ),
        )
        for i in range(2)
    )
    state = state.replace(
        emb_states={"etc": tc_state.replace(interaction_params=inter)}
    )
    dense = dict(state.dense_params)
    dense["Dense_0"] = jax.tree.map(jnp.asarray, dict(params["Dense_0"]))
    return state.replace(
        dense_params=dense, dense_opt=dmp.dense_optimizer.init(dense)
    )


def test_tower_collection_through_dmp_golden_step(golden):
    """DMP(model-with-towers) plans tower placement itself, swaps in the
    sharded tower collection, and one SGD train step matches the
    unsharded golden step on every table, interaction param and the dense
    head."""
    model, sb, labels, params, g_loss, g_logits, g_new = golden
    dmp = _make_dmp(model)
    assert dmp._kinds["etc"] == "tower"
    # planner co-located each tower's tables on one device
    tc = dmp.sharded_ebcs["etc"]
    devs = {t.name: tw.device for tw in tc.towers for t in tw.tables}
    assert devs["a0"] == devs["a1"]

    state = dmp.init(jax.random.PRNGKey(1), sb, labels)
    state = _load_golden(dmp, state, params)

    loss0, (_, logits0) = dmp.forward(state, sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(g_logits), rtol=1e-4, atol=1e-5
    )

    step = dmp.make_train_step(donate=False)
    new_state, loss, _ = step(state, sb, labels)
    np.testing.assert_allclose(float(loss), float(g_loss), rtol=1e-5)

    got_tables = dmp.state_dict(new_state)["embeddings/etc"]
    for i, names in enumerate((("a0", "a1"), ("b0",))):
        for name in names:
            np.testing.assert_allclose(
                got_tables[name],
                np.asarray(
                    g_new["etc"][f"towers_{i}"]["embedding_module"][name]
                ),
                rtol=1e-4, atol=1e-6, err_msg=name,
            )
    # interaction params followed the golden SGD step too
    got_inter = new_state.emb_states["etc"].interaction_params
    for i in range(2):
        want_leaves = jax.tree.leaves(
            g_new["etc"][f"towers_{i}"]["interaction_module"]
        )
        got_leaves = jax.tree.leaves(got_inter[i])
        assert len(got_leaves) == len(want_leaves)
        for a, b in zip(got_leaves, want_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"tower {i} interaction params",
            )


def test_tower_dmp_trains(golden):
    """A few steps through the DMP tower path decrease the loss."""
    model, sb, labels, *_ = golden
    dmp = _make_dmp(model)
    state = dmp.init(jax.random.PRNGKey(2), sb, labels)
    step = dmp.make_train_step(donate=False)
    losses = []
    for i in range(8):
        s, lab = _batch(i % 2)
        state, loss, _ = step(state, s, lab)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_single_tower_through_dmp():
    """A bare EmbeddingTower (not a collection) also swaps through DMP."""

    class OneTower(nn.Module):
        tower: EmbeddingTower

        @nn.compact
        def __call__(self, sb, labels):
            """Call Args: sb padded sparse batch; labels [B]. Returns
            (loss, (loss, logits))."""
            logits = nn.Dense(1)(self.tower(sb))[:, 0]
            y = labels.astype(logits.dtype)
            loss = jnp.mean((logits - y) ** 2)
            return loss, (loss, logits)

    model = OneTower(tower=_towers()[0])
    sb, labels = _batch()
    dmp = _make_dmp(model)
    assert dmp._kinds["tower"] == "tower"
    state = dmp.init(jax.random.PRNGKey(3), sb, labels)
    step = dmp.make_train_step(donate=False)
    losses = []
    for i in range(6):
        s, lab = _batch(i % 2)
        state, loss, _ = step(state, s, lab)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
