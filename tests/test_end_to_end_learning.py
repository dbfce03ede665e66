"""End-to-end learning validation: DLRM through DMP must actually learn
a synthetic click function of its sparse features (random-label smoke
runs cannot catch lookup/update routing bugs that preserve shapes).

ref test idea: test_installation.py smoke-train + the golden-parity
accuracy checks of test_model_parallel_base.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.models import DLRM, DLRMTrain
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.utils.metrics import auroc

F, B, ROWS, D = 4, 256, 200, 16


def _make_batch(rng, table_bias):
    """Clicks driven by a hidden per-id score -> learnable."""
    ids = rng.randint(0, ROWS, size=(F, B)).astype(np.int32)
    logit = sum(table_bias[f][ids[f]] for f in range(F))
    labels = (rng.rand(B) < 1.0 / (1.0 + np.exp(-logit))).astype(np.float32)
    dense = rng.randn(B, 4).astype(np.float32)
    kjt = KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(F)],
        jnp.asarray(ids.reshape(-1)),
        jnp.asarray(np.ones(F * B, np.int32)),
    )
    return dense, kjt.to_padded(1), labels


@pytest.mark.parametrize(
    "stype", [ShardingType.ROW_WISE, ShardingType.TABLE_WISE],
    ids=lambda s: s.value,
)
def test_dlrm_learns_synthetic_click_function(stype):
    rng = np.random.RandomState(0)
    table_bias = [rng.randn(ROWS) * 2.0 for _ in range(F)]
    tables = tuple(
        EmbeddingBagConfig(num_embeddings=ROWS, embedding_dim=D,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i in range(F)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1),
        dense_in_features=4,
        dense_arch_layer_sizes=(16, D),
        over_arch_layer_sizes=(32, 1),
    ))
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            t.name: ParameterSharding(stype) for t in tables}}),
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.adam(1e-2),
    )
    dense, sb, labels = _make_batch(rng, table_bias)
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, jnp.asarray(labels))
    step = dmp.make_train_step(donate=False)
    for i in range(60):
        dense, sb, labels = _make_batch(rng, table_bias)
        state, loss, _ = step(state, dense, sb, jnp.asarray(labels))

    # held-out evaluation
    dense, sb, labels = _make_batch(np.random.RandomState(777), table_bias)
    _, (_, logits, _) = dmp.forward(state, dense, sb, jnp.asarray(labels))
    score = auroc(np.asarray(jax.nn.sigmoid(logits)), labels)
    assert score > 0.75, f"model failed to learn: held-out AUROC {score:.3f}"


def test_orbax_exact_resume(tmp_path):
    """save_state/restore_state roundtrip: training continues identically
    (ref: SURVEY §5.4 resume contract)."""
    from torchrec_tpu.utils.checkpoint import restore_state, save_state

    rng = np.random.RandomState(1)
    table_bias = [rng.randn(ROWS) for _ in range(F)]
    tables = tuple(
        EmbeddingBagConfig(num_embeddings=ROWS, embedding_dim=D,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i in range(F)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1),
        dense_in_features=4,
        dense_arch_layer_sizes=(16, D),
        over_arch_layer_sizes=(32, 1),
    ))
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            t.name: ParameterSharding(ShardingType.ROW_WISE)
            for t in tables}}),
        dense_optimizer=optax.sgd(0.1),
    )
    dense, sb, labels = _make_batch(rng, table_bias)
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, jnp.asarray(labels))
    step = dmp.make_train_step(donate=False)
    state, _, _ = step(state, dense, sb, jnp.asarray(labels))
    save_state(str(tmp_path / "ck"), state)
    restored = restore_state(str(tmp_path / "ck"), state)

    s1, l1, _ = step(state, dense, sb, jnp.asarray(labels))
    s2, l2, _ = step(restored, dense, sb, jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s1.dense_params, s2.dense_params,
    )
