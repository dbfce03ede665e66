"""Quantization + inference tests (ref: torchrec/quant/tests,
distributed/tests/test_quant_model_parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.modules.embedding_configs import DataType, PoolingType
from torchrec_tpu.ops.quant import (
    dequantize_rows,
    quant_embedding_bag_lookup,
    quantize_rowwise,
    quantized_size_bytes,
)
from torchrec_tpu.quant import QuantEmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor


@pytest.mark.parametrize("bits", [8, 4, 2])
def test_quantize_dequantize_error_bounds(bits):
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(20, 16).astype(np.float32))
    qt = quantize_rowwise(w, bits)
    back = dequantize_rows(qt, jnp.arange(20))
    # max error ~ scale/2 per row
    row_range = np.asarray(w.max(axis=1) - w.min(axis=1))
    tol = row_range / ((1 << bits) - 1) * 0.51 + 1e-2
    err = np.abs(np.asarray(back) - np.asarray(w)).max(axis=1)
    assert (err <= tol).all(), (err, tol)


def test_quantize_packing_shapes():
    w = jnp.ones((4, 16))
    assert quantize_rowwise(w, 8).data.shape == (4, 16)
    assert quantize_rowwise(w, 4).data.shape == (4, 8)
    assert quantize_rowwise(w, 2).data.shape == (4, 4)
    assert quantized_size_bytes(100, 128, 4) == 100 * (64 + 8)


def test_quant_lookup_close_to_float():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(50, 8).astype(np.float32))
    qt = quantize_rowwise(w, 8)
    ids = jnp.asarray(rng.randint(0, 50, size=(2, 4, 3)), jnp.int32)
    lengths = jnp.asarray(rng.randint(0, 4, size=(2, 4)), jnp.int32)
    got = quant_embedding_bag_lookup(qt, ids, lengths)
    # float reference
    from torchrec_tpu.ops.embedding import batched_embedding_lookup, make_row_offsets
    ref = batched_embedding_lookup(w, ids, lengths, make_row_offsets([50]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15)


def test_quant_ebc_from_float_matches_float_ebc():
    tables = (
        EmbeddingBagConfig(num_embeddings=40, embedding_dim=8, name="t0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=30, embedding_dim=8, name="t1",
                           feature_names=["f1"]),
    )
    ebc = EmbeddingBagCollection(tables=tables, max_feature_length=2)
    rng = np.random.RandomState(0)
    lengths = rng.randint(0, 3, size=(2 * 6,)).astype(np.int32)
    vals = np.concatenate([
        rng.randint(0, [40, 30][i // 6], size=(lengths[i],))
        for i in range(12)
    ] + [np.zeros(0,)]).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        ["f0", "f1"], jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(2)
    params = ebc.init(jax.random.PRNGKey(0), sb)
    float_out = ebc.apply(params, sb)

    weights = {k: np.asarray(v) for k, v in params["params"].items()}
    qebc = QuantEmbeddingBagCollection.from_float(
        tables, weights, DataType.INT8, max_feature_length=2
    )
    q_out = qebc(sb)
    assert q_out.keys == float_out.keys
    np.testing.assert_allclose(
        np.asarray(q_out.values), np.asarray(float_out.values), atol=0.05
    )


def test_quantize_embeddings_predict_module(tmp_path):
    """End-to-end: train sharded DLRM -> quantize -> predict -> save/load."""
    import optax

    from torchrec_tpu.inference import PredictModule, quantize_embeddings
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=16, name=f"t{i}",
                           feature_names=[f"f{i}"]) for i in range(2)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables=tables,
                                                        max_feature_length=1),
        dense_in_features=4, dense_arch_layer_sizes=(8, 16),
        over_arch_layer_sizes=(8, 1)))
    rng = np.random.RandomState(0)
    B = 16
    sb = KeyedJaggedTensor.from_lengths(
        ["f0", "f1"],
        jnp.asarray(rng.randint(0, 64, 2 * B), jnp.int32),
        jnp.asarray(np.ones(2 * B, np.int32)),
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 4).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    dmp = DistributedModelParallel(
        model, env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            "t0": ParameterSharding(ShardingType.ROW_WISE),
            "t1": ParameterSharding(ShardingType.ROW_WISE)}}),
        dense_optimizer=optax.sgd(0.1))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    state, _, _ = dmp.make_train_step(donate=False)(state, dense, sb, labels)

    pm = quantize_embeddings(dmp, state, DataType.INT8)
    loss_q, (_, logits_q, _) = pm.predict(dense, sb, labels)
    loss_f, (_, logits_f, _) = dmp.forward(state, dense, sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits_q), np.asarray(logits_f), atol=0.05
    )
    assert pm.batching_metadata() == {"f0": "sparse", "f1": "sparse"}

    # save/load roundtrip
    pm.save(str(tmp_path / "pkg"))
    pm2 = PredictModule.load(str(tmp_path / "pkg"), dmp)
    loss_q2, (_, logits_q2, _) = pm2.predict(dense, sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits_q2), np.asarray(logits_q), rtol=1e-6
    )


def test_sharded_quant_ebc_matches_unsharded():
    """TW-sharded int8 inference over the mesh is bit-identical to the
    single-device quantized module (ref:
    distributed/tests/test_quant_model_parallel.py)."""
    import jax

    from torchrec_tpu.parallel import ShardingEnv
    from torchrec_tpu.parallel.quant_sharded import (
        ShardedQuantEmbeddingBagCollection,
    )
    from torchrec_tpu.quant.embedding_modules import QuantEmbeddingBagCollection
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rng = np.random.RandomState(0)
    B, L = 16, 2
    tables = (
        EmbeddingBagConfig(num_embeddings=50, embedding_dim=16, name="q0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=30, embedding_dim=16, name="q1",
                           feature_names=["f1", "f2"]),
        EmbeddingBagConfig(num_embeddings=40, embedding_dim=16, name="q2",
                           feature_names=["f3"], pooling=PoolingType.MEAN),
    )
    weights = {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(np.float32)
        for t in tables
    }
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    vals = []
    for fi, f in enumerate(feats):
        for b in range(B):
            vals.extend(
                rng.randint(0, rows[f], size=(lengths[fi * B + b],)).tolist()
            )
    kjt = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(np.asarray(vals, np.int32)), jnp.asarray(lengths)
    )
    sb = kjt.to_padded(L)

    env = ShardingEnv.from_devices()
    sharded = ShardedQuantEmbeddingBagCollection.from_float(
        env, tables, weights, max_feature_length=L,
        table_ranks={"q0": 0, "q1": 3, "q2": 3},
    )
    unsharded = QuantEmbeddingBagCollection.from_float(
        tables, weights, max_feature_length=L
    )
    got = sharded(sb)
    want = unsharded(sb)
    assert got.keys == want.keys
    np.testing.assert_array_equal(
        np.asarray(got.values), np.asarray(want.values)
    )


def test_predict_factory_packager(tmp_path):
    """ref: inference/model_packager.py:46-99 export contract."""
    import optax

    from torchrec_tpu.inference import quantize_embeddings
    from torchrec_tpu.inference.modules import (
        PredictFactory,
        PredictFactoryPackager,
    )
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    tables = (
        EmbeddingBagConfig(num_embeddings=40, embedding_dim=8, name="t0",
                           feature_names=["f0"]),
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1),
        dense_in_features=4, dense_arch_layer_sizes=(8, 8),
        over_arch_layer_sizes=(8, 1)))
    rng = np.random.RandomState(0)
    B = 8
    sb = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.asarray(rng.randint(0, 40, B), jnp.int32),
        jnp.asarray(np.ones(B, np.int32))).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 4).astype(np.float32))
    labels = jnp.asarray(np.zeros(B, np.float32))
    dmp = DistributedModelParallel(
        model, env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            "t0": ParameterSharding(ShardingType.ROW_WISE)}}),
        dense_optimizer=optax.sgd(0.1))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)

    class Factory(PredictFactory):
        def create_predict_module(self):
            return quantize_embeddings(dmp, state, DataType.INT8)

        def batching_metadata(self):
            return {"f0": "sparse"}

    out = str(tmp_path / "pkg")
    PredictFactoryPackager.save_predict_factory(Factory(), out)
    meta = PredictFactoryPackager.load_metadata(out)
    assert meta["factory_class"].endswith("Factory")
    assert meta["batching_metadata"] == {"f0": "sparse"}
    import os as _os
    assert _os.path.exists(out + "/arrays.npz")


def test_eval_pipeline():
    """EvalPipeline prefetch contract (ref: TrainPipelineBase eval use)."""
    from torchrec_tpu.parallel.train_pipeline import EvalPipeline

    seen = []

    def eval_step(state, batch):
        seen.append(int(np.asarray(batch)))
        return batch * 2

    pipe = EvalPipeline(eval_step, state=None)
    it = iter([jnp.asarray(i) for i in range(5)])
    outs = []
    while True:
        try:
            outs.append(int(np.asarray(pipe.progress(it))))
        except StopIteration:
            break
    assert seen == [0, 1, 2, 3, 4]
    assert outs == [0, 2, 4, 6, 8]
