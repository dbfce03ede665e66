"""BatchingPredictServer: micro-batched serving over one static-shape
jitted predict (the TPU-native stand-in for the reference's serving-tier
batching queue; ref inference/modules.py:64-99 batching_metadata)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.inference.batching import (
    BatchingPredictServer,
    make_dlrm_collate,
)

B = 8


def _echo_predict(x):
    # identity "model": returns its [B, 2] input, jitted once
    return jnp.asarray(x) * 2.0


def _collate(requests, batch_size):
    arr = np.concatenate(requests, axis=0)
    n = arr.shape[0]
    if n < batch_size:
        arr = np.concatenate(
            [arr, np.repeat(arr[:1], batch_size - n, axis=0)]
        )
    return (arr.astype(np.float32),)


def _server(**kw):
    return BatchingPredictServer(
        jax.jit(_echo_predict), _collate, B,
        n_examples=lambda r: r.shape[0], **kw,
    )


def test_full_batch_coalesced_and_demuxed():
    srv = _server(max_latency_s=5.0)  # no deadline flush: force coalesce
    try:
        reqs = [np.full((n, 2), i, np.float32)
                for i, n in enumerate([3, 2, 3])]
        futs = [srv.submit(r) for r in reqs]
        for i, (f, r) in enumerate(zip(futs, reqs)):
            out = f.result(timeout=10)
            np.testing.assert_allclose(out, r * 2.0)
            assert out.shape == r.shape
    finally:
        srv.stop()


def test_partial_batch_flushes_on_deadline():
    srv = _server(max_latency_s=0.05)
    try:
        t0 = time.monotonic()
        out = srv.predict(np.ones((2, 2), np.float32), timeout=10)
        dt = time.monotonic() - t0
        np.testing.assert_allclose(out, 2.0 * np.ones((2, 2)))
        assert dt < 2.0  # flushed by deadline, not stuck waiting for B
    finally:
        srv.stop()


def test_oversized_request_rejected():
    srv = _server()
    try:
        with pytest.raises(ValueError, match="exceeds server batch"):
            srv.submit(np.ones((B + 1, 2), np.float32))
    finally:
        srv.stop()


def test_concurrent_clients_all_served():
    srv = _server(max_latency_s=0.01)
    results = {}

    def client(i):
        r = np.full((1 + i % 3, 2), i, np.float32)
        results[i] = (r, srv.predict(r, timeout=20))

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(20)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 20
        for i, (r, out) in results.items():
            np.testing.assert_allclose(out, r * 2.0)
    finally:
        srv.stop()


def test_predict_error_propagates_to_futures():
    def boom(x):
        raise RuntimeError("model exploded")

    srv = BatchingPredictServer(
        boom, _collate, B, n_examples=lambda r: r.shape[0],
        max_latency_s=0.01,
    )
    try:
        f = srv.submit(np.ones((1, 2), np.float32))
        with pytest.raises(RuntimeError, match="model exploded"):
            f.result(timeout=10)
    finally:
        srv.stop()


def test_dlrm_collate_through_quantized_serving():
    """End-to-end: the DLRM collate feeds a real quantized PredictModule
    through the server; batched responses match direct predicts."""
    import optax

    from torchrec_tpu.inference.modules import quantize_embeddings
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.modules.embedding_configs import DataType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    F, L, D, ROWS = 2, 1, 16, 64
    keys = [f"f{i}" for i in range(F)]
    tables = tuple(
        EmbeddingBagConfig(num_embeddings=ROWS, embedding_dim=D,
                           name=f"t{i}", feature_names=[keys[i]])
        for i in range(F)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=L),
        dense_in_features=4, dense_arch_layer_sizes=(8, D),
        over_arch_layer_sizes=(8, 1),
    ))
    dmp = DistributedModelParallel(
        model, env=ShardingEnv.from_devices(jax.devices()[:1]),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            f"t{i}": ParameterSharding(ShardingType.ROW_WISE)
            for i in range(F)
        }}),
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.1),
    )
    rng = np.random.RandomState(0)
    sb0 = KeyedJaggedTensor.from_lengths(
        keys, jnp.asarray(rng.randint(0, ROWS, F * B), jnp.int32),
        jnp.asarray(np.ones(F * B, np.int32)),
    ).to_padded(L)
    dense0 = jnp.asarray(rng.randn(B, 4).astype(np.float32))
    labels0 = jnp.zeros((B,), jnp.float32)
    state = dmp.init(jax.random.PRNGKey(0), dense0, sb0, labels0)
    pm = quantize_embeddings(dmp, state, DataType.INT8)

    def predict_logits(dense, sb, labels):
        _, (_, logits, _) = pm.predict(dense, sb, labels)
        return logits

    srv = BatchingPredictServer(
        predict_logits, make_dlrm_collate(keys), B,
        n_examples=lambda r: r[0].shape[0], max_latency_s=0.02,
    )
    try:
        reqs = []
        for i in range(5):
            n = 1 + i % 3
            reqs.append((
                rng.randn(n, 4).astype(np.float32),
                rng.randint(0, ROWS, (F, n, L)).astype(np.int32),
            ))
        futs = [srv.submit(r) for r in reqs]
        outs = [f.result(timeout=20) for f in futs]
        # reference: each request predicted alone through the collate
        for (dense, ids), out in zip(reqs, outs):
            args = make_dlrm_collate(keys)([(dense, ids)], B)
            want = np.asarray(predict_logits(*args))[: dense.shape[0]]
            np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
    finally:
        srv.stop()
