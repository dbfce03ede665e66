"""Native (C++) serving tier: batching queue + TCP predict front.

csrc/serving_queue.cpp + inference/native_batching.py — the TPU-native
counterpart of the reference's C++ inference runtime (BatchingQueue.cpp
deadline/size coalescing, Batching.cpp per-feature collation,
ResultSplit.cpp demux, server.cpp RPC front)."""

import threading
import time

import numpy as np
import pytest

from torchrec_tpu.inference.native_batching import (
    NativePredictServer,
    PredictClient,
    native_serving_available,
)

pytestmark = pytest.mark.skipif(
    not native_serving_available(), reason="g++ toolchain unavailable"
)

B, D, F, L = 8, 2, 3, 1


def _predict(dense, ids):
    # deterministic "model": per-example sum of dense + sum of ids
    return dense.sum(axis=1) + ids.sum(axis=(0, 2)).astype(np.float32)


def _expected(dense, ids):
    return (dense.sum(axis=1)
            + ids.sum(axis=(0, 2)).astype(np.float32))[:, None]


def _req(rng, n, fill=None):
    dense = (np.full((n, D), fill, np.float32) if fill is not None
             else rng.rand(n, D).astype(np.float32))
    ids = rng.randint(0, 100, size=(F, n, L)).astype(np.int32)
    return dense, ids


def _server(**kw):
    kw.setdefault("max_latency_s", 0.02)
    return NativePredictServer(_predict, B, D, F, L, **kw)


def test_coalesce_and_demux():
    srv = _server(max_latency_s=5.0)  # force coalescing to a full batch
    try:
        rng = np.random.RandomState(0)
        reqs = [_req(rng, n) for n in (3, 2, 3)]  # exactly B examples
        futs = [srv.submit(d, i) for d, i in reqs]
        for f, (d, i) in zip(futs, reqs):
            np.testing.assert_allclose(
                f.result(timeout=10), _expected(d, i), rtol=1e-6
            )
    finally:
        srv.stop()


def test_partial_batch_deadline_flush():
    srv = _server(max_latency_s=0.05)
    try:
        rng = np.random.RandomState(1)
        d, i = _req(rng, 2)
        t0 = time.monotonic()
        out = srv.predict(d, i, timeout=10)
        assert time.monotonic() - t0 < 2.0
        np.testing.assert_allclose(out, _expected(d, i), rtol=1e-6)
    finally:
        srv.stop()


@pytest.mark.parametrize("pipeline", [False, True])
def test_requests_never_split_across_batches(pipeline):
    # a request larger than the remaining batch space rides the NEXT
    # batch whole (FIFO prefix rule) — outputs must still be correct,
    # with and without the double-buffered executor pipeline
    srv = _server(max_latency_s=0.01, pipeline=pipeline)
    try:
        rng = np.random.RandomState(2)
        reqs = [_req(rng, n) for n in (5, 6, 7, 4)]
        futs = [srv.submit(d, i) for d, i in reqs]
        for f, (d, i) in zip(futs, reqs):
            np.testing.assert_allclose(
                f.result(timeout=10), _expected(d, i), rtol=1e-6
            )
    finally:
        srv.stop()


def test_oversized_and_stopped_rejected():
    srv = _server()
    rng = np.random.RandomState(3)
    d, i = _req(rng, B + 1)
    with pytest.raises(RuntimeError, match="bad request size"):
        srv.submit(d, i).result(timeout=5)
    srv.stop()
    d, i = _req(rng, 1)
    with pytest.raises(RuntimeError, match="server stopped"):
        srv.submit(d, i).result(timeout=5)


def test_executor_exception_propagates_per_request():
    calls = {"n": 0}

    def flaky(dense, ids):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("boom on batch 1")
        return _predict(dense, ids)

    srv = NativePredictServer(flaky, B, D, F, L, max_latency_s=0.02)
    try:
        rng = np.random.RandomState(4)
        d, i = _req(rng, 3)
        with pytest.raises(RuntimeError, match="boom on batch 1"):
            srv.predict(d, i, timeout=10)
        d2, i2 = _req(rng, 3)  # server must survive the failed batch
        np.testing.assert_allclose(
            srv.predict(d2, i2, timeout=10), _expected(d2, i2), rtol=1e-6
        )
    finally:
        srv.stop()


def test_concurrent_clients_all_served():
    srv = _server(max_latency_s=0.005)
    results = {}
    errors = []

    def client(k):
        rng = np.random.RandomState(100 + k)
        try:
            d, i = _req(rng, 1 + k % 4)
            results[k] = (srv.predict(d, i, timeout=30), _expected(d, i))
        except Exception as e:  # noqa: BLE001
            errors.append((k, e))

    try:
        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert len(results) == 24
        for out, want in results.values():
            np.testing.assert_allclose(out, want, rtol=1e-6)
    finally:
        srv.stop()


def test_tcp_round_trip():
    srv = _server(max_latency_s=0.005)
    try:
        port = srv.serve_tcp(0)
        cli = PredictClient(port)
        rng = np.random.RandomState(5)
        for n in (1, 3, B):
            d, i = _req(rng, n)
            np.testing.assert_allclose(
                cli.predict(d, i), _expected(d, i), rtol=1e-6
            )
        cli.close()
    finally:
        srv.stop()


def test_tcp_concurrent_connections():
    srv = _server(max_latency_s=0.005)
    try:
        port = srv.serve_tcp(0)
        results = {}
        errors = []

        def client(k):
            rng = np.random.RandomState(200 + k)
            try:
                cli = PredictClient(port)
                for _ in range(3):
                    d, i = _req(rng, 1 + k % 3)
                    np.testing.assert_allclose(
                        cli.predict(d, i), _expected(d, i), rtol=1e-6
                    )
                cli.close()
                results[k] = True
            except Exception as e:  # noqa: BLE001
                errors.append((k, e))

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert len(results) == 8
    finally:
        srv.stop()


def test_lone_requests_not_held_by_double_buffering():
    # the double-buffered executor holds batch k's dispatched results
    # while waiting for batch k+1 — a BOUNDED wait must post them even
    # when no further traffic ever arrives (pipeline forced on: the CPU
    # auto-default turns it off)
    srv = _server(max_latency_s=0.005, pipeline=True)
    try:
        rng = np.random.RandomState(10)
        for _ in range(3):  # each predict is a lone batch, then silence
            d, i = _req(rng, 2)
            t0 = time.monotonic()
            out = srv.predict(d, i, timeout=10)
            assert time.monotonic() - t0 < 1.0
            np.testing.assert_allclose(out, _expected(d, i), rtol=1e-6)
            time.sleep(0.05)
    finally:
        srv.stop()


def test_many_inflight_submits_single_drain_thread():
    # 300 in-flight futures resolve through ONE completion-queue drain
    # thread — no per-request waiter threads
    srv = _server(max_latency_s=0.002, max_pending=4096)
    try:
        rng = np.random.RandomState(11)
        before = threading.active_count()
        reqs = [_req(rng, 1 + (k % 3)) for k in range(300)]
        futs = [srv.submit(d, i) for d, i in reqs]
        during = threading.active_count()
        assert during - before < 10, (before, during)
        for f, (d, i) in zip(futs, reqs):
            np.testing.assert_allclose(
                f.result(timeout=60), _expected(d, i), rtol=1e-6
            )
    finally:
        srv.stop()


def test_stop_with_open_idle_connection_returns():
    # an idle client parked in the server's recv() must not deadlock
    # stop(): srv_stop shuts the handler sockets down before joining
    srv = _server()
    try:
        port = srv.serve_tcp(0)
        cli = PredictClient(port)
        rng = np.random.RandomState(6)
        d, i = _req(rng, 2)
        cli.predict(d, i)  # connection now idle but OPEN
        t0 = time.monotonic()
        srv.stop()
        assert time.monotonic() - t0 < 5.0
        cli.close()
    finally:
        srv.stop()


def test_second_serve_tcp_rejected():
    srv = _server()
    try:
        srv.serve_tcp(0)
        with pytest.raises(RuntimeError, match="already started"):
            srv.serve_tcp(0)
    finally:
        srv.stop()


def test_matches_python_batcher_on_jitted_quant_dlrm():
    """e2e: the native server and the Python BatchingPredictServer serve
    the SAME jitted int8 DLRM and must return identical predictions."""
    import jax
    import jax.numpy as jnp

    from torchrec_tpu.inference.batching import (
        BatchingPredictServer,
        make_dlrm_collate,
    )
    from torchrec_tpu.models.dlrm import DLRM
    from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
    from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
    from torchrec_tpu.sparse import PaddedSparseBatch

    keys = ("f0", "f1", "f2")
    tables = tuple(
        EmbeddingBagConfig(name=f"t{k}", embedding_dim=16,
                           num_embeddings=100, feature_names=[keys[k]])
        for k in range(F)
    )
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables=tables),
        dense_in_features=D,
        dense_arch_layer_sizes=(8, 16), over_arch_layer_sizes=(8, 1),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, D), jnp.float32),
        PaddedSparseBatch(
            ids=jnp.zeros((F, B, L), jnp.int32),
            lengths=jnp.ones((F, B), jnp.int32),
            keys=keys,
        ),
    )

    @jax.jit
    def logits(dense, sb):
        return model.apply(params, dense, sb).reshape(-1)

    def native_predict(dense, ids):
        sb = PaddedSparseBatch(
            ids=jnp.asarray(ids),
            lengths=jnp.ones((F, B), jnp.int32) * L,
            keys=keys,
        )
        return logits(jnp.asarray(dense), sb)

    def py_predict(dense, sb, labels):
        del labels
        return logits(dense, sb)

    nat = NativePredictServer(native_predict, B, D, F, L,
                              max_latency_s=0.005)
    pyb = BatchingPredictServer(
        py_predict, make_dlrm_collate(keys), B,
        n_examples=lambda r: r[0].shape[0], max_latency_s=0.005,
    )
    try:
        rng = np.random.RandomState(7)
        for n in (1, 4, B):
            d = rng.rand(n, D).astype(np.float32)
            i = rng.randint(0, 100, size=(F, n, L)).astype(np.int32)
            out_n = nat.predict(d, i, timeout=30).reshape(-1)
            out_p = np.asarray(pyb.predict((d, i), timeout=30)).reshape(-1)
            np.testing.assert_allclose(out_n, out_p, rtol=1e-5, atol=1e-6)
    finally:
        nat.stop()
        pyb.stop()
