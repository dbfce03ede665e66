"""Serving-tier micro-benchmark: Python batcher vs native C++ queue.

Measures end-to-end ragged-request throughput through the SAME jitted
int8 DLRM predict for (a) BatchingPredictServer (pure Python collation/
demux), (b) NativePredictServer in-process futures, and (c) the native
TCP front. CPU-mesh numbers characterize the HOST-side tier cost (the
device work is identical); on a real chip run the same script without
JAX_PLATFORMS=cpu.

    JAX_PLATFORMS=cpu python tools/bench_serving.py --requests 400
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_feats", type=int, default=26)
    p.add_argument("--dense_dim", type=int, default=13)
    p.add_argument("--clients", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchrec_tpu.inference.batching import (
        BatchingPredictServer,
        make_dlrm_collate,
    )
    from torchrec_tpu.inference.native_batching import (
        NativePredictServer,
        PredictClient,
    )
    from torchrec_tpu.models.dlrm import DLRM
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.sparse import PaddedSparseBatch

    B, F, D = args.batch_size, args.num_feats, args.dense_dim
    keys = tuple(f"f{i}" for i in range(F))
    tables = tuple(
        EmbeddingBagConfig(name=f"t{i}", embedding_dim=32,
                           num_embeddings=10_000, feature_names=[keys[i]])
        for i in range(F)
    )
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables=tables),
        dense_in_features=D,
        dense_arch_layer_sizes=(64, 32),
        over_arch_layer_sizes=(64, 1),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, D), jnp.float32),
        PaddedSparseBatch(
            ids=jnp.zeros((F, B, 1), jnp.int32),
            lengths=jnp.ones((F, B), jnp.int32), keys=keys,
        ),
    )

    @jax.jit
    def logits(dense, sb):
        return model.apply(params, dense, sb).reshape(-1)

    rng = np.random.RandomState(0)
    reqs = []
    for _ in range(args.requests):
        n = rng.randint(1, max(2, B // 4))
        reqs.append((
            rng.randn(n, D).astype(np.float32),
            rng.randint(0, 10_000, (F, n, 1)).astype(np.int32),
        ))

    def fan_out(submit_fn):
        """args.clients threads pushing the request list; returns req/s,
        preds/s."""
        counts, errs = [], []

        def worker(lo, hi):
            try:
                counts.append(sum(submit_fn(reqs[i]).shape[0]
                                  for i in range(lo, hi)))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        per = len(reqs) // args.clients
        t0 = time.perf_counter()
        ts = [threading.Thread(
            target=worker,
            args=(c * per, (c + 1) * per if c < args.clients - 1
                  else len(reqs)))
            for c in range(args.clients)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        assert not errs, errs[0]
        return len(reqs) / dt, sum(counts) / dt

    # (a) Python batcher
    def py_predict(dense, sb, labels):
        del labels
        return logits(dense, sb)

    pyb = BatchingPredictServer(
        py_predict, make_dlrm_collate(keys), B,
        n_examples=lambda r: r[0].shape[0], max_latency_s=0.002,
    )
    pyb.predict(reqs[0], timeout=120)  # compile
    qps, pps = fan_out(lambda r: pyb.predict(r, timeout=120))
    pyb.stop()
    print(f"python_batcher: {qps:,.0f} req/s, {pps:,.0f} preds/s")

    # (b) native in-process
    def native_predict(dense, ids):
        sb = PaddedSparseBatch(
            ids=jnp.asarray(ids),
            lengths=jnp.ones((F, B), jnp.int32), keys=keys,
        )
        return logits(jnp.asarray(dense), sb)

    nat = NativePredictServer(
        native_predict, B, D, F, 1, max_latency_s=0.002,
    )
    nat.predict(*reqs[0], timeout=120)  # compile
    qps, pps = fan_out(lambda r: nat.predict(*r, timeout=120))
    print(f"native_inproc:  {qps:,.0f} req/s, {pps:,.0f} preds/s")

    # (c) native TCP front (per-client connections)
    port = nat.serve_tcp(0)
    local = threading.local()

    def tcp_predict(r):
        if not hasattr(local, "cli"):
            local.cli = PredictClient(port)
        return local.cli.predict(*r)

    qps, pps = fan_out(tcp_predict)
    print(f"native_tcp:     {qps:,.0f} req/s, {pps:,.0f} preds/s")
    nat.stop()


if __name__ == "__main__":
    main()
