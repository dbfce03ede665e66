"""DLRM serving CLI: load a quantized package and serve predictions.

ref: examples/dlrm/dlrm_packager.py + modules/dlrm_predict.py
(DLRMPredictFactory / DLRMPredictModule / DLRMModelConfig) — the
reference packages a quantized DLRM through torch.package and serves it
via the torchrec inference stack. Here the archive is the npz+manifest
directory written by `dlrm_main.py --package_dir`, and distributed
serving runs through `shard_quantized` (the reference's
`DistributedModelParallel(quantized, env=ShardingEnv.from_local(n))`
flow, SURVEY §3.5).

Usage:
  python examples/dlrm_main.py --synthetic --num_batches 50 \
      --package_dir /tmp/pkg
  python examples/dlrm_predict.py --package_dir /tmp/pkg \
      --world_size 4 --batch_size 256 --num_requests 20
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from typing import List, Optional


@dataclasses.dataclass
class DLRMModelConfig:
    """ref: modules/dlrm_predict.py DLRMModelConfig."""

    dense_arch_layer_sizes: List[int]
    dense_in_features: int
    embedding_dim: int
    id_list_features_keys: List[str]
    num_embeddings_per_feature: List[int]
    over_arch_layer_sizes: List[int]


def parse_args(argv):
    p = argparse.ArgumentParser(description="torchrec_tpu DLRM serving")
    p.add_argument("--package_dir", type=str, required=True)
    p.add_argument("--world_size", type=int, default=1,
                   help="inference devices (ShardingEnv.from_local)")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_requests", type=int, default=10)
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--dense_arch_layer_sizes", type=str,
                   default="512,256,64")
    p.add_argument("--over_arch_layer_sizes", type=str,
                   default="512,512,256,1")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--serve_batching", action="store_true",
                   help="serve ragged client requests through the "
                        "micro-batching queue (BatchingPredictServer) "
                        "instead of pre-batched calls — the reference's "
                        "serving-tier batching analogue")
    p.add_argument("--serve_native", action="store_true",
                   help="serve through the C++ batching queue + TCP "
                        "front (csrc/serving_queue.cpp) — the native "
                        "analogue of the reference's "
                        "inference/server.cpp + BatchingQueue.cpp; "
                        "clients speak the TRS1 wire protocol over "
                        "localhost TCP")
    p.add_argument("--serve_port", type=int, default=0,
                   help="TCP port for --serve_native (0 = ephemeral)")
    return p.parse_args(argv)


def make_predict_factory(config: DLRMModelConfig, package_dir: str,
                         world_size: int):
    """Rebuild the serving stack: model scaffolding -> PredictModule.load
    -> shard over the local inference mesh (ref: DLRMPredictFactory
    .create_predict_module)."""
    import jax  # noqa: F401  (backend init)
    import jax.numpy as jnp

    from torchrec_tpu.datasets.criteo import INT_FEATURE_COUNT
    from torchrec_tpu.inference import (
        PredictFactory,
        PredictModule,
        shard_quantized,
    )
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )

    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=config.num_embeddings_per_feature[i],
            embedding_dim=config.embedding_dim,
            name=f"t_{key}",
            feature_names=[key],
        )
        for i, key in enumerate(config.id_list_features_keys)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1
        ),
        dense_in_features=config.dense_in_features,
        dense_arch_layer_sizes=tuple(config.dense_arch_layer_sizes),
        over_arch_layer_sizes=tuple(config.over_arch_layer_sizes),
    ))
    env = ShardingEnv.from_local(world_size)
    dmp = DistributedModelParallel(
        model,
        env=env,
        plan=ShardingPlan({
            "dlrm/embedding_bag_collection": {
                t.name: ParameterSharding(ShardingType.TABLE_WISE,
                                          ranks=[i % world_size])
                for i, t in enumerate(tables)
            }
        }),
    )

    class DLRMPredictFactory(PredictFactory):
        """ref: modules/dlrm_predict.py DLRMPredictFactory."""

        def create_predict_module(self):
            pm = PredictModule.load(package_dir, dmp)
            return shard_quantized(pm, env)

        def batching_metadata(self):
            meta = {k: "sparse" for k in config.id_list_features_keys}
            meta["float_features"] = "dense"
            return meta

        def result_metadata(self):
            return "dense"

    return DLRMPredictFactory()


def main(argv: Optional[List[str]] = None) -> dict:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import json
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchrec_tpu.datasets.criteo import (
        DEFAULT_CAT_NAMES,
        INT_FEATURE_COUNT,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    # table geometry from the archive manifest (the reference ships a
    # pickled DLRMModelConfig inside the package; the npz manifest
    # carries the same information)
    with open(os.path.join(args.package_dir, "manifest.json")) as f:
        manifest = json.load(f)
    (ebc_key, tabs) = next(iter(manifest["quant"].items()))
    keys = [name[len("t_"):] for name in tabs]
    arrays = np.load(os.path.join(args.package_dir, "arrays.npz"))
    rows = [
        arrays[f"quant/{ebc_key}/{name}/data"].shape[0] for name in tabs
    ]

    config = DLRMModelConfig(
        dense_arch_layer_sizes=[
            int(x) for x in args.dense_arch_layer_sizes.split(",")
        ],
        dense_in_features=INT_FEATURE_COUNT,
        embedding_dim=args.embedding_dim,
        id_list_features_keys=keys,
        num_embeddings_per_feature=rows,
        over_arch_layer_sizes=[
            int(x) for x in args.over_arch_layer_sizes.split(",")
        ],
    )
    factory = make_predict_factory(
        config, args.package_dir, args.world_size
    )
    module = factory.create_predict_module()
    print("batching metadata:", factory.batching_metadata())

    rng = np.random.RandomState(args.seed)
    B, F = args.batch_size, len(keys)

    def request():
        sb = KeyedJaggedTensor.from_lengths(
            keys,
            jnp.asarray(
                np.concatenate(
                    [rng.randint(0, rows[i], B) for i in range(F)]
                ).astype(np.int32)
            ),
            jnp.asarray(np.ones(F * B, np.int32)),
        ).to_padded(1)
        dense = jnp.asarray(rng.randn(B, INT_FEATURE_COUNT).astype(np.float32))
        labels = jnp.zeros((B,), jnp.float32)
        return dense, sb, labels

    if args.serve_native:
        # C++ queue + TCP front: collation/demux/wire all native; Python
        # is only the jitted-predict executor (ref server.cpp role)
        from torchrec_tpu.inference.native_batching import (
            NativePredictServer,
            PredictClient,
        )
        from torchrec_tpu.sparse import PaddedSparseBatch

        def native_predict(dense, ids):
            sb = PaddedSparseBatch(
                ids=jnp.asarray(ids),
                lengths=jnp.ones((F, B), jnp.int32),
                keys=keys,
            )
            _, (_, logits, _) = module.predict(
                jnp.asarray(dense), sb, jnp.zeros((B,), jnp.float32)
            )
            return logits

        srv = NativePredictServer(
            native_predict, B, INT_FEATURE_COUNT, F, 1,
            max_latency_s=0.002,
        )
        port = srv.serve_tcp(args.serve_port)
        print(f"native TCP predict server on 127.0.0.1:{port}")
        cli = PredictClient(port)

        def ragged_np():
            nr = rng.randint(1, max(2, B // 4))
            return (
                rng.randn(nr, INT_FEATURE_COUNT).astype(np.float32),
                np.stack(
                    [rng.randint(0, rows[i], (nr, 1)) for i in range(F)]
                ).astype(np.int32),
            )

        warm = cli.predict(*ragged_np())  # compile
        cli.close()

        # concurrent connections, as a serving tier sees them (a single
        # serial client would measure round-trip latency, not throughput)
        import threading

        counts = []
        reqs = [ragged_np() for _ in range(args.num_requests)]

        def client(lo, hi):
            c = PredictClient(port)
            got = sum(c.predict(*reqs[i]).shape[0] for i in range(lo, hi))
            c.close()
            counts.append(got)

        n_cli = min(8, args.num_requests)
        per = args.num_requests // n_cli
        t0 = time.perf_counter()
        ts = [
            threading.Thread(
                target=client,
                args=(k * per,
                      (k + 1) * per if k < n_cli - 1 else args.num_requests),
            )
            for k in range(n_cli)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        n = sum(counts)
        srv.stop()
        qps = args.num_requests / dt
        print(
            f"native-served {args.num_requests} ragged TCP requests "
            f"(server batch {B}): {qps:.1f} req/s, "
            f"{n / dt:,.0f} predictions/s, warm_n={warm.shape[0]}"
        )
        return {"qps": qps, "predictions_per_sec": n / dt}

    if args.serve_batching:
        # ragged client requests -> static server batch via the
        # micro-batching queue (torchrec_tpu.inference.batching)
        from torchrec_tpu.inference.batching import (
            BatchingPredictServer,
            make_dlrm_collate,
        )

        def predict_logits(dense, sb, labels):
            _, (_, logits, _) = module.predict(dense, sb, labels)
            return logits

        srv = BatchingPredictServer(
            predict_logits, make_dlrm_collate(keys), B,
            n_examples=lambda r: r[0].shape[0], max_latency_s=0.002,
        )

        def ragged_request():
            nr = rng.randint(1, max(2, B // 4))
            return (
                rng.randn(nr, INT_FEATURE_COUNT).astype(np.float32),
                np.stack(
                    [rng.randint(0, rows[i], (nr, 1)) for i in range(F)]
                ).astype(np.int32),
            )

        warm = srv.predict(ragged_request(), timeout=120)  # compile
        t0 = time.perf_counter()
        futs = [
            srv.submit(ragged_request()) for _ in range(args.num_requests)
        ]
        n = sum(f.result(timeout=120).shape[0] for f in futs)
        dt = time.perf_counter() - t0
        srv.stop()
        qps = args.num_requests / dt
        print(
            f"micro-batched {args.num_requests} ragged requests "
            f"(server batch {B}): {qps:.1f} req/s, "
            f"{n / dt:,.0f} predictions/s, warm_n={warm.shape[0]}"
        )
        return {"qps": qps, "predictions_per_sec": n / dt}

    # warm (compile) then serve
    d, s, l = request()
    _, (_, logits, _) = module.predict(d, s, l)
    float(logits[0])
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.num_requests):
        d, s, l = request()
        _, (_, logits, _) = module.predict(d, s, l)
        n += B
    float(logits[0])
    dt = time.perf_counter() - t0
    qps = args.num_requests / dt
    print(
        f"served {args.num_requests} requests x B={B} over "
        f"{args.world_size} devices: {qps:.1f} req/s, "
        f"{n / dt:,.0f} predictions/s, "
        f"p_mean={float(jax.nn.sigmoid(logits).mean()):.4f}"
    )
    return {"qps": qps, "predictions_per_sec": n / dt}


if __name__ == "__main__":
    main()
