"""r4: AOT-compile the EXACT bench fused step (on-device batch gen +
donated train step, bench.py:_throughput) for an abstract v5e topology
— no TPU needed — and report every `copy`/big op with its provenance
metadata. Built to chase the two ~5 ms whole-table copies the pod-shard
trace found (tools/trace_pod_r4.py): copy.49 + copy_bitcast_fusion,
each ~= table_bytes x 2 / stream_bw.

Run: python tools/hlo_step_r4.py [pod|bench|hbm] [exact_sgd|rowwise_adagrad]
     [--dump FILE] [--no-donate]
(uses JAX_PLATFORMS=cpu + abstract topology; strips axon automatically)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must happen before jax import: the axon sitecustomize would otherwise
# initialize the relay backend even under JAX_PLATFORMS=cpu
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from bench_config import (  # noqa: E402
    B,
    DENSE_IN,
    HBM_ROWS,
    L,
    MLPERF_CARDINALITIES,
    NUM_TABLES,
    POD_CHIPS,
    ROWS,
)


def main():
    import re

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec

    import bench as bench_mod
    from torchrec_tpu.datasets.random import RandomRecDataset
    from torchrec_tpu.sparse import KeyedJaggedTensor

    cfg = sys.argv[1] if len(sys.argv) > 1 else "pod"
    optim = sys.argv[2] if len(sys.argv) > 2 else "exact_sgd"
    donate = "--no-donate" not in sys.argv
    if cfg == "pod":
        rows_list = [
            max(8, -(-c // POD_CHIPS)) for c in MLPERF_CARDINALITIES
        ]
    elif cfg == "hbm":
        rows_list = [HBM_ROWS] * NUM_TABLES
    else:
        rows_list = [ROWS] * NUM_TABLES
    print(
        f"config={cfg} optim={optim} donate={donate} "
        f"rows={sum(rows_list):,}",
        flush=True,
    )

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    tdev = list(topo.devices)[:1]

    # tiny concrete twin for PartitionSpecs; full-shape state via
    # eval_shape (init is traceable since the r3 in-graph packer)
    small_rows = [min(r, 1024) for r in rows_list]
    dmp_small = bench_mod._build(optim, None, per_table_rows=small_rows)

    def _build_on_devices(devs):
        # bench._build hardcodes jax.devices()[:1]; patch through env
        import optax

        from torchrec_tpu.models import DLRM, DLRMTrain
        from torchrec_tpu.modules import (
            EmbeddingBagCollection,
            EmbeddingBagConfig,
        )
        from torchrec_tpu.modules.embedding_configs import DataType
        from torchrec_tpu.ops.fused_update import EmbOptimType
        from torchrec_tpu.parallel import (
            DistributedModelParallel,
            ParameterSharding,
            ShardingEnv,
            ShardingPlan,
            ShardingType,
        )

        tables = tuple(
            EmbeddingBagConfig(
                num_embeddings=rows_list[i], embedding_dim=128,
                name=f"t{i}", feature_names=[f"f{i}"],
                data_type=DataType.FP32,
            )
            for i in range(NUM_TABLES)
        )
        model = DLRMTrain(
            dlrm=DLRM(
                embedding_bag_collection=EmbeddingBagCollection(
                    tables=tables, max_feature_length=L
                ),
                dense_in_features=DENSE_IN,
                dense_arch_layer_sizes=(512, 256, 128),
                over_arch_layer_sizes=(1024, 1024, 512, 256, 1),
                dense_dtype=jnp.bfloat16,
            )
        )
        env = ShardingEnv.from_devices(devs)
        plan = ShardingPlan(
            {
                "dlrm/embedding_bag_collection": {
                    f"t{i}": ParameterSharding(ShardingType.ROW_WISE)
                    for i in range(NUM_TABLES)
                }
            }
        )
        o = {
            "exact_sgd": EmbOptimType.EXACT_SGD,
            "rowwise_adagrad": EmbOptimType.ROWWISE_ADAGRAD,
        }[optim]
        return DistributedModelParallel(
            model, env=env, plan=plan, fused_optim=o,
            fused_params={"learning_rate": 0.1},
            dense_optimizer=optax.sgd(0.05),
        )

    dmp = _build_on_devices(tdev)
    tmesh = dmp.env.mesh

    feats = [f"f{i}" for i in range(NUM_TABLES)]
    gen_fn = RandomRecDataset(
        keys=feats, batch_size=B, hash_sizes=rows_list,
        ids_per_feature=L, num_dense=DENSE_IN, on_device=True,
    ).device_batch_fn()
    raw_step = dmp.make_train_step(jit=False)

    def fused_step(state, key):
        b = gen_fn(jax.random.fold_in(key, state.step))
        return raw_step(
            state, b.dense_features, b.sparse_features, b.labels
        )

    # abstract state: full shapes from eval_shape on the SMALL twin's
    # spec structure (specs don't depend on rows)
    rng = np.random.RandomState(0)
    ids0 = np.concatenate(
        [rng.randint(0, r, B).astype(np.int32) for r in small_rows]
    )
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(ids0),
        jnp.asarray(np.ones((NUM_TABLES * B,), np.int32)),
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    state_small = dmp_small.init(jax.random.PRNGKey(0), dense, sb, labels)

    ids_full = np.concatenate(
        [rng.randint(0, r, B).astype(np.int32) for r in rows_list]
    )
    sb_full = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(ids_full),
        jnp.asarray(np.ones((NUM_TABLES * B,), np.int32)),
    ).to_padded(L)
    state_full_abs = jax.eval_shape(
        dmp.init, jax.random.PRNGKey(0), dense, sb_full, labels
    )

    def _spec_of(c):
        sh = getattr(c, "sharding", None)
        return sh.spec if isinstance(sh, NamedSharding) else PartitionSpec()

    state_abs = jax.tree.map(
        lambda a, c: jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(tmesh, _spec_of(c))
        ),
        state_full_abs, state_small,
    )
    key_abs = jax.ShapeDtypeStruct(
        (2,), jnp.uint32, sharding=NamedSharding(tmesh, PartitionSpec())
    )

    jstep = (
        jax.jit(fused_step, donate_argnums=(0,))
        if donate
        else jax.jit(fused_step)
    )
    hlo = jstep.lower(state_abs, key_abs).compile().as_text()

    if "--dump" in sys.argv:
        fn = sys.argv[sys.argv.index("--dump") + 1]
        with open(fn, "w") as f:
            f.write(hlo)
        print(f"dumped {len(hlo)} chars to {fn}")

    # report: every copy / big-shape instruction with metadata
    big_bytes = 100 * 2**20
    n_copy = 0
    for line in hlo.splitlines():
        shapes = re.findall(r"f32\[([\d,]+)\]", line)
        maxb = 0
        for s in shapes:
            n = 1
            for d in s.split(","):
                n *= int(d)
            maxb = max(maxb, n * 4)
        is_copy = re.search(r" copy\(|copy-start\(", line)
        if is_copy and maxb >= big_bytes:
            n_copy += 1
            meta = re.search(r'metadata=\{([^}]*)\}', line)
            name = re.search(r"%([\w.\-]+) =", line)
            print(f"\nBIG COPY {name.group(1) if name else '?'} "
                  f"({maxb/2**30:.2f} GiB):")
            print(f"  {meta.group(1)[:500] if meta else line[:300]}")
    print(f"\n{n_copy} big copies found")


if __name__ == "__main__":
    main()
