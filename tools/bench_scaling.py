"""Multi-host scaling bench harness (ready-to-run; VERDICT r1 item 8).

Runs the full DLRM train step over an H x Lc device mesh and reports
per-step wall time, examples/s, per-host scaling efficiency vs a
1-host run, and audited per-collective wire bytes (ICI vs DCN legs
separated by group size).

On CPU (the only multi-device option in this environment) it validates
wiring and produces the collective byte counts the cost model needs; on
real multi-host hardware the same invocation produces the >=80%
host-scaling-efficiency number directly (BASELINE.md north star).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_scaling.py --mesh 2x4 --batch_per_device 64
  ... --input_routing a2a     # routed cross-host id exchange
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(mesh: str, batch_per_device: int, steps: int,
        input_routing: str, num_tables: int, dim: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    if mesh == "distributed":
        # real multi-host launch: one process per host, env-driven
        # discovery (ref comm.py:31-99); host-contiguous mesh asserted
        # inside from_distributed
        env = ShardingEnv.from_distributed()
        H, Lc = env.num_hosts, env.local_size
        n = env.world_size
    else:
        H, Lc = (int(x) for x in mesh.split("x"))
        n = H * Lc
        devices = jax.devices()[:n]
        assert len(devices) == n, f"need {n} devices, have {len(devices)}"
        env = ShardingEnv.from_devices(devices, local_size=Lc)
    B = batch_per_device * n
    rows = 4096
    tables = tuple(
        EmbeddingBagConfig(num_embeddings=rows, embedding_dim=dim,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i in range(num_tables)
    )
    # hierarchical plan when multi-host: tables host-pinned, rows split
    # intra-host; single-host: plain RW
    stype = (
        ShardingType.TABLE_ROW_WISE if H > 1 else ShardingType.ROW_WISE
    )
    plan = ShardingPlan({
        "dlrm/embedding_bag_collection": {
            f"t{i}": ParameterSharding(stype, ranks=[i % max(H, 1)])
            for i in range(num_tables)
        }
    })
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1
        ),
        dense_in_features=13,
        dense_arch_layer_sizes=(64, dim),
        over_arch_layer_sizes=(64, 1),
    ))
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={
            "learning_rate": 0.1, "input_routing": input_routing,
        },
        dense_optimizer=optax.sgd(0.05),
    )
    rng = np.random.RandomState(0)
    sb = KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(num_tables)],
        jnp.asarray(rng.randint(0, rows, num_tables * B).astype(np.int32)),
        jnp.asarray(np.ones((num_tables * B,), np.int32)),
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 13).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    step = dmp.make_train_step(donate=False)
    state, loss, _ = step(state, dense, sb, labels)  # compile
    float(loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = step(state, dense, sb, labels)
    float(loss)
    dt = (time.perf_counter() - t0) / steps

    # collective audit (ICI = group size Lc or n; DCN = group size H)
    from tools.comm_audit import audit

    raw = dmp.make_train_step(donate=False, jit=False)
    stats = audit(
        lambda s, d, sb_, lb: raw(s, d, sb_, lb)[1],
        state, dense, sb, labels,
    )
    by = {}
    for s in stats:
        k = f"{s.primitive}/g{s.group_size}"
        by[k] = by.get(k, 0) + s.wire_bytes
    return {
        "mesh": mesh,
        "world_size": n,
        "batch_global": B,
        "input_routing": input_routing,
        "step_ms": round(dt * 1e3, 2),
        "examples_per_sec": round(B / dt, 1),
        "wire_bytes_per_device": by,
        "dcn_wire_bytes": sum(
            v for k, v in by.items() if k.endswith(f"/g{H}") and H > 1
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="2x4",
                   help="HxLc (hosts x locals), or 'distributed' for a "
                        "real multi-host launch via "
                        "jax.distributed.initialize()")
    p.add_argument("--batch_per_device", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--input_routing", default="allgather",
                   choices=["allgather", "a2a"])
    p.add_argument("--num_tables", type=int, default=8)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--baseline_mesh", default=None,
                   help="also run this mesh and report scaling efficiency")
    args = p.parse_args()
    out = run(args.mesh, args.batch_per_device, args.steps,
              args.input_routing, args.num_tables, args.dim)
    if args.baseline_mesh:
        base = run(args.baseline_mesh, args.batch_per_device, args.steps,
                   args.input_routing, args.num_tables, args.dim)
        # efficiency: per-device throughput retained when scaling up
        eff = (
            (out["examples_per_sec"] / out["world_size"])
            / (base["examples_per_sec"] / base["world_size"])
        )
        out["baseline"] = base
        out["scaling_efficiency"] = round(eff, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
