"""r3 chip campaign follow-up: decompose the pod_shard cost-model miss.

bench.py's pod_shard suite (97.36 GiB MLPerf config RW/64 => 1.52 GiB
per-chip shard, 26 heterogeneous tables totalling 3,190,449 rows,
N = 26x8192 ids) measured 359k ex/s (step ~22.8 ms) where the cost
model predicts ~11.5 ms. The bench config (26 x 100,000 uniform rows =
2.6M rows, 1.33 GiB) hits 723k (step ~11.3 ms). Only +0.3 GiB of
operand separates them, worth ~+1 ms of scatter stream time — so ~10 ms
is unexplained. This tool times each candidate in isolation ON THE CHIP:

  A  full fused gen+train step, pod rows (reproduce the 22.8 ms)
  B  full fused gen+train step, uniform rows with the SAME total
     (isolates heterogeneity vs total size)
  C  apply_fused_update EXACT_SGD alone at R=3.19M (scatter floor)
  D  forward row gather alone at R=3.19M
  E  RandomRecDataset device_batch_fn alone at pod hash_sizes
  F  full fused gen+train step at the bench config (26 x 100k uniform
     rows) — the reference point the pod configs are compared against,
     NOT a dense-only isolation (the dense arches are identical in all
     three full-step runs, so A-B and B-F differences bracket them)

Run: python tools/bench_pod_shard_r3.py   (any cwd / invocation style)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_config import (
    B,
    DENSE_IN,
    DIM,
    L,
    MLPERF_CARDINALITIES,
    NUM_TABLES,
    POD_CHIPS,
)


def main():
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from tools.tpu_timing import bench_chain
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    rows64 = [max(8, -(-c // POD_CHIPS)) for c in MLPERF_CARDINALITIES]
    R = sum(rows64)
    N = NUM_TABLES * B
    uniform = [R // NUM_TABLES] * NUM_TABLES
    print(f"pod rows total={R:,} ({R*DIM*4/2**30:.2f} GiB) N={N:,}",
          flush=True)

    def full_step(row_list, tag):
        dmp = bench_mod._build("exact_sgd", None, per_table_rows=row_list)
        ex_s = bench_mod._throughput(dmp, None, per_table_rows=row_list)
        print(f"{tag}: {ex_s:,.0f} ex/s  step={B/ex_s*1e3:.2f} ms",
              flush=True)
        del dmp

    full_step(rows64, "A full step, pod rows")
    full_step(uniform, "B full step, uniform same total")

    # C: update alone (one group operand, sorted ids)
    rng = np.random.RandomState(0)
    ids0 = jnp.asarray(np.sort(rng.randint(0, R, N).astype(np.int32)))
    w0 = jnp.zeros((R, DIM), jnp.float32) + 0.01
    valid = jnp.ones((N,), bool)
    opt0 = init_fused_optimizer_state(R, DIM, EmbOptimType.EXACT_SGD)

    def upd(c):
        w, opt, ids = c
        g = jnp.full((N, DIM), 1e-4, jnp.float32)
        nw, nopt = apply_fused_update(
            w, opt, ids, g, valid, jnp.float32(0.01),
            stochastic_rounding=False,
        )
        bump = (nw[0, 0] > -1.0).astype(jnp.int32)
        return (nw, nopt, (ids + bump) % R)

    t = bench_chain(upd, (w0, opt0, ids0), k1=5, k2=25, donate=True)
    print(f"C update alone: {t*1e3:.3f} ms", flush=True)

    # D: gather alone
    def gat(c):
        w, ids = c
        rows = w.at[ids].get(mode="fill", fill_value=0.0,
                             indices_are_sorted=True)
        bump = (rows[0, 0] < 1e9).astype(jnp.int32)
        return (w, (ids + bump) % R)

    t = bench_chain(gat, (w0, ids0), k1=5, k2=25)
    print(f"D gather alone: {t*1e3:.3f} ms", flush=True)

    # E: batch gen alone
    from torchrec_tpu.datasets.random import RandomRecDataset

    feats = [f"f{i}" for i in range(NUM_TABLES)]
    gen_fn = RandomRecDataset(
        keys=feats, batch_size=B, hash_sizes=rows64, ids_per_feature=L,
        num_dense=DENSE_IN, on_device=True,
    ).device_batch_fn()

    def gen(c):
        key, acc = c
        b = gen_fn(jax.random.fold_in(key, acc))
        acc2 = (
            b.sparse_features.ids.ravel()[0]
            + b.dense_features[0, 0].astype(jnp.int32)
        )
        return (key, acc2)

    t = bench_chain(
        gen, (jax.random.PRNGKey(0), jnp.int32(0)), k1=5, k2=25
    )
    print(f"E batch gen alone: {t*1e3:.3f} ms", flush=True)

    # F: the bench-config full step (reference point; same dense arches
    # as A/B, so their delta is sparse-side only)
    full_step([100_000] * NUM_TABLES, "F full step, bench config (ref)")


if __name__ == "__main__":
    main()
