"""r5: write-only scatter kernel vs RMW wave kernel on chip.

VERDICT r4 item 4 asked to prove or beat the 70 ns/row RMW floor at
hbm_scale. Run-length analysis (NOTES_r5) shows run-coalescing is worth
only ~1.2% at uniform ids — but the floor itself is NOT architectural:
it is 4 scalar-core ops/row (read start+wait, write start+wait). XLA's
native gather does the read half at ~8.6 ns/row, so
    gather (XLA) -> update math (VPU, fused) -> scatter_rows_write
pays ~2 scalar ops/row: predicted ~8.6 + ~35 = ~44 ns/row vs ~70.

Measures at R=18.2M (8.68 GiB, the hbm_scale shard) and R=3.19M (pod):
  A  bare scatter_rows_write kernel (ns/row)
  B  full EXACT_SGD update via gather+write
  C  full EXACT_SGD update via the RMW wave kernel (current dispatch)

Uses the donated in-place chain (no carry copies — two 8.68 GiB tables
don't fit 16 GB HBM; same harness as tools/bench_run_total_r4.py).

Run: python tools/bench_write_kernel_r5.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def bench_chain_inplace(op, carry, k1=5, k2=25, reps=3):
    import jax

    f = jax.jit(op, donate_argnums=(0,))

    def sync(c):
        # block_until_ready does NOT block through the axon relay — a
        # one-scalar host fetch is the reliable barrier. Index (not
        # ravel: reshape materializes a full device copy -> OOM at
        # 8.68 GiB) one element per leaf.
        jax.tree.map(lambda x: float(x[(0,) * x.ndim]), c)

    def wall(k, c):
        t0 = time.perf_counter()
        for _ in range(k):
            c = f(c)
        sync(c)
        return time.perf_counter() - t0, c

    c = f(carry)
    sync(c)
    # min PER LEG before differencing: a relay stall inflating a k1 leg
    # would otherwise fabricate a too-small slope for that rep, and
    # min-of-differences would then select exactly the distorted rep
    t1s, t2s = [], []
    for _ in range(reps):
        t1, c = wall(k1, c)
        t2, c = wall(k2, c)
        t1s.append(t1)
        t2s.append(t2)
    return (min(t2s) - min(t1s)) / (k2 - k1), c


def main():
    import jax.numpy as jnp

    from torchrec_tpu.ops import pallas_embedding as pe

    D = 128
    N = 212_992

    for R in (18_200_000, 3_190_528):
        print(f"\n== R={R:,} ({R * D * 4 / 2**30:.2f} GiB), N={N:,} ==",
              flush=True)
        rng = np.random.RandomState(0)
        uids0 = np.unique(rng.randint(0, R, N).astype(np.int32))
        pad = N - len(uids0)
        uids0 = np.concatenate(
            [uids0, np.full(pad, 2**31 - 1, np.int64)]
        ).astype(np.int32)
        n_real = N - pad

        def _bump_ids(ids, bump):
            # sentinels stay sentinels: a plain (ids + bump) % R wraps
            # 2**31-1 into a REAL row id, so from step 2 every pad slot
            # would write and the /n_real ns/row would overstate cost
            return jnp.where(ids < R, (ids + bump) % jnp.int32(R), ids)

        def step_a(c):
            w, ids, rows = c
            new_w = pe.scatter_rows_write(w, ids, rows, interpret=False)
            bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
            return (new_w, _bump_ids(ids, bump), rows)

        def step_b(c):
            w, ids, rows = c
            safe = jnp.minimum(ids, R - 1)
            w_rows = w[safe]
            new_rows = w_rows - jnp.float32(0.01) * rows
            new_w = pe.scatter_rows_write(
                w, ids, new_rows, interpret=False
            )
            bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
            return (new_w, _bump_ids(ids, bump), rows)

        def step_c(c):
            w, ids, rows = c
            new_w = pe.fused_update_sgd(
                w, ids, rows, jnp.float32(0.01), T=128, interpret=False
            )
            bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
            return (new_w, _bump_ids(ids, bump), rows)

        import jax

        for name, step in (
            ("A bare scatter_rows_write", step_a),
            ("B gather+write EXACT_SGD ", step_b),
            ("C RMW wave EXACT_SGD     ", step_c),
        ):
            w0 = jax.jit(lambda: jnp.zeros((R, D), jnp.float32) + 0.01)()
            rows0 = jax.jit(
                lambda: jnp.full((N, D), 1e-4, jnp.float32)
            )()
            ids0 = jnp.asarray(uids0)
            t, c = bench_chain_inplace(step, (w0, ids0, rows0))
            print(f"{name}: {t*1e3:7.2f} ms  "
                  f"{t/n_real*1e9:5.1f} ns/row", flush=True)
            del c, w0, rows0, ids0


if __name__ == "__main__":
    main()
