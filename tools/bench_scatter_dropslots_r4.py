"""Does XLA's sorted scatter-add charge for dropped (OOB) slots?

If dropped slots are ~free, a dup-heavy mix (pod tiny tables, Zipf ids)
can combine duplicate runs and park dup slots in a sorted OOB tail,
paying per-UNIQUE-row dispatch instead of per-slot.

Times, at the pod operand size (R=3.19M):
  a. sorted-with-duplicates ids, per-slot grads (current SGD fast path)
  b. same id multiset deduped: sorted unique prefix + OOB tail, drop
  c. all-unique random ids (baseline 213k-slot cost)
  d. HALF slots OOB tail (synthetic 50% drop)

Run: python tools/bench_scatter_dropslots_r4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_config import B, DIM, MLPERF_CARDINALITIES, NUM_TABLES, POD_CHIPS


def bench_inplace(op, carry, k1=10, k2=40, reps=3):
    f = jax.jit(op, donate_argnums=(0,))

    def wall(k, c):
        t0 = time.perf_counter()
        for _ in range(k):
            c = f(c)
        jax.block_until_ready(c)
        return time.perf_counter() - t0, c

    c = f(carry)
    jax.block_until_ready(c)
    best = None
    for _ in range(reps):
        t1, c = wall(k1, c)
        t2, c = wall(k2, c)
        best = min(best or 9e9, (t2 - t1) / (k2 - k1))
    return best


def pod_mix_ids(rng):
    """One id per table per example, table rows = MLPerf cardinality/64."""
    ids = []
    base = 0
    for card in MLPERF_CARDINALITIES:
        rows = max(1, card // POD_CHIPS)
        ids.append(base + rng.randint(0, rows, B))
        base += rows
    return np.concatenate(ids).astype(np.int32), base


def main():
    rng = np.random.RandomState(0)
    ids_np, R = pod_mix_ids(rng)
    N = ids_np.shape[0]
    D = DIM
    ids_np.sort()
    uniq = np.unique(ids_np)
    print(f"R={R} N={N} unique={uniq.size} ({uniq.size/N:.1%})", flush=True)

    g_np = rng.randn(N, D).astype(np.float32) * 1e-3
    SENT = np.int32(2**31 - 1 - N)

    def run(label, ids_arr, n_slots=N):
        ids = jnp.asarray(ids_arr)
        g = jnp.asarray(g_np[:n_slots])
        w = jax.jit(lambda: jnp.zeros((R, D), jnp.float32))()

        def upd(w):
            s = 1.0 + w[0, 0] * 1e-30
            return w.at[ids].add(g * s, mode="drop",
                                 indices_are_sorted=True)

        t = bench_inplace(upd, w)
        print(f"{label:34s} {t*1e3:7.3f} ms  {t/n_slots*1e9:6.2f} ns/slot",
              flush=True)

    # a. current form
    run("a: sorted-with-dups (current)", ids_np)
    # b. deduped: unique prefix + ascending OOB tail
    tail = SENT + np.arange(N - uniq.size, dtype=np.int32)
    run("b: unique prefix + OOB tail", np.concatenate([uniq, tail]))
    # c. all-unique random (213k-slot reference)
    c_ids = rng.choice(R, size=N, replace=False).astype(np.int32)
    c_ids.sort()
    run("c: all-unique sorted", c_ids)
    # d. half OOB
    half = c_ids[: N // 2]
    tail2 = SENT + np.arange(N - half.size, dtype=np.int32)
    run("d: half unique + half OOB tail", np.concatenate([half, tail2]))


if __name__ == "__main__":
    main()
