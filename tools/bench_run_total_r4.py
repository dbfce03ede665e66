"""Chip probe: apply_fused_update EXACT_SGD at HBM scale (R=18.2M),
old dedup_row_grads combine vs the new scatter-free run_total form.

Run: python tools/bench_run_total_r4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_config import B, DIM, HBM_ROWS, NUM_TABLES
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    _apply_fused_update_pallas,
    dedup_row_grads,
    init_fused_optimizer_state,
    run_total_row_grads,
)


def bench_chain_inplace(op, carry, k1=10, k2=40, reps=3):
    """Seconds/op: donated chain, no carry copies (carry is consumed)."""
    f = jax.jit(op, donate_argnums=(0,))

    def wall(k, c):
        t0 = time.perf_counter()
        for _ in range(k):
            c = f(c)
        jax.block_until_ready(c)
        return time.perf_counter() - t0, c

    c = f(carry)  # warm/compile
    jax.block_until_ready(c)
    best = None
    for _ in range(reps):
        t1, c = wall(k1, c)
        t2, c = wall(k2, c)
        t = (t2 - t1) / (k2 - k1)
        best = t if best is None else min(best, t)
    return best, c


def main():
    R = NUM_TABLES * HBM_ROWS
    N = NUM_TABLES * B
    rng = np.random.RandomState(0)
    ids_np = rng.randint(0, R, N).astype(np.int32)
    valid = jnp.ones((N,), bool)

    for name, combine in (
        ("dedup (old)", dedup_row_grads),
        ("run_total (new)", run_total_row_grads),
    ):
        ids0 = jnp.asarray(ids_np)  # fresh each leg (donated away)
        w0 = jax.jit(lambda: jnp.zeros((R, DIM), jnp.float32) + 0.01)()
        opt0 = init_fused_optimizer_state(R, DIM, EmbOptimType.EXACT_SGD)

        def step(c):
            w, opt, ids = c
            g = jnp.full((N, DIM), 1e-4, jnp.float32)
            uids, g_c = combine(ids, g, valid, R)
            new_w, new_opt = _apply_fused_update_pallas(
                w, opt, uids, g_c, jnp.float32(0.01),
                eps=1e-8, weight_decay=0.0, beta1=0.9, beta2=0.999,
            )
            bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
            return (new_w, new_opt, (ids + bump) % R)

        t, c = bench_chain_inplace(step, (w0, opt0, ids0), k1=5, k2=25)
        print(f"{name:18s} {t*1e3:8.3f} ms  ({t/N*1e9:.1f} ns/id)",
              flush=True)
        del c, w0, opt0


if __name__ == "__main__":
    main()
