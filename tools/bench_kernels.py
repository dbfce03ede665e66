"""Microbenchmark: embedding lookup fwd + fused update vs HBM roofline.

Measures the two hot ops in isolation (the equivalents of FBGEMM's TBE
forward and optimizer-in-backward) and reports achieved GB/s against the
chip's HBM speed-of-light, so kernel work can be judged directly.

Usage: python tools/bench_kernels.py [--impl xla|pallas] [--dim 128] ...
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--features", type=int, default=26)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--maxlen", type=int, default=1)
    ap.add_argument("--hbm-gbps", type=float, default=819.0, help="v5e peak")
    args = ap.parse_args()

    from torchrec_tpu.ops.embedding import (
        PoolingMode,
        batched_embedding_lookup,
    )
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        dedup_row_grads,
        init_fused_optimizer_state,
    )

    F, B, L, D = args.features, args.batch, args.maxlen, args.dim
    R = args.rows
    rng = np.random.RandomState(0)
    weights = jnp.asarray(rng.randn(R, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, R // F, size=(F, B, L)), jnp.int32)
    lengths = jnp.full((F, B), L, jnp.int32)
    row_offsets = jnp.arange(F, dtype=jnp.int32) * (R // F)
    opt = init_fused_optimizer_state(R, D, EmbOptimType.ROWWISE_ADAGRAD)

    if args.impl == "pallas":
        from torchrec_tpu.ops import pallas_embedding as pe

        fwd = jax.jit(
            lambda w, i, l: pe.tbe_lookup(
                w, i, l, row_offsets, pooling=PoolingMode.SUM
            )
        )
    else:
        fwd = jax.jit(
            lambda w, i, l: batched_embedding_lookup(
                w, i, l, row_offsets, pooling=PoolingMode.SUM
            )
        )

    t_fwd = timeit(fwd, weights, ids, lengths)
    n_tok = F * B * L
    fwd_bytes = n_tok * D * 4 + F * B * D * 4  # rows read + pooled write
    gbs_fwd = fwd_bytes / t_fwd / 1e9

    # --- fused update (rowwise adagrad) ---
    flat_ids = (ids + row_offsets[:, None, None]).reshape(-1)
    row_grads = jnp.asarray(rng.randn(n_tok, D).astype(np.float32)) * 1e-3
    valid = jnp.ones((n_tok,), bool)

    if args.impl == "pallas":
        from torchrec_tpu.ops import pallas_embedding as pe

        def upd(w, o, fi, g, v):
            return pe.tbe_fused_update(w, o, fi, g, v, 0.01)

    else:

        def upd(w, o, fi, g, v):
            return apply_fused_update(w, o, fi, g, v, 0.01)

    upd = jax.jit(upd, donate_argnums=(0, 1))

    # donation means we must re-make inputs each iter; time with fresh copies
    def run_upd():
        w = jnp.array(weights, copy=True)
        o = jax.tree.map(lambda x: jnp.array(x, copy=True) if x is not None else None, opt)
        jax.block_until_ready((w, o))
        t0 = time.perf_counter()
        out = upd(w, o, flat_ids, row_grads, valid)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    run_upd()  # compile
    ts = sorted(run_upd() for _ in range(10))
    t_upd = ts[len(ts) // 2]
    # per touched row: read w + write w + read m + write m + grad read
    upd_bytes = n_tok * (D * 4 * 2 + 8 + D * 4)
    gbs_upd = upd_bytes / t_upd / 1e9

    # --- dedup alone ---
    ddp = jax.jit(lambda fi, g, v: dedup_row_grads(fi, g, v, R))
    t_ddp = timeit(ddp, flat_ids, row_grads, valid)

    print(f"impl={args.impl}  F={F} B={B} L={L} D={D} R={R}")
    print(
        f"fwd lookup : {t_fwd*1e3:8.3f} ms  {gbs_fwd:7.1f} GB/s "
        f"({100*gbs_fwd/args.hbm_gbps:5.1f}% of HBM peak)"
    )
    print(
        f"fused upd  : {t_upd*1e3:8.3f} ms  {gbs_upd:7.1f} GB/s "
        f"({100*gbs_upd/args.hbm_gbps:5.1f}% of HBM peak)"
    )
    print(f"  dedup    : {t_ddp*1e3:8.3f} ms (included in fused upd)")


if __name__ == "__main__":
    main()
