"""Microbenchmark: embedding lookup fwd + fused update vs HBM roofline.

Times the two hot ops (the TBE forward and optimizer-in-backward
equivalents) with the chained-dispatch harness from tools/tpu_timing.py
(single-dispatch timing is meaningless through the axon relay).

Usage: PYTHONPATH=.:~/.axon_site python tools/bench_kernels.py
       [--impl xla|pallas] [--rows R] [--dim D] ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import bench_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--rows", type=int, default=2_600_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--features", type=int, default=26)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--maxlen", type=int, default=1)
    ap.add_argument("--hbm-gbps", type=float, default=819.0, help="v5e peak")
    args = ap.parse_args()
    os.environ["TORCHREC_TPU_EMB_IMPL"] = args.impl

    from torchrec_tpu.ops.embedding import (
        PoolingMode,
        batched_embedding_lookup,
    )
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    F, B, L, D = args.features, args.batch, args.maxlen, args.dim
    R = args.rows
    N = F * B * L
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(R, D).astype(np.float32))
    ids0 = jnp.asarray(rng.randint(0, R // F, size=(F, B, L)), jnp.int32)
    lengths = jnp.full((F, B), L, jnp.int32)
    row_offsets = jnp.arange(F, dtype=jnp.int32) * (R // F)
    opt0 = init_fused_optimizer_state(R, D, EmbOptimType.ROWWISE_ADAGRAD)

    def perturb(ids, acc):
        return ids + jnp.int32(acc * 1e-30)

    # --- forward ---
    def fwd(c):
        w, ids, acc = c
        out = batched_embedding_lookup(
            w, perturb(ids, acc), lengths, row_offsets, PoolingMode.SUM
        )
        return (w, ids, acc + out[0, 0, 0])

    t_fwd = bench_chain(fwd, (w0, ids0, jnp.float32(0)), donate=True)
    fwd_bytes = N * D * 4 + F * B * D * 4
    gbs_fwd = fwd_bytes / t_fwd / 1e9

    # --- fused update (rowwise adagrad, exact dedup) ---
    flat_ids = (ids0 + row_offsets[:, None, None]).reshape(-1)
    g0 = jnp.asarray(rng.randn(N, D).astype(np.float32)) * 1e-3
    valid = jnp.ones((N,), bool)

    def upd(c):
        w, m, g = c
        o2 = opt0.replace(momentum1=m)
        nw, no = apply_fused_update(w, o2, flat_ids, g, valid, 0.01)
        return (nw, no.momentum1, g)

    t_upd = bench_chain(
        upd, (w0, opt0.momentum1, g0), donate=True
    )
    upd_bytes = N * (D * 4 * 3 + 8)
    gbs_upd = upd_bytes / t_upd / 1e9

    print(f"impl={args.impl}  F={F} B={B} L={L} D={D} R={R}")
    print(
        f"fwd lookup : {t_fwd*1e3:8.3f} ms  {t_fwd/N*1e9:6.2f} ns/row  "
        f"{gbs_fwd:7.1f} GB/s ({100*gbs_fwd/args.hbm_gbps:5.1f}% of HBM peak)"
    )
    print(
        f"fused upd  : {t_upd*1e3:8.3f} ms  {t_upd/N*1e9:6.2f} ns/row  "
        f"{gbs_upd:7.1f} GB/s ({100*gbs_upd/args.hbm_gbps:5.1f}% of HBM peak)"
    )


if __name__ == "__main__":
    main()
