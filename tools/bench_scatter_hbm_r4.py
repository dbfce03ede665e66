"""Re-measure the XLA scatter-add update at HBM scale (r4 open question).

The r2 cost model carries `xla_update_s = max(26ns * N, 2 * operand_bytes
/ 630GB/s)` — the stream term was calibrated from the r2 HBM-scale
campaign where scatter time scaled with TABLE size. NOTES_r4's layout
discovery (unaligned packed rows make XLA materialize two whole-operand
layout copies around the scatter) suggests that term was (at least
partly) THOSE COPIES, not intrinsic scatter behavior. This tool answers
it directly: time the exact production scatter primitive (sorted unique
ids, scatter-add, donated operand) at bench/pod/HBM row counts.

If the stream term is gone, the dispatch crossover in
ops/cost_model.py:xla_update_s is wrong: at the 8.7 GiB bench HBM config
it predicts 29.6 ms and routes the update to the Pallas RMW kernel
(~67ns/row = 14 ms) when the real XLA scatter would take ~5.5 ms.

Weights are initialized IN-GRAPH (no 9 GiB host staging) and donated
through a dispatch chain (tools/tpu_timing.py rationale; the chain here
avoids bench_chain's carry copies, which OOM at 9.34 GiB).

Usage: PYTHONPATH=.:~/.axon_site python tools/bench_scatter_hbm_r4.py \
           [--rows 2600000 3190449 18200000] [--ids 212992]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rows", type=int, nargs="+",
        default=[2_600_000, 3_190_528, 18_200_000],
    )
    ap.add_argument("--ids", type=int, default=26 * 8192)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--pallas", action="store_true",
                    help="also time a Pallas RMW kernel per shape")
    ap.add_argument("--rmw-op", default="rowwise", choices=["rowwise", "sgd"],
                    help="which Pallas RMW kernel --pallas times")
    ap.add_argument("--T", type=int, default=128, help="RMW wave size")
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the XLA scatter timing (RMW sweep mode)")
    args = ap.parse_args()

    D = args.dim
    N = args.ids
    rng = np.random.RandomState(0)

    for R in args.rows:
        gib = R * D * 4 / 1024**3
        # sorted unique ids: exactly what dedup_row_grads hands the
        # production scatter (strategies dedup before every update)
        ids_np = rng.choice(R, size=N, replace=False)
        ids_np.sort()
        ids = jnp.asarray(ids_np, jnp.int32)
        g = jnp.asarray(rng.randn(N, D).astype(np.float32)) * 1e-3

        if args.skip_xla:
            pass
        else:
            w = jax.jit(
                lambda: jnp.zeros((R, D), jnp.float32)
            )()  # in-graph init: no host staging

        def upd(w):
            # scale by a w-dependent scalar so XLA cannot elide the chain
            s = 1.0 + w[0, 0] * 1e-30
            return w.at[ids].add(
                g * s, indices_are_sorted=True, unique_indices=True
            )

        if not args.skip_xla:
            t, w = bench_chain_inplace(upd, w)
            print(
                f"R={R:>9}  ({gib:5.2f} GiB)  xla scatter-add: "
                f"{t*1e3:7.3f} ms  {t/N*1e9:6.2f} ns/row  "
                f"stream-equiv {2*R*D*4/t/1e9:6.0f} GB/s",
                flush=True,
            )
            del w

        if args.pallas:
            from torchrec_tpu.ops import pallas_embedding as pe

            w = jax.jit(lambda: jnp.zeros((R, D), jnp.float32))()
            if args.rmw_op == "rowwise":
                mom = jax.jit(lambda: jnp.zeros((R,), jnp.float32))()

                def upd_p(c):
                    w, m = c
                    s = 1.0 + w[0, 0] * 1e-30
                    nw, nm = pe.fused_update_rowwise_adagrad(
                        w, m, ids, g * s, jnp.float32(0.01),
                        jnp.float32(1e-8), T=args.T,
                    )
                    return (nw, nm)

            else:
                mom = jnp.zeros((1,), jnp.float32)  # unused carry slot

                def upd_p(c):
                    w, m = c
                    s = 1.0 + w[0, 0] * 1e-30
                    nw = pe.fused_update_sgd(
                        w, ids, g * s, jnp.float32(0.01), T=args.T
                    )
                    return (nw, m)

            f = jax.jit(upd_p, donate_argnums=(0,))
            c = f((w, mom))
            jax.block_until_ready(c)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    c = f(c)
                jax.block_until_ready(c)
                t1 = time.perf_counter()
                for _ in range(40):
                    c = f(c)
                jax.block_until_ready(c)
                t2 = time.perf_counter()
                t = ((t2 - t1) - (t1 - t0)) / 30
                best = t if best is None else min(best, t)
            print(
                f"R={R:>9}  ({gib:5.2f} GiB)  pallas {args.rmw_op} RMW: "
                f"{best*1e3:7.3f} ms  {best/N*1e9:6.2f} ns/row",
                flush=True,
            )
            del c

    print("done", flush=True)


if __name__ == "__main__":
    main()
