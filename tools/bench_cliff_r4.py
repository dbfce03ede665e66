"""r4: localize the gather/scatter cliff between the bench config
(R=2.6M rows, 1.33 GiB, gather ~1.8 ms) and the pod-shard config
(R=3.19M rows, 1.52 GiB, gather 6.66 ms == scatter 6.66 ms — both
suspiciously equal to a whole-table read+write at stream bandwidth,
suggesting XLA inserts a full-table copy above a size threshold).

Sweeps R over the bracket, timing (a) gather alone, (b) donated
EXACT_SGD scatter-update alone; prints ms and implied ns/row so the
cliff R is obvious. --hlo additionally dumps the optimized HLO for the
gather at the two bracket ends to diff what changes.

Run: python tools/bench_cliff_r4.py [--hlo]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_config import B, DIM, NUM_TABLES


def main():
    import jax
    import jax.numpy as jnp

    from tools.tpu_timing import bench_chain
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    N = NUM_TABLES * B
    rng = np.random.RandomState(0)

    sweep = [
        2_600_000,
        2_800_000,
        2_900_000,
        3_000_000,
        3_100_000,
        3_190_449,
        3_400_000,
    ]
    if len(sys.argv) > 2 and sys.argv[1] == "--rows":
        sweep = [int(x) for x in sys.argv[2].split(",")]

    for R in sweep:
        ids0 = jnp.asarray(np.sort(rng.randint(0, R, N).astype(np.int32)))
        w0 = jnp.zeros((R, DIM), jnp.float32) + 0.01
        gib = R * DIM * 4 / 2**30

        def gat(c):
            w, ids = c
            rows = w.at[ids].get(
                mode="fill", fill_value=0.0, indices_are_sorted=True
            )
            bump = (rows[0, 0] < 1e9).astype(jnp.int32)
            return (w, ids + bump * (ids < R - 64))

        tg = bench_chain(gat, (w0, ids0), k1=3, k2=15)

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
            return (nw, nopt, ids + bump * (ids < R - 64))

        tu = bench_chain(upd, (w0, opt0, ids0), k1=3, k2=15, donate=True)
        print(
            f"R={R:>9,} ({gib:5.2f} GiB)  gather {tg*1e3:7.3f} ms"
            f" ({tg/N*1e9:5.1f} ns/row)   update {tu*1e3:7.3f} ms"
            f" ({tu/N*1e9:5.1f} ns/row)",
            flush=True,
        )
        del w0, ids0, opt0

    if "--hlo" in sys.argv:
        for R in (2_600_000, 3_190_449):
            w = jax.ShapeDtypeStruct((R, DIM), jnp.float32)
            ids = jax.ShapeDtypeStruct((N,), jnp.int32)

            def g(w, ids):
                return w.at[ids].get(
                    mode="fill", fill_value=0.0, indices_are_sorted=True
                )

            txt = jax.jit(g).lower(w, ids).compile().as_text()
            fn = f"/tmp/gather_hlo_{R}.txt"
            with open(fn, "w") as f:
                f.write(txt)
            print(f"HLO for R={R}: {fn} ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
