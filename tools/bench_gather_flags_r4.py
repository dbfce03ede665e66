"""r4: A/B the XLA gather/scatter formulation flags on the chip.

tools/bench_kernels.py (production `weights[ids]`, unsorted, default
mode) measures 8.9 ns/row at R=2.6M while the r3 decomposition probe
(`at[ids].get(mode="fill", indices_are_sorted=True)`, sorted ids)
measures 27 ns/row at the SAME shapes — a 3x formulation penalty inside
what we assumed was one kernel. The fused-update path passes
indices_are_sorted=True on every gather/scatter (ops/fused_update.py),
so if the hint (or fill mode) is the regression, dropping it is a free
speedup. Matrix:

  gather x {default clip, mode=fill} x {hint off, hint on} x {ids
  unsorted, ids sorted}, then scatter-add x {hint off, hint on} x
  {unsorted, sorted} (duplicates allowed, like the SGD fast path).

Run: python tools/bench_gather_flags_r4.py [R]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_config import B, DIM, NUM_TABLES


def main():
    import jax.numpy as jnp

    from tools.tpu_timing import bench_chain

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2_600_000
    N = NUM_TABLES * B
    rng = np.random.RandomState(0)
    ids_u = rng.randint(0, R, N).astype(np.int32)
    ids_s = np.sort(ids_u)
    w0 = jnp.zeros((R, DIM), jnp.float32) + 0.01
    print(f"R={R:,} N={N:,}", flush=True)

    def time_gather(tag, ids_np, **kw):
        ids0 = jnp.asarray(ids_np)

        def gat(c):
            w, ids = c
            rows = w.at[ids].get(**kw)
            bump = (rows[0, 0] < 1e9).astype(jnp.int32)
            return (w, ids + bump * (ids < R - 64))

        t = bench_chain(gat, (w0, ids0), k1=3, k2=15)
        print(f"gather  {tag:<38} {t*1e3:7.3f} ms ({t/N*1e9:5.1f} ns/row)",
              flush=True)

    time_gather("plain, unsorted ids", ids_u)
    time_gather("plain, sorted ids", ids_s)
    time_gather("hint=True, sorted ids", ids_s, indices_are_sorted=True)
    time_gather("fill, unsorted ids", ids_u, mode="fill", fill_value=0.0)
    time_gather(
        "fill+hint, sorted ids", ids_s,
        mode="fill", fill_value=0.0, indices_are_sorted=True,
    )

    def time_scatter(tag, ids_np, _set=False, **kw):
        ids0 = jnp.asarray(ids_np)

        def upd(c):
            w, ids = c
            g = jnp.full((N, DIM), 1e-6, jnp.float32)
            nw = (
                w.at[ids].set(g, **kw) if _set else w.at[ids].add(g, **kw)
            )
            bump = (nw[0, 0] > -1.0).astype(jnp.int32)
            return (nw, ids + bump * (ids < R - 64))

        t = bench_chain(upd, (w0, ids0), k1=3, k2=15, donate=True)
        print(f"scatter {tag:<38} {t*1e3:7.3f} ms ({t/N*1e9:5.1f} ns/row)",
              flush=True)

    time_scatter("plain, unsorted ids", ids_u)
    time_scatter("plain, sorted ids", ids_s)
    time_scatter("hint=True, sorted ids", ids_s, indices_are_sorted=True)
    time_scatter(
        "drop+hint, sorted ids", ids_s,
        mode="drop", indices_are_sorted=True,
    )
    time_scatter("drop, unsorted ids", ids_u, mode="drop")
    ids_uq = np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    time_scatter(
        "drop+unique+hint, sorted unique ids", ids_uq,
        mode="drop", indices_are_sorted=True, unique_indices=True,
    )
    time_scatter(
        "SET drop+unique+hint, sorted unique", ids_uq,
        mode="drop", indices_are_sorted=True, unique_indices=True,
        _set=True,
    )

    # block scatters: is the cost per-INDEX or per-byte? scatter [Ng, G, D]
    # row-groups (ids = group indices into w viewed [R/G, G, D])
    for G in (8, 16, 64):
        Rg = R // G
        # unique sorted group ids covering ~ the same touched-row count
        ng = min(Rg, int(Rg * (1.0 - np.exp(-N / Rg))))
        gids = np.sort(rng.choice(Rg, size=ng, replace=False)).astype(
            np.int32
        )
        gid0 = jnp.asarray(gids)
        wg0 = jnp.zeros((Rg, G, DIM), jnp.float32) + 0.01

        def upd_blk(c, G=G, ng=ng, Rg=Rg):
            w, ids = c
            g = jnp.full((ng, G, DIM), 1e-6, jnp.float32)
            nw = w.at[ids].add(
                g, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
            bump = (nw[0, 0, 0] > -1.0).astype(jnp.int32)
            return (nw, ids + bump * (ids < Rg - 64))

        t = bench_chain(upd_blk, (wg0, gid0), k1=3, k2=15, donate=True)
        mb = ng * G * DIM * 4 * 2 / 2**20
        print(
            f"scatter block G={G:<3} ng={ng:>7,}          {t*1e3:7.3f} ms"
            f" ({t/ng*1e9:6.1f} ns/blk, {mb/t/1e3:6.1f} GB/s rmw)",
            flush=True,
        )
        del wg0, gid0


if __name__ == "__main__":
    main()
