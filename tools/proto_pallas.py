"""Prototype bench for Pallas embedding-gather designs on TPU.

Design 1: PrefetchScalarGridSpec, grid over token tiles, wave of per-row
          async DMAs HBM->VMEM inside the kernel.
Design 2: BlockSpec index_map driven by prefetched ids: one (1, D) weight
          block per grid step, Pallas auto-pipelines the DMAs.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------- Design 1: wave DMA ----------------


def _wave_kernel(ids_ref, w_hbm, out_ref, scratch, sems, *, T):
    i = pl.program_id(0)
    base = i * T

    def start(t, _):
        row = ids_ref[base + t]
        pltpu.make_async_copy(
            w_hbm.at[row], scratch.at[t], sems.at[t]
        ).start()
        return _

    jax.lax.fori_loop(0, T, start, None)

    def wait(t, _):
        pltpu.make_async_copy(
            w_hbm.at[ids_ref[base + t]], scratch.at[t], sems.at[t]
        ).wait()
        return _

    jax.lax.fori_loop(0, T, wait, None)
    out_ref[:] = scratch[:]


def gather_wave(weights, ids, T=512):
    N = ids.shape[0]
    D = weights.shape[1]
    grid = (N // T,)
    return pl.pallas_call(
        functools.partial(_wave_kernel, T=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (T, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, D), weights.dtype),
    )(ids, weights)


# ---------------- Design 2: index_map blocks ----------------


def _blk_kernel(ids_ref, w_blk, out_ref):
    out_ref[:] = w_blk[:]


def gather_blk(weights, ids, T=8):
    # each grid step copies T consecutive tokens' rows? index_map gives ONE
    # block start per step; rows are not contiguous, so T=1 rows per step.
    N = ids.shape[0]
    D = weights.shape[1]
    return pl.pallas_call(
        _blk_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N,),
            in_specs=[
                pl.BlockSpec(
                    (1, D), lambda i, ids: (ids[i], 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N, D), weights.dtype),
    )(ids, weights)


# ---------------- Design 3: XLA take ----------------


def gather_xla(weights, ids):
    return weights[ids]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_600_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--n", type=int, default=26 * 8192)
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()
    R, D, N = args.rows, args.dim, args.n
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(R, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, R, size=(N,)), jnp.int32)

    fns = {
        "xla": jax.jit(gather_xla),
        "wave": jax.jit(functools.partial(gather_wave, T=args.tile)),
        "blk": jax.jit(gather_blk),
    }
    ref = None
    for name, fn in fns.items():
        try:
            out = fn(w, ids)
            jax.block_until_ready(out)
            if ref is None:
                ref = out
            else:
                assert jnp.allclose(out, ref), f"{name} mismatch"
            t = timeit(fn, w, ids)
            gbs = N * D * 4 * 2 / t / 1e9
            print(f"{name:5s}: {t*1e3:8.3f} ms  {gbs:7.1f} GB/s  ({t/N*1e9:6.1f} ns/row)")
        except Exception as e:  # noqa
            print(f"{name:5s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
