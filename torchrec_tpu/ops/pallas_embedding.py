"""Pallas TPU kernels for the table-batched embedding hot path — the
hand-tuned equivalents of FBGEMM's `SplitTableBatchedEmbeddingBagsCodegen`
forward and optimizer-in-backward (ref: third_party/fbgemm, consumed at
torchrec/distributed/batched_embedding_kernel.py:410-421,604-647).

Three kernels, all built on per-row async DMAs (the only way to move
randomly-addressed 512B embedding rows on TPU — XLA's gather/scatter
lowering serializes these):

* `gather_rows`      — [N] row ids -> [N, D] rows. A grid step issues a
                       wave of T row DMAs HBM->VMEM and ships the tile out
                       through the normal Pallas output pipeline.
* `tbe_lookup`       — fused gather + masked/weighted pooling: each grid
                       step fetches TB bags x L rows and reduces them to
                       [TB, D] in VMEM, so per-token rows never round-trip
                       through HBM.
* `fused_update_*`   — in-place (input_output_aliased) read-modify-write
                       of touched rows only: w[id] and optimizer state
                       stream HBM->VMEM, the SGD/(rowwise-)Adagrad/Adam
                       step runs on the VPU, rows stream back. Nothing
                       [R, D]-shaped is ever materialized. Ids must be
                       UNIQUE (pre-deduped, see ops.fused_update
                       .dedup_row_grads); slack slots carry id >= R and
                       their writeback is predicated off.
* `scatter_rows_write` — write-only row scatter (r5): the caller reads
                       rows through XLA's native gather (~8.6 ns/row)
                       and does the optimizer math in XLA, leaving only
                       1 write start + 1 wait per row here (~35 ns) —
                       the production w-update form (w_impl="write",
                       47 vs 67-72 ns/row full-update measured).

CPU fallback/testing: every entry point takes `interpret=None` which
auto-enables the Pallas interpreter off-TPU, so the same code paths are
unit-testable on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Max in-flight row DMAs per grid step. 512 semaphores exceeded a Mosaic
# limit on v5e; 256 compiles and keeps the DMA queues saturated.
_MAX_WAVE = 256
# scalar-prefetch SMEM budget for id arrays: v5e SMEM is 1MB total and
# Mosaic RESOURCE_EXHAUSTEDs just past ~832KB of prefetched ids (other
# scoped scalars take the rest; measured via tools/aot_kernel_check.py)
_SMEM_IDS_BYTES = 832 * 1024


def _auto_interpret(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# gather_rows
# ---------------------------------------------------------------------------


def _gather_kernel(ids_ref, w_hbm, out_ref, scratch, sems, *, T):
    base = pl.program_id(0) * T

    def start(t, _):
        pltpu.make_async_copy(
            w_hbm.at[ids_ref[base + t]], scratch.at[t], sems.at[t]
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


def _gather_rows_impl(
    weights: Array, flat_ids: Array, T: int, interpret: bool
) -> Array:
    N = flat_ids.shape[0]
    D = weights.shape[1]
    Np = -(-N // T) * T
    ids = jnp.clip(flat_ids, 0, weights.shape[0] - 1)
    if Np != N:
        ids = jnp.pad(ids, (0, Np - N))
    out = pl.pallas_call(
        functools.partial(_gather_kernel, T=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (T, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Np, D), weights.dtype),
        interpret=interpret,
    )(ids, weights)
    return out[:N] if Np != N else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows(
    weights: Array,
    flat_ids: Array,
    T: int = _MAX_WAVE,
    interpret: Optional[bool] = None,
) -> Array:
    """weights [R, D], flat_ids [N] -> rows [N, D] (ids clipped to range)."""
    return _gather_rows_impl(weights, flat_ids, T, _auto_interpret(interpret))


def _gather_rows_fwd(weights, flat_ids, T, interpret):
    return gather_rows(weights, flat_ids, T, interpret), (
        weights.shape,
        weights.dtype,
        flat_ids,
    )


def _gather_rows_bwd(T, interpret, res, d_rows):
    (R, D), dtype, flat_ids = res
    # Cold path (autodiff through a non-fused table): dense scatter-add.
    d_w = jnp.zeros((R, D), dtype).at[flat_ids].add(d_rows, mode="drop")
    return d_w, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


# ---------------------------------------------------------------------------
# scatter_rows_write: write-only row scatter (the cheap half of RMW)
# ---------------------------------------------------------------------------


def _scatter_write_kernel(ids_ref, w_hbm, rows_ref, out_w, sems, *, T, R):
    """One write DMA per real row; sentinel slots (id >= R) skipped.

    The row READS that the RMW wave kernels pay ~2 scalar-core ops/row
    for are done by the CALLER through XLA's native gather (~8.6 ns/row,
    8x cheaper than a per-row DMA descriptor) — this kernel only issues
    the writes XLA cannot do without rewriting the whole operand
    (NOTES_r4: donated XLA scatter streams 2x operand bytes at 626 GB/s
    once rows stop fitting in cache)."""
    del w_hbm  # present only to carry the input/output alias
    base = pl.program_id(0) * T

    def start(t, _):
        @pl.when(ids_ref[base + t] < R)
        def _w():
            pltpu.make_async_copy(
                rows_ref.at[t], out_w.at[ids_ref[base + t]], sems.at[t]
            ).start()

        return _

    jax.lax.fori_loop(0, T, start, None)

    def wait(t, _):
        @pl.when(ids_ref[base + t] < R)
        def _w():
            pltpu.make_async_copy(
                rows_ref.at[t], out_w.at[ids_ref[base + t]], sems.at[t]
            ).wait()

        return _

    jax.lax.fori_loop(0, T, wait, None)


def scatter_rows_write(
    weights: Array,
    uids: Array,
    rows: Array,
    T: int = _MAX_WAVE,
    interpret: Optional[bool] = None,
) -> Array:
    """weights[uids[t]] = rows[t] in place, for uids[t] < R; others skip.

    uids must be UNIQUE among real slots (duplicate writes would race
    within a wave) — the fused-update dispatch guarantees this via
    dedup/run-total combine. rows [N, D] streams through the normal
    blocked VMEM pipeline (no per-row read descriptors), so the
    scalar-core cost is 1 start + 1 wait per real row (~35 ns) vs the
    RMW wave kernels' ~70 ns/row."""
    interpret = _auto_interpret(interpret)
    R, D = weights.shape
    uids, rows, Np = _pad_wave(uids, rows, T)
    return pl.pallas_call(
        functools.partial(_scatter_write_kernel, T=T, R=R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # weights (alias)
                pl.BlockSpec(
                    (T, D), lambda i, *p: (i, 0), memory_space=pltpu.VMEM
                ),  # new rows
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, D), weights.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, weights, rows)


# ---------------------------------------------------------------------------
# tbe_lookup: fused gather + pool
# ---------------------------------------------------------------------------


def _lookup_kernel(
    ids_ref, w_hbm, coeff_ref, out_ref, scratch, sems, *, TB, L, D
):
    # scratch is (T, D) with one row per (bag, slot) DMA — single-row
    # dynamic sublane slices (`scratch.at[t]`) are the Mosaic-safe form;
    # a (TB, L*D) layout with dynamic partial-lane slices fails tiling
    # alignment (slice sublane dim 1 % 8 != 0) on v5e.
    T = TB * L
    base = pl.program_id(0) * T

    def start(t, _):
        pltpu.make_async_copy(
            w_hbm.at[ids_ref[base + t]], scratch.at[t], sems.at[t]
        ).start()
        return _

    jax.lax.fori_loop(0, T, start, None)

    def wait(t, _):
        pltpu.make_async_copy(
            w_hbm.at[ids_ref[base + t]], scratch.at[t], sems.at[t]
        ).wait()
        return _

    jax.lax.fori_loop(0, T, wait, None)

    # Pooled reduction on the MXU: scale each fetched row by its slot
    # coefficient (coeff_ref is the bag-major (T, 1) column for this
    # step), then sum rows per bag via a 0/1 bag-selection matmul.
    contrib = scratch[:] * coeff_ref[:]
    if L == 1:
        # one slot per bag: the bag-select matmul would be an identity
        # (T == TB) — a pure copy is all the pooling there is
        out_ref[:] = contrib.astype(out_ref.dtype)
        return
    tb_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, T), 0)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, T), 1)
    sel = ((t_iota // L) == tb_iota).astype(scratch.dtype)
    out_ref[:] = jnp.dot(
        sel, contrib, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _tbe_tile(NB: int, L: int):
    """Single source for tbe_lookup_pooled's tiling + budget math.

    Returns (TB, NBp, wave_ok, smem_ok): bags per grid step (8-aligned
    for Mosaic sublane alignment of the (TB, D) out and (TB*L, 1) coeff
    blocks), the TB-padded bag count, whether the DMA wave T = TB*L fits
    the semaphore budget, and whether the scalar-prefetched ids fit SMEM.
    Used by BOTH tbe_lookup_fits and _tbe_lookup_impl so the dispatch
    predicate can never drift from the impl's guards."""
    TB = max(8, (_MAX_WAVE // L) // 8 * 8)
    NBp = -(-NB // TB) * TB
    return (TB, NBp, TB * L <= _MAX_WAVE, NBp * L * 4 <= _SMEM_IDS_BYTES)


def tbe_lookup_fits(NB: int, L: int) -> bool:
    """True iff tbe_lookup_pooled's wave + SMEM budgets admit (NB, L)."""
    _, _, wave_ok, smem_ok = _tbe_tile(NB, L)
    return wave_ok and smem_ok


def _tbe_lookup_impl(
    weights: Array,
    flat_ids: Array,  # [NB, L] pre-offset global rows
    coeff: Array,  # [NB, L] pooling coefficient (0 for invalid)
    interpret: bool,
) -> Array:
    NB, L = flat_ids.shape
    D = weights.shape[1]
    TB, NBp, wave_ok, smem_ok = _tbe_tile(NB, L)
    if not wave_ok:
        raise ValueError(
            f"tbe_lookup_pooled: L={L} needs a {TB * L}-descriptor DMA "
            f"wave at the TB=8 sublane floor, over the {_MAX_WAVE} "
            "semaphore budget (v5e sflag overflow at 512). Use the XLA "
            "path (TORCHREC_TPU_EMB_IMPL=xla) for L > 32."
        )
    if not smem_ok:
        raise ValueError(
            f"tbe_lookup_pooled: scalar-prefetched ids take "
            f"{NBp * L * 4} bytes of SMEM, over the {_SMEM_IDS_BYTES} "
            "budget (v5e SMEM is 1MB total; Mosaic RESOURCE_EXHAUSTED "
            "past ~832KB). Split the batch or use the XLA path."
        )
    ids = jnp.clip(flat_ids, 0, weights.shape[0] - 1)
    if NBp != NB:
        ids = jnp.pad(ids, ((0, NBp - NB), (0, 0)))
        coeff = jnp.pad(coeff, ((0, NBp - NB), (0, 0)))
    # coeff flattens bag-major to a (NBp * L, 1) column so step i's block
    # is rows [i*T, (i+1)*T) — one coefficient per flat DMA slot. The
    # trailing singleton keeps the block's last dim equal to the array's
    # (the Pallas TPU block-shape divisibility rule).
    coeff_steps = coeff.astype(weights.dtype).reshape(NBp * L, 1)
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, TB=TB, L=L, D=D),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBp // TB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (TB * L, 1),
                    lambda i, ids: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TB, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((TB * L, D), weights.dtype),
                pltpu.SemaphoreType.DMA((TB * L,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NBp, D), weights.dtype),
        interpret=interpret,
    )(ids.reshape(-1), weights, coeff_steps)
    return out[:NB] if NBp != NB else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tbe_lookup_pooled(
    weights: Array,
    flat_ids: Array,
    coeff: Array,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused gather+pool: out[b] = sum_l coeff[b, l] * weights[ids[b, l]].

    weights [R, D]; flat_ids [NB, L] global row ids; coeff [NB, L]
    (carries the validity mask, per-sample weights and 1/len for MEAN).
    Returns [NB, D].
    """
    return _tbe_lookup_impl(
        weights, flat_ids, coeff, _auto_interpret(interpret)
    )


def _tbe_lookup_fwd(weights, flat_ids, coeff, interpret):
    out = tbe_lookup_pooled(weights, flat_ids, coeff, interpret)
    return out, (weights, flat_ids, coeff)


def _tbe_lookup_bwd(interpret, res, d_out):
    weights, flat_ids, coeff = res
    NB, L = flat_ids.shape
    # row_grads[b, l] = coeff[b, l] * d_out[b]
    row_grads = d_out[:, None, :] * coeff[:, :, None].astype(d_out.dtype)
    d_w = (
        jnp.zeros(weights.shape, weights.dtype)
        .at[flat_ids.reshape(-1)]
        .add(row_grads.reshape(NB * L, -1), mode="drop")
    )
    rows = gather_rows(weights, flat_ids.reshape(-1), interpret=interpret)
    d_coeff = jnp.einsum(
        "nd,nd->n", rows, jnp.repeat(d_out, L, axis=0)
    ).reshape(NB, L)
    return d_w, None, d_coeff.astype(coeff.dtype)


tbe_lookup_pooled.defvjp(_tbe_lookup_fwd, _tbe_lookup_bwd)


# ---------------------------------------------------------------------------
# fused in-place sparse optimizer updates
# ---------------------------------------------------------------------------
#
# Grid steps process waves of T unique rows. Scratches hold the row data;
# the optimizer math is plain VPU code; writebacks are predicated on
# id < R. `input_output_aliases` makes the updates truly in place: the
# "outputs" are the same HBM buffers the inputs live in.


def _start_reads(uids_ref, base, T, R, srcs_dsts_sems):
    # uids carry validity inline (sentinels >= R): OOB reads clip to the
    # last row harmlessly; a separate valid array would double the SMEM
    # prefetch footprint and overflow SMEM at N ~ 200k (832KB each)
    def start(t, _):
        i = jnp.minimum(uids_ref[base + t], R - 1)
        for src, dst, sem in srcs_dsts_sems:
            pltpu.make_async_copy(src(i), dst(t), sem.at[t]).start()
        return _

    jax.lax.fori_loop(0, T, start, None)

    def wait(t, _):
        i = jnp.minimum(uids_ref[base + t], R - 1)
        for src, dst, sem in srcs_dsts_sems:
            pltpu.make_async_copy(src(i), dst(t), sem.at[t]).wait()
        return _

    jax.lax.fori_loop(0, T, wait, None)


def _start_writes(uids_ref, base, T, R, srcs_dsts_sems):
    def start(t, _):
        @pl.when(uids_ref[base + t] < R)
        def _w():
            for src, dst, sem in srcs_dsts_sems:
                pltpu.make_async_copy(
                    src(t), dst(uids_ref[base + t]), sem.at[t]
                ).start()

        return _

    jax.lax.fori_loop(0, T, start, None)

    def wait(t, _):
        @pl.when(uids_ref[base + t] < R)
        def _w():
            for src, dst, sem in srcs_dsts_sems:
                pltpu.make_async_copy(
                    src(t), dst(uids_ref[base + t]), sem.at[t]
                ).wait()

        return _

    jax.lax.fori_loop(0, T, wait, None)


def _sgd_kernel(
    ids_ref, w_hbm, g_ref, lr_ref, out_w, w_s, rsem, wsem,
    *, T, wd, R,
):
    base = pl.program_id(0) * T
    _start_reads(
        ids_ref, base, T, R,
        [(lambda i: w_hbm.at[i], lambda t: w_s.at[t], rsem)],
    )
    g = g_ref[:]
    w = w_s[:]
    if wd:
        g = g + wd * w
    w_s[:] = w - lr_ref[0, 0] * g
    _start_writes(
        ids_ref, base, T, R,
        [(lambda t: w_s.at[t], lambda i: out_w.at[i], wsem)],
    )


def _scaled_update_kernel(
    ids_ref, w_hbm, g_ref, scale_ref, out_w,
    w_s, rsem, wsem, *, T, wd, R,
):
    """w[id] += scale * (g + wd * w[id]) for a wave of T unique rows —
    the w-row RMW half of rowwise optimizers. The per-row momentum math
    happens on the XLA side: a scalar-per-row DMA violates Mosaic's
    (8,128) HBM tiling constraint (r1's [R,1] view failed to compile on
    real v5e), and XLA's wide-row gather + scalar scatter beat per-row
    DMA descriptors anyway (tools/bench_rowwise_r2.py)."""
    base = pl.program_id(0) * T
    _start_reads(
        ids_ref, base, T, R,
        [(lambda i: w_hbm.at[i], lambda t: w_s.at[t], rsem)],
    )
    g = g_ref[:]
    w = w_s[:]
    if wd:
        g = g + wd * w
    w_s[:] = w + scale_ref[:] * g
    _start_writes(
        ids_ref, base, T, R,
        [(lambda t: w_s.at[t], lambda i: out_w.at[i], wsem)],
    )


def _adagrad_kernel(
    ids_ref, w_hbm, m_hbm, g_ref, lr_ref, out_w, out_m,
    w_s, m_s, rsem, rmsem, wsem, wmsem, *, T, eps, wd, R,
):
    base = pl.program_id(0) * T
    _start_reads(
        ids_ref, base, T, R,
        [
            (lambda i: w_hbm.at[i], lambda t: w_s.at[t], rsem),
            (lambda i: m_hbm.at[i], lambda t: m_s.at[t], rmsem),
        ],
    )
    g = g_ref[:]
    w = w_s[:]
    if wd:
        g = g + wd * w
    m_new = m_s[:] + g * g
    w_s[:] = w - lr_ref[0, 0] * g / (jnp.sqrt(m_new) + eps)
    m_s[:] = m_new
    _start_writes(
        ids_ref, base, T, R,
        [
            (lambda t: w_s.at[t], lambda i: out_w.at[i], wsem),
            (lambda t: m_s.at[t], lambda i: out_m.at[i], wmsem),
        ],
    )


def _adam_kernel(
    ids_ref, w_hbm, m1_hbm, m2_hbm, g_ref, lr_ref, bc_ref,
    out_w, out_m1, out_m2, w_s, m1_s, m2_s,
    rsem, r1sem, r2sem, wsem, w1sem, w2sem,
    *, T, eps, wd, beta1, beta2, R,
):
    base = pl.program_id(0) * T
    _start_reads(
        ids_ref, base, T, R,
        [
            (lambda i: w_hbm.at[i], lambda t: w_s.at[t], rsem),
            (lambda i: m1_hbm.at[i], lambda t: m1_s.at[t], r1sem),
            (lambda i: m2_hbm.at[i], lambda t: m2_s.at[t], r2sem),
        ],
    )
    g = g_ref[:]
    w = w_s[:]
    if wd:
        g = g + wd * w
    m1 = beta1 * m1_s[:] + (1.0 - beta1) * g
    m2 = beta2 * m2_s[:] + (1.0 - beta2) * g * g
    # bc_ref holds [1/(1-b1^t), 1/(1-b2^t)] precomputed on the host side
    m1_hat = m1 * bc_ref[0, 0]
    m2_hat = m2 * bc_ref[0, 1]
    w_s[:] = w - lr_ref[0, 0] * m1_hat / (jnp.sqrt(m2_hat) + eps)
    m1_s[:] = m1
    m2_s[:] = m2
    _start_writes(
        ids_ref, base, T, R,
        [
            (lambda t: w_s.at[t], lambda i: out_w.at[i], wsem),
            (lambda t: m1_s.at[t], lambda i: out_m1.at[i], w1sem),
            (lambda t: m2_s.at[t], lambda i: out_m2.at[i], w2sem),
        ],
    )


def _pad_wave(uids, g, T):
    N = uids.shape[0]
    Np = -(-N // T) * T
    if Np != N:
        uids = jnp.pad(uids, (0, Np - N), constant_values=2**31 - 1)
        g = jnp.pad(g, ((0, Np - N), (0, 0)))
    return uids, g, Np


def fused_update_sgd(
    weights: Array,
    uids: Array,
    g: Array,
    lr: Array,
    weight_decay: float = 0.0,
    T: int = 128,
    interpret: Optional[bool] = None,
) -> Array:
    """In-place SGD on unique touched rows. uids >= R are skipped."""
    interpret = _auto_interpret(interpret)
    R, D = weights.shape
    uids, g, Np = _pad_wave(uids, g, T)
    lr2 = jnp.full((1, 1), lr, weights.dtype)
    return pl.pallas_call(
        functools.partial(_sgd_kernel, T=T, wd=float(weight_decay), R=R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                pl.BlockSpec(
                    (T, D), lambda i, *p: (i, 0), memory_space=pltpu.VMEM
                ),  # g
                pl.BlockSpec(memory_space=pltpu.SMEM),  # lr
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, D), weights.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, weights, g, lr2)


def fused_update_rowwise_adagrad(
    weights: Array,
    momentum: Array,
    uids: Array,
    g: Array,
    lr: Array,
    eps: float = 1.0e-8,
    weight_decay: float = 0.0,
    T: int = 128,
    momentum_stream: bool = False,
    mom_max_block_share: Optional[float] = None,
    w_impl: str = "rmw",
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """In-place rowwise-Adagrad: momentum [R] holds mean(g^2) per row.

    The Pallas wave kernel streams only the touched w rows through a
    scaled RMW. Momentum runs either on the XLA side (wide-row gather +
    scalar scatter; a scalar-per-row DMA violates Mosaic's (8,128) HBM
    tiling, so it can't ride the w wave) or — `momentum_stream=True`,
    chosen by the ops/cost_model crossover — through the streaming
    [R/128, 128]-tile kernel that also returns the per-id scales.
    uids must be UNIQUE sorted (pre-deduped); >= R skipped."""
    interpret = _auto_interpret(interpret)
    R, D = weights.shape
    uids, g, Np = _pad_wave(uids, g, T)
    valid = (uids < R).astype(jnp.int32)
    ids = jnp.minimum(uids, R - 1)  # XLA-side momentum math only
    hints = dict(indices_are_sorted=True)

    # L2 weight decay folds into g BEFORE the accumulator (FBGEMM
    # semantics, matching the XLA path in ops/fused_update.py)
    if weight_decay:
        w_rows = weights.at[ids].get(
            mode="fill", fill_value=0.0, indices_are_sorted=True
        )
        g = g + weight_decay * w_rows.astype(g.dtype)
        weight_decay = 0.0  # consumed; kernel applies plain scale*g
    g_sq = jnp.mean(
        (g * g).astype(jnp.float32), axis=1
    ) * valid.astype(jnp.float32)
    if momentum_stream:
        new_m_s, inv_s, ovf = rowwise_momentum_stream(
            momentum, uids, g_sq, eps=eps,
            max_block_share=mom_max_block_share, interpret=interpret,
        )

        def _mom_xla(_):
            nm = momentum.at[uids].add(
                g_sq.astype(momentum.dtype), mode="drop", **hints
            )
            mr = momentum.at[ids].get(
                mode="fill", fill_value=0.0, **hints
            ).astype(jnp.float32) + g_sq
            return nm, jnp.where(
                valid > 0, -lr / (jnp.sqrt(mr) + eps), 0.0
            ).astype(jnp.float32)

        def _mom_stream(_):
            return new_m_s, (lr * inv_s).astype(jnp.float32)

        new_m, scale1d = jax.lax.cond(ovf, _mom_xla, _mom_stream, None)
        scale = scale1d.astype(weights.dtype)[:, None]
    else:
        new_m = momentum.at[uids].add(
            g_sq.astype(momentum.dtype), mode="drop", **hints
        )
        m_rows = momentum.at[ids].get(
            mode="fill", fill_value=0.0, **hints
        ).astype(jnp.float32) + g_sq
        scale = jnp.where(
            valid > 0, -lr / (jnp.sqrt(m_rows) + eps), 0.0
        ).astype(weights.dtype)[:, None]

    if w_impl == "write":
        # XLA gather + write-only scatter beats the scaled RMW wave on
        # descriptor count (2 vs 4 scalar-core DMA ops/row; measured 47
        # vs 69-72 ns/row, tools/bench_write_kernel_r5.py). weight_decay
        # was consumed into g above; scale is zero at invalid slots and
        # the kernel skips sentinel writes anyway.
        w_rows = weights.at[ids].get(
            mode="fill", fill_value=0.0, indices_are_sorted=True
        )
        new_rows = w_rows + scale * g
        new_w = scatter_rows_write(
            weights, uids, new_rows, interpret=interpret
        )
        return new_w, new_m

    new_w = pl.pallas_call(
        functools.partial(
            _scaled_update_kernel, T=T, wd=float(weight_decay), R=R
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                pl.BlockSpec(
                    (T, D), lambda i, *p: (i, 0), memory_space=pltpu.VMEM
                ),  # g
                pl.BlockSpec(
                    (T, 1), lambda i, *p: (i, 0), memory_space=pltpu.VMEM
                ),  # per-row scale
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, D), weights.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, weights, g, scale)
    return new_w, new_m


def _rowwise_mom_stream_kernel(
    wrow_ref, skip_ref, m_ref, ids_hbm, gsq_hbm, sc_in, out_m, out_sc,
    ids_s, g_s, sc_s, sems,
    *, TB, KR, R, eps,
):
    """One momentum block of TB x 128 table rows: accumulate this
    block's (sorted, unique) contributions into the momentum tile via
    one-hot MXU matmuls, and emit the per-contribution inverse scale
    -1/(sqrt(m_new)+eps) back into the sorted-position-aligned scale
    array (RMW merge, so overlapping boundary sublane rows of adjacent
    windows survive — the TPU grid is sequential, so the previous
    block's write has completed before this block's read).

    skip_ref[b] != 0 marks a HOT block the caller handles densely on
    the XLA side (split dispatch): the tile passes through untouched,
    no window DMA is issued (its expected load would not fit ANY
    window), and its contributions' scale slots stay at their input
    value for the caller to overwrite."""
    b = pl.program_id(0)

    @pl.when(skip_ref[b] != 0)
    def _passthrough():
        out_m[:] = m_ref[:]

    @pl.when(skip_ref[b] == 0)
    def _work():
        _rowwise_mom_stream_block(
            wrow_ref, m_ref, ids_hbm, gsq_hbm, out_m, out_sc,
            ids_s, g_s, sc_s, sems, b=b, TB=TB, KR=KR, R=R, eps=eps,
        )


def _rowwise_mom_stream_block(
    wrow_ref, m_ref, ids_hbm, gsq_hbm, out_m, out_sc,
    ids_s, g_s, sc_s, sems, *, b, TB, KR, R, eps,
):
    row0 = wrow_ref[b]

    # window DMAs: ids / g_sq / current scale rows [row0, row0+KR)
    pltpu.make_async_copy(
        ids_hbm.at[pl.ds(row0, KR)], ids_s, sems.at[0]
    ).start()
    pltpu.make_async_copy(
        gsq_hbm.at[pl.ds(row0, KR)], g_s, sems.at[1]
    ).start()
    # RMW the scale window through the OUTPUT ref: the aliased input ref
    # can serve stale bytes for rows the previous block just wrote (its
    # boundary sublane row overlaps this window), and interpret-mode
    # aliasing is copy-based — the output ref is the live buffer
    pltpu.make_async_copy(
        out_sc.at[pl.ds(row0, KR)], sc_s, sems.at[2]
    ).start()
    pltpu.make_async_copy(
        ids_hbm.at[pl.ds(row0, KR)], ids_s, sems.at[0]
    ).wait()
    pltpu.make_async_copy(
        gsq_hbm.at[pl.ds(row0, KR)], g_s, sems.at[1]
    ).wait()
    pltpu.make_async_copy(
        out_sc.at[pl.ds(row0, KR)], sc_s, sems.at[2]
    ).wait()

    # All compute stays in the natural [*, 128] lane layout — a
    # [KR,128] -> [1, KR*128] flatten would be a sublane->lane relayout
    # Mosaic handles poorly. The window is processed one sublane row at
    # a time (KR is small and static, so the loop unrolls): per row k,
    # one [TB,128]@[128,128] accumulate matmul and one [128,TB]@[TB,128]
    # gather matmul — total MXU cycles = window elements, same as the
    # flattened form.
    block_lo = b * TB * 128
    rel_all = ids_s[:] - block_lo  # [KR, 128]
    valid_all = (rel_all >= 0) & (rel_all < TB * 128) & (ids_s[:] < R)
    rel_all = jnp.where(valid_all, rel_all, 0)
    row_all = jax.lax.div(rel_all, 128)
    lane_all = jax.lax.rem(rel_all, 128)
    gsq_all = g_s[:]

    hp = jax.lax.Precision.HIGHEST
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 0)

    m_new = m_ref[:]
    lsels = []
    for k in range(KR):
        # rsel_k[r, j] = 1 iff window element j targets tile row r
        rsel_k = (
            (row_iota == row_all[k][None, :]) & valid_all[k][None, :]
        ).astype(jnp.float32)  # [TB, 128j]
        # lsel_k[j, c] = 1 iff element j targets lane c
        lsel_k = (lane_iota == lane_all[k][:, None]).astype(
            jnp.float32
        )  # [128j, 128c]
        lsels.append((rsel_k, lsel_k))
        m_new = m_new + jax.lax.dot(
            rsel_k, lsel_k * gsq_all[k][:, None], precision=hp
        )
    out_m[:] = m_new

    # per-contribution m_new (each row's single contribution is its
    # own: m_new[id] = m_old[id] + gsq[id]) -> inverse scale
    inv_rows = []
    for k in range(KR):
        rsel_k, lsel_k = lsels[k]
        tmp_k = jax.lax.dot_general(
            rsel_k, m_new, (((0,), (0,)), ((), ())), precision=hp
        )  # [128j, 128c]
        m_e_k = jnp.sum(tmp_k * lsel_k, axis=1)  # [128]
        inv_rows.append(-1.0 / (jnp.sqrt(m_e_k) + eps))
    inv = jnp.stack(inv_rows)  # [KR, 128]
    sc_s[:] = jnp.where(valid_all, inv, sc_s[:])
    pltpu.make_async_copy(
        sc_s, out_sc.at[pl.ds(row0, KR)], sems.at[3]
    ).start()
    pltpu.make_async_copy(
        sc_s, out_sc.at[pl.ds(row0, KR)], sems.at[3]
    ).wait()


def _mom_window_rows(
    Rp: int, N: int, TB: int, max_block_share: Optional[float] = None
) -> int:
    """Expected contribution-window size in 128-element sublane rows.

    The kernel's MXU cost is nblocks x 2 x KR x (TB x 128^2 x 2) MAC =
    R x KR x 512 FLOP — TB cancels, so KR is the ONLY cost knob
    (measured r4: KR=16 at pod rows = 2.0 ms = ~13 TFLOP/s f32 MXU).
    Size the window at mean + 8 sigma + 64 slack (per-block occupancy is
    ~Poisson for uniform ids, so 8 sigma is unreachable; skewed/Zipf
    distributions overflow and take the caller's lax.cond fallback,
    same as before): the KR=8 whole-tile floor then binds for every
    bench/pod/HBM shape, halving the r3 sizing's (2.5 x mean) dot cost.

    `max_block_share` is the layout-derived expected WORST-block load as
    a fraction of N (ops/cost_model.mom_max_block_share): heterogeneous
    packed groups concentrate whole features into single blocks, which
    the uniform mean cannot see. Sizing to the worst block keeps mildly
    skewed layouts overflow-free; layouts whose worst block exceeds the
    TB+1 cap should not dispatch here at all (the cost model adds the
    fallback cost, fused_update._use_mom_stream).
    """
    share = TB * 128 / max(Rp, 1) if max_block_share is None else (
        max_block_share
    )
    mean_occ = N * share
    need = mean_occ + 8.0 * (max(mean_occ, 1.0) ** 0.5) + 64.0
    return int(min(TB + 1, max(3, -(-need // 128))))


def momentum_stream_window_rows(window_rows: int) -> int:
    """Round a contribution-window size up to whole (8, 128) DMA tiles.

    Mosaic DMA windows into the [*, 128] id/gsq/scale arrays must be
    whole (8, 128) f32/int32 tiles: a non-multiple-of-8 sublane window
    at a DYNAMIC row offset FAULTS the TPU worker (found on-chip at the
    pod-shard shapes, where the expectation sizing picked KR=13; KR=16
    at the same shapes runs fine — neither interpret mode nor AOT
    compilation catches it, the fault is at runtime). Extra rows are
    pure slack: strictly less overflow, same math. EVERY dynamically-
    offset window size in this module must pass through this helper.
    """
    kr = -(-int(window_rows) // 8) * 8
    assert kr % 8 == 0 and kr >= 8
    return kr


def rowwise_momentum_stream(
    momentum: Array,
    uids: Array,
    g_sq: Array,
    eps: float = 1.0e-8,
    TB: int = 64,
    window_rows: Optional[int] = None,
    max_block_share: Optional[float] = None,
    skip_blocks: Optional[Tuple[int, ...]] = None,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """Streaming rowwise-momentum accumulate + per-id inverse scale.

    skip_blocks: static indices of HOT momentum blocks the caller
    handles densely (split dispatch, ops/fused_update.py): skipped
    blocks pass their tile through, consume no window, and are excluded
    from the overflow check; their contributions' scale slots come back
    as 0 for the caller to overwrite.

    momentum [R] f32; uids [N] SORTED ascending (dedup_row_grads output:
    real ids first, then distinct sentinels >= R; sorted-with-duplicates
    also works when dup slots carry g_sq = 0); g_sq [N] f32 combined
    mean(g²) per id.

    Returns (new_momentum [R], inv_scale [N], overflowed []) where
    inv_scale[p] = -1/(sqrt(new_m[uids[p]]) + eps) for valid p (0 at
    sentinel slots). The whole momentum array streams through VMEM in
    [TB, 128] tiles (tiny: 4 B/row vs 512 B/row for weights), killing
    both the XLA scalar-scatter dispatch floor (~9.5 ns/elem, 2.0 ms at
    bench shapes) and the separate scale gather (~0.8 ms) —
    contributions arrive sorted, so each tile's inputs are one
    contiguous window located by a searchsorted prepass.

    `window_rows` sizes each block's contribution window in 128-element
    sublane rows. The MXU cost of the in-tile one-hot accumulate is
    nblocks x window x (TB + 128), so windows are sized to the EXPECTED
    per-block occupancy (~2.5x mean + slack), not the worst case; when
    any block's contributions exceed the window (id distributions with
    hot blocks — Zipf), the kernel result is INCOMPLETE and `overflowed`
    is True — callers must lax.cond to a fallback (ops/fused_update.py
    does). Passing window_rows=TB+1 restores the can't-overflow worst
    case (the right call for small R where the window cost is trivial).
    """
    interpret = _auto_interpret(interpret)
    R = momentum.shape[0]
    N = uids.shape[0]
    block_rows = TB * 128
    nblocks = max(1, -(-R // block_rows))
    Rp = nblocks * block_rows
    if window_rows is None:
        window_rows = _mom_window_rows(Rp, N, TB, max_block_share)
    KR = momentum_stream_window_rows(window_rows)

    m2d = jnp.pad(momentum, (0, Rp - R)).reshape(Rp // 128, 128)
    # pad ids to a lane multiple plus KR slack rows of sentinels
    Np = -(-max(N, 1) // 128) * 128 + KR * 128
    SENT = jnp.int32(2**31 - 1)
    ids_p = jnp.full((Np,), SENT, jnp.int32).at[:N].set(
        uids.astype(jnp.int32)
    )
    gsq_p = jnp.zeros((Np,), jnp.float32).at[:N].set(
        g_sq.astype(jnp.float32)
    )
    ids2d = ids_p.reshape(Np // 128, 128)
    gsq2d = gsq_p.reshape(Np // 128, 128)
    sc0 = jnp.zeros((Np // 128, 128), jnp.float32)

    bounds = jnp.arange(nblocks + 1, dtype=jnp.int32) * block_rows
    # real contributions only: all real ids < R <= any sentinel, so
    # clamping the upper bounds to R keeps tail sentinels out of the
    # occupancy (they'd spuriously overflow the last block's window)
    edges = jnp.searchsorted(
        ids_p, jnp.minimum(bounds, R).astype(jnp.int32)
    ).astype(jnp.int32)
    starts, ends = edges[:-1], edges[1:]
    wrows = starts // 128
    skip_np = np.zeros((nblocks,), np.int32)
    for sb in skip_blocks or ():
        if 0 <= int(sb) < nblocks:
            skip_np[int(sb)] = 1
    skip = jnp.asarray(skip_np)
    overflowed = jnp.any(
        (ends > wrows * 128 + KR * 128) & (skip == 0)
    )

    # dynamically-offset DMA windows of KR sublane rows: whole-tile or
    # the TPU worker faults at runtime (see momentum_stream_window_rows)
    assert KR % 8 == 0, KR
    new_m2d, sc2d = pl.pallas_call(
        functools.partial(
            _rowwise_mom_stream_kernel, TB=TB, KR=KR, R=R, eps=float(eps)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(
                    (TB, 128), lambda i, *p: (i, 0),
                    memory_space=pltpu.VMEM,
                ),  # momentum tile (pipelined)
                pl.BlockSpec(memory_space=pl.ANY),  # ids2d
                pl.BlockSpec(memory_space=pl.ANY),  # gsq2d
                pl.BlockSpec(memory_space=pl.ANY),  # scale in (aliased)
            ],
            out_specs=(
                pl.BlockSpec(
                    (TB, 128), lambda i, *p: (i, 0),
                    memory_space=pltpu.VMEM,
                ),  # new momentum tile
                pl.BlockSpec(memory_space=pl.ANY),  # scale (manual RMW)
            ),
            scratch_shapes=[
                pltpu.VMEM((KR, 128), jnp.int32),
                pltpu.VMEM((KR, 128), jnp.float32),
                pltpu.VMEM((KR, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((Np // 128, 128), jnp.float32),
        ),
        input_output_aliases={2: 0, 5: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(wrows, skip, m2d, ids2d, gsq2d, sc0)
    new_m = new_m2d.reshape(-1)[:R]
    inv_scale = sc2d.reshape(-1)[:N]
    return new_m, inv_scale, overflowed


def fused_update_adagrad(
    weights: Array,
    momentum: Array,
    uids: Array,
    g: Array,
    lr: Array,
    eps: float = 1.0e-8,
    weight_decay: float = 0.0,
    T: int = 64,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """In-place (elementwise) Adagrad: momentum [R, D]. Default T=64:
    4 DMA-semaphore arrays x T x 4B must fit the ~2KB sflag budget."""
    interpret = _auto_interpret(interpret)
    R, D = weights.shape
    uids, g, Np = _pad_wave(uids, g, T)
    lr2 = jnp.full((1, 1), lr, weights.dtype)
    return pl.pallas_call(
        functools.partial(
            _adagrad_kernel, T=T, eps=float(eps), wd=float(weight_decay),
            R=R,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (T, D), lambda i, *p: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, D), weights.dtype),
            jax.ShapeDtypeStruct((R, D), momentum.dtype),
        ),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, weights, momentum, g, lr2)


def fused_update_adam(
    weights: Array,
    momentum1: Array,
    momentum2: Array,
    uids: Array,
    g: Array,
    lr: Array,
    step: Array,
    eps: float = 1.0e-8,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    T: int = 64,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """In-place Adam; `step` is the (already incremented) step count.
    Default T=64: 6 DMA-semaphore arrays x T x 4B must fit the ~2KB
    sflag budget (overflow measured at 512 semaphores on v5e)."""
    interpret = _auto_interpret(interpret)
    R, D = weights.shape
    uids, g, Np = _pad_wave(uids, g, T)
    lr2 = jnp.full((1, 1), lr, weights.dtype)
    t = jnp.asarray(step).astype(weights.dtype)
    bc = jnp.stack(
        [1.0 / (1.0 - beta1**t), 1.0 / (1.0 - beta2**t)]
    ).reshape(1, 2).astype(weights.dtype)
    return pl.pallas_call(
        functools.partial(
            _adam_kernel,
            T=T,
            eps=float(eps),
            wd=float(weight_decay),
            beta1=float(beta1),
            beta2=float(beta2),
            R=R,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (T, D), lambda i, *p: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.VMEM((T, D), weights.dtype),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
                pltpu.SemaphoreType.DMA((T,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, D), weights.dtype),
            jax.ShapeDtypeStruct((R, D), momentum1.dtype),
            jax.ShapeDtypeStruct((R, D), momentum2.dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, weights, momentum1, momentum2, g, lr2, bc)
