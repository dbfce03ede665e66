"""Fused sparse-embedding optimizer updates — the TPU equivalent of
FBGEMM's optimizer-in-backward (ref: `SplitTableBatchedEmbeddingBagsCodegen`
with optimizer= fused_params, consumed at
torchrec/distributed/batched_embedding_kernel.py:260-284,604-647).

Design (TPU-first):

JAX has no "backward writes to parameters", so the fused update is an
explicit step the training loop calls with the cotangent of the *pooled
output* — the table never receives a dense [R, D] gradient:

    pooled = batched_embedding_lookup(state.weights, ids, ...)
    (loss, d_pooled) via jax.vjp over fn(pooled)        # table not diffed
    row_grads = pooled_grad_to_row_grads(d_pooled, ...) # [N, D] per-token
    state = apply_fused_update(state, flat_ids, row_grads, valid, lr)

With buffer donation in the enclosing jit, `weights`/`momentum` update
in place: memory traffic is O(touched rows), like the CUDA kernel.

Duplicate-id correctness: rowwise-Adagrad accumulates mean(g_row²) of the
TOTAL per-row gradient, so in-batch duplicate ids must be combined before
the state update. `dedup_row_grads` does sort + segment-sum compaction in
static shapes (no `jnp.unique`): ids are sorted, runs of equal ids are
summed into compact slots, slack slots scatter to an out-of-range row and
are dropped by XLA scatter's OOB-drop mode.
"""

from __future__ import annotations

import enum
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class EmbOptimType(enum.Enum):
    """ref: fbgemm EmbOptimType / torchrec OptimType
    (torchrec/distributed/embedding_types.py:32-41)."""

    SGD = "sgd"
    EXACT_SGD = "exact_sgd"
    ADAGRAD = "adagrad"
    ROWWISE_ADAGRAD = "rowwise_adagrad"
    ADAM = "adam"
    PARTIAL_ROWWISE_ADAM = "partial_rowwise_adam"
    LAMB = "lamb"
    PARTIAL_ROWWISE_LAMB = "partial_rowwise_lamb"
    LARS_SGD = "lars_sgd"


@struct.dataclass
class FusedOptimizerState:
    """Optimizer state living WITH the table, as in the reference where
    momentum lives inside the fbgemm module
    (ref: batched_embedding_kernel.py:204-246).

    momentum1: [R] for ROWWISE_ADAGRAD, [R, D] for ADAGRAD/ADAM, None for SGD
    momentum2: [R, D] for ADAM second moment, else None
    step: scalar int32 (ADAM bias correction)
    """

    momentum1: Optional[Array]
    momentum2: Optional[Array]
    step: Array
    optim: EmbOptimType = struct.field(pytree_node=False)


def fused_state_shapes(optim: EmbOptimType) -> Tuple[str, str]:
    """(momentum1, momentum2) shape kinds: 'none' | 'row' [R] | 'full'
    [R, D] — single source of truth for every state-allocation site."""
    if optim in (EmbOptimType.SGD, EmbOptimType.EXACT_SGD):
        return "none", "none"
    if optim is EmbOptimType.ROWWISE_ADAGRAD:
        return "row", "none"
    if optim in (EmbOptimType.ADAGRAD, EmbOptimType.LARS_SGD):
        return "full", "none"
    if optim in (EmbOptimType.ADAM, EmbOptimType.LAMB):
        return "full", "full"
    if optim in (
        EmbOptimType.PARTIAL_ROWWISE_ADAM,
        EmbOptimType.PARTIAL_ROWWISE_LAMB,
    ):
        return "full", "row"
    raise ValueError(f"unknown fused optimizer: {optim}")


def init_fused_optimizer_state(
    num_rows: int, dim: int, optim: EmbOptimType, dtype=jnp.float32
) -> FusedOptimizerState:
    def make(kind):
        if kind == "row":
            return jnp.zeros((num_rows,), dtype=dtype)
        if kind == "full":
            return jnp.zeros((num_rows, dim), dtype=dtype)
        return None

    k1, k2 = fused_state_shapes(optim)
    m1, m2 = make(k1), make(k2)
    return FusedOptimizerState(
        momentum1=m1, momentum2=m2, step=jnp.zeros((), jnp.int32), optim=optim
    )


def pooled_grad_to_row_grads(
    d_pooled: Array,
    lengths: Array,
    max_length: int,
    pooling_is_mean: bool = False,
    per_sample_weights: Optional[Array] = None,
) -> Array:
    """Expand pooled-output cotangent [F, B, D] to per-token row grads
    [F, B, L, D] (chain rule of the masked pooling reduction)."""
    F, B = lengths.shape
    L = max_length
    mask = (jnp.arange(L)[None, None, :] < lengths[:, :, None]).astype(
        d_pooled.dtype
    )
    if per_sample_weights is not None:
        mask = mask * per_sample_weights.astype(d_pooled.dtype)
    if pooling_is_mean:
        denom = jnp.maximum(lengths.astype(d_pooled.dtype), 1.0)
        mask = mask / denom[:, :, None]
    return d_pooled[:, :, None, :] * mask[:, :, :, None]


def dedup_row_grads(
    flat_ids: Array, row_grads: Array, valid: Array, num_rows: int
) -> Tuple[Array, Array]:
    """Combine gradients of duplicate ids. Static shapes throughout.

    flat_ids:  [N] global row ids
    row_grads: [N, D]
    valid:     [N] bool (pad tokens False)
    Returns (uids [N], sums [N, D]) where each real unique row appears once;
    slack slots have uid == num_rows (dropped by OOB scatter downstream).
    """
    N = flat_ids.shape[0]
    ids = jnp.where(valid, flat_ids, num_rows)
    # one sort yields both sorted keys and the permutation (an argsort
    # followed by ids[order] re-gathers the keys — measured ~1.5ms/step)
    sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
    g = row_grads[order]
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sid[1:] != sid[:-1]]
    )
    seg = jnp.cumsum(first) - 1  # [N] compact segment index (nondecreasing)
    # indices_are_sorted unlocks XLA's fast scatter path (sorted+dup scatter
    # measured 3x faster than unsorted on v5e, tools/bench_kernels.py)
    sums = jax.ops.segment_sum(
        g, seg, num_segments=N, indices_are_sorted=True
    )
    uids = (
        jnp.full((N,), num_rows, dtype=sid.dtype)
        .at[seg]
        .set(sid, indices_are_sorted=True)
    )
    # Pad/sentinel slots get DISTINCT out-of-range ids (num_rows + position)
    # so `uids` is globally sorted AND unique — this unlocks XLA's fast
    # vectorized scatter path (indices_are_sorted + unique_indices gave a
    # 3x speedup over the serialized default on v5e). All >= num_rows ids
    # are dropped by mode="drop". (num_rows + N stays well inside int32
    # for any real table.)
    pos = jnp.arange(N, dtype=sid.dtype)
    uids = jnp.where(uids >= num_rows, num_rows + pos, uids)
    return uids, sums


def run_total_row_grads(
    flat_ids: Array, row_grads: Array, valid: Array, num_rows: int
) -> Tuple[Array, Array]:
    """Duplicate-combine WITHOUT the compaction scatters of
    `dedup_row_grads` — for consumers that only need UNIQUE real slots,
    not sorted/compacted ones (the per-slot Pallas RMW wave kernels,
    whose reads clip and whose writes are predicated on uid < R).

    Each real unique row's TOTAL gradient lands at its run's FIRST
    sorted position (computed by `_run_totals`' chunked one-hot MXU
    matmul instead of an [N, D] scatter — ~26ns/row dispatch saved);
    duplicate and invalid slots carry the skip sentinel 2**31 - 1. The
    returned uids are NOT globally sorted (sentinels interleave), so
    this form must never feed `indices_are_sorted` XLA ops or the
    block-windowed rowwise momentum stream kernel.
    """
    N = flat_ids.shape[0]
    ids = jnp.where(valid, flat_ids, num_rows)
    sid, order = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
    g_sorted = row_grads[order]
    pos = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sid[1:] != sid[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(first, pos, 0))
    totals = _run_totals(g_sorted, run_start)
    uids = jnp.where(
        first & (sid < num_rows), sid, jnp.int32(2**31 - 1)
    )
    return uids, totals


def compact_row_grads(
    flat_ids: Array,
    row_grads: Array,
    valid: Array,
    num_rows: int,
    cap: int,
) -> Tuple[Array, Array, Array]:
    """Shrink N update slots to `cap` slots holding the UNIQUE real rows'
    total gradients (sorted ascending), padded with the `num_rows`
    sentinel. EXACT whenever cap >= the true unique count — callers pass
    the layout's hard bound (ops/cost_model.unique_slot_cap), so no
    overflow branch exists.

    Scatter-free: duplicate runs combine via `_run_totals`' chunked
    one-hot MXU matmul; the compaction itself is a second [N] key sort
    (run-first slots keep their id, every other slot keys past the reals)
    followed by a [cap, D] permutation gather. XLA's scatter charges
    ~26ns per SLOT regardless of drops (measured r4,
    tools/bench_scatter_dropslots_r4.py), so slot count is the only
    scatter lever — this buys (N - cap) slots on every downstream
    scatter/gather at dup-heavy mixes (the pod MLPerf shard is 28%
    unique).

    Returns (ids [cap], grads [cap, D], valid [cap]).
    """
    N = flat_ids.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    ids = jnp.where(valid, flat_ids, num_rows)
    sid, order = jax.lax.sort_key_val(ids, pos)
    g_sorted = row_grads[order]
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sid[1:] != sid[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(first, pos, 0))
    totals = _run_totals(g_sorted, run_start)
    fmask = first & (sid < num_rows)
    # run-first real slots keep their (unique) id; everything else keys
    # strictly past them, distinct, in position order -> one sort yields
    # [unique ids ascending | dup/invalid tail]
    key2 = jnp.where(fmask, sid, num_rows + pos)
    k2s, perm = jax.lax.sort_key_val(key2, pos)
    ids_c = jnp.minimum(k2s[:cap], num_rows)  # tail -> plain sentinel
    g_c = totals[perm[:cap]]
    return ids_c, g_c, ids_c < num_rows


_RUN_TOTAL_CHUNK = 512


def stochastic_round(x32: Array, target_dtype, key: Array) -> Array:
    """Stochastic rounding f32 -> bf16/f16 (fbgemm rounds half-precision
    weight writes stochastically so sub-ulp updates survive in
    expectation; ref: TBE stochastic_rounding fused_param).

    Adds uniform random bits below the target mantissa cut in the f32
    bit pattern, then truncates — exactly SR for both targets.
    """
    if target_dtype == jnp.bfloat16:
        drop = 16  # f32 keeps 7 mantissa bits -> drop low 16
    elif target_dtype == jnp.float16:
        # f16 has 10 mantissa bits vs f32's 23 -> drop low 13 (subnormal
        # boundary handled by the final convert)
        drop = 13
    else:
        return x32.astype(target_dtype)
    u = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    r = jax.random.bits(key, x32.shape, jnp.uint32) & ((1 << drop) - 1)
    u = u + r
    mask = jnp.uint32(0xFFFFFFFF) << drop
    rounded = jax.lax.bitcast_convert_type(u & mask, jnp.float32)
    return rounded.astype(target_dtype)


def _run_totals(g_sorted: Array, run_start: Array) -> Array:
    """Segment totals at each run's first position.

    out[k] = sum_{i: run_start[i] == k} g_sorted[i]; zeros elsewhere.
    Equivalent to `segment_sum(g, run_start)` but computed as a chunked
    one-hot matmul on the MXU instead of a scatter (the [N, D] sorted
    scatter costs ~26ns/row dispatch on v5e; the matmul runs at FLOP
    speed). Runs spanning chunk boundaries contribute a per-chunk carry
    row scattered separately (n_chunks rows — negligible).
    """
    N, D = g_sorted.shape
    C = _RUN_TOTAL_CHUNK
    if N % C or D % 128 or N < 4 * C:
        return jax.ops.segment_sum(
            g_sorted, run_start, num_segments=N, indices_are_sorted=True
        )
    nch = N // C
    gs = g_sorted.reshape(nch, C, D)
    rs = run_start.reshape(nch, C)
    base = (jnp.arange(nch, dtype=run_start.dtype) * C)[:, None]
    local = rs - base  # < 0 for rows whose run started in an earlier chunk
    slot = jnp.where(local >= 0, local + 1, 0)  # slot 0 = carry
    onehot = jax.nn.one_hot(slot, C + 1, dtype=g_sorted.dtype)
    partial = jnp.einsum(
        "ncs,ncd->nsd", onehot, gs,
        preferred_element_type=g_sorted.dtype,
    )  # [nch, C+1, D]
    out = partial[:, 1:, :].reshape(N, D)
    carry_pos = rs[:, 0]  # nondecreasing; duplicates possible (long runs)
    return out.at[carry_pos].add(
        partial[:, 0, :], mode="drop", indices_are_sorted=True
    )


def apply_fused_update(
    weights: Array,
    opt_state: FusedOptimizerState,
    flat_ids: Array,
    row_grads: Array,
    valid: Array,
    learning_rate: Array,
    eps: float = 1.0e-8,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eta: float = 0.001,
    momentum: float = 0.9,
    stochastic_rounding: bool = True,
    mom_max_block_share: "Optional[float]" = None,
    mom_block_fracs: "Optional[Tuple[float, ...]]" = None,
    unique_entries: "Optional[Tuple[Tuple[Tuple[int, float], ...], ...]]" = None,
    compact: str = "auto",
    mom_impl: str = "auto",
    w_impl: str = "auto",
) -> Tuple[Array, FusedOptimizerState]:
    """Apply one fused sparse optimizer step to touched rows only.

    weights:   [R, D] (donate in the enclosing jit for in-place update)
    flat_ids:  [N] global row ids into `weights`
    row_grads: [N, D] per-token gradients (pre-dedup)
    valid:     [N] bool
    mom_max_block_share: static layout hint for the rowwise streaming-
        momentum dispatch (ops/cost_model.mom_max_block_share) — the
        expected worst-momentum-block load as a fraction of N. None =
        assume uniform ids over the operand (single plain tables).
    mom_block_fracs: the full per-block tuple (cost_model.
        mom_block_fracs); implies mom_max_block_share = max(fracs) and
        enables the split dispatch (TORCHREC_TPU_MOM_IMPL=split): hot
        blocks handled densely on the XLA side while the stream kernel
        skips them.
    unique_entries: per-device (rows_t, slot_frac_t) layout constants
        (ops/cost_model.unique_slot_cap input) bounding the unique real
        rows; enables the static-cap compaction pre-pass at dup-heavy
        layouts (tiny tables, few features per slot).
    compact: "never" | "auto" | "always" — compaction pre-pass policy.
        A documented fused_params key (like the reference fused_params
        contract, ref embedding_types.py:240-243); the
        TORCHREC_TPU_COMPACT env var overrides it for debugging.
    mom_impl: "xla" | "stream" | "split" | "auto" — rowwise-momentum
        implementation. fused_params key; TORCHREC_TPU_MOM_IMPL
        overrides.
    w_impl: "rmw" | "write" | "auto" — Pallas weight-update form: the
        in-place RMW wave kernels (4 scalar-core DMA ops/row) or XLA
        gather + write-only scatter (measured 47 vs 67-72 ns/row,
        tools/bench_write_kernel_r5.py). fused_params key;
        TORCHREC_TPU_W_IMPL overrides.

    Semantics match FBGEMM per optimizer:
      SGD:             w -= lr * g
      ADAGRAD:         m += g²;  w -= lr * g / (sqrt(m) + eps)
      ROWWISE_ADAGRAD: m += mean(g²);  w -= lr * g / (sqrt(m) + eps)
      ADAM (exact):    m1 = b1 m1 + (1-b1) g; m2 = b2 m2 + (1-b2) g²
                       w -= lr * m1_hat / (sqrt(m2_hat) + eps)
      PARTIAL_ROWWISE_ADAM: ADAM with rowwise m2 = b2 m2 + (1-b2) mean(g²)
      LAMB:            Adam ratio rt (+ wd*w), per-row trust
                       w -= lr * (||w|| / ||rt||) * rt
      PARTIAL_ROWWISE_LAMB: LAMB with rowwise m2
      LARS_SGD:        lr_adj = lr * eta * ||w|| / (||g|| + wd*||w||)
                       m = momentum*m + lr_adj*(g + wd*w);  w -= m
    where g is the TOTAL (dup-combined) row gradient and norms are
    per-row L2 (ref: fbgemm optimizer kernels selected via
    fused_params["optimizer"], batched_embedding_kernel.py:260-284).
    """
    R = weights.shape[0]
    if mom_max_block_share is None and mom_block_fracs:
        mom_max_block_share = max(mom_block_fracs)

    # --- static-cap compaction pre-pass (dup-heavy layouts) ---------------
    # unique_entries (per-device (rows_t, slot_frac_t) layout constants)
    # bound the unique real rows HARD; when that cap is well below N,
    # shrink the slot list once up front — every downstream scatter,
    # gather, and momentum op then pays `cap` dispatch rows instead of N.
    # TORCHREC_TPU_COMPACT=never|auto|always overrides the cost model.
    from torchrec_tpu.ops.cost_model import (
        unique_slot_cap,
        use_compact_prepass,
    )

    _N0 = flat_ids.shape[0]
    _compact_mode = os.environ.get("TORCHREC_TPU_COMPACT", compact)
    if (
        unique_entries
        and _compact_mode != "never"
        and _N0 % _RUN_TOTAL_CHUNK == 0
        and _N0 >= 4 * _RUN_TOTAL_CHUNK
        and row_grads.shape[1] % 128 == 0
    ):
        _cap = unique_slot_cap(unique_entries, _N0)
        _cap = min(_N0, -(-_cap // _RUN_TOTAL_CHUNK) * _RUN_TOTAL_CHUNK)
        if _cap < _N0 and (
            _compact_mode == "always" or use_compact_prepass(_N0, _cap)
        ):
            flat_ids, row_grads, valid = compact_row_grads(
                flat_ids, row_grads, valid, R, _cap
            )

    from torchrec_tpu.ops.embedding import _use_pallas

    # Size-adaptive kernel choice (measured v5e, ops/cost_model.py +
    # NOTES_r2.md): XLA's scatter REWRITES the whole operand, while the
    # Pallas per-row RMW streams only touched rows (table-size
    # independent; 14.4 vs 26.2 ms at 8.2 GiB). Pick Pallas when the
    # stream term dominates — i.e. at HBM-scale shards.
    from torchrec_tpu.ops.cost_model import (
        gather_write_update_s,
        pallas_update_s,
        xla_update_s,
    )

    N_ids = flat_ids.shape[0]
    auto_pallas = (
        min(pallas_update_s(N_ids), gather_write_update_s(N_ids))
        < xla_update_s(N_ids, weights.nbytes)
        and weights.dtype == jnp.float32
        and weights.shape[1] % 128 == 0
        and jax.default_backend() == "tpu"  # interpret mode has no DMA win
    )
    if (
        _use_pallas(weights.dtype, 1) or auto_pallas
    ) and optim_supports_pallas(opt_state.optim):
        # ROWWISE_ADAGRAD's momentum machinery (XLA sorted-hint scatter/
        # gather + block-windowed stream kernel) needs sorted compacted
        # uids; every other Pallas optimizer is a pure per-slot wave
        # kernel, so the scatter-free run-total form feeds it directly
        # (saves the [N, D] segment-sum + [N] compaction scatters —
        # ~7ms/step at bench N on v5e, the HBM-scale gap's main term).
        if opt_state.optim is EmbOptimType.ROWWISE_ADAGRAD:
            uids_c, g_c = dedup_row_grads(flat_ids, row_grads, valid, R)
        else:
            uids_c, g_c = run_total_row_grads(
                flat_ids, row_grads, valid, R
            )
        return _apply_fused_update_pallas(
            weights, opt_state, uids_c, g_c, learning_rate,
            eps=eps, weight_decay=weight_decay, beta1=beta1, beta2=beta2,
            mom_max_block_share=mom_max_block_share, mom_impl=mom_impl,
            w_impl=w_impl,
        )

    # --- sorted positional combine (no compaction scatter) ---------------
    # Tokens sorted by row id; each duplicate run's TOTAL gradient lands at
    # the run's first position via a segment_sum keyed by run-start index;
    # dup positions carry zeros. Scatters then use the sorted-with-
    # duplicates ids directly (measured as fast as sorted-unique on v5e),
    # with updates forced to zero at dup slots. Invalid tokens sort to the
    # end under sentinel id R and are dropped by mode="drop".
    N = flat_ids.shape[0]
    ids_s = jnp.where(valid, flat_ids, R)
    pos = jnp.arange(N, dtype=jnp.int32)
    uids, order = jax.lax.sort_key_val(ids_s, pos)  # sorted ids + perm
    g_sorted = row_grads[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), uids[1:] != uids[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(first, pos, 0))
    fmask = first & (uids < R)
    cdt = (
        jnp.float32
        if weights.dtype in (jnp.bfloat16, jnp.float16)
        else weights.dtype
    )
    fm = fmask.astype(cdt)

    hints = dict(indices_are_sorted=True)  # duplicates allowed

    # --- SGD fast path: scatter-add is linear, so duplicate tokens need
    # no combining at all (exact, not approximate) when nothing nonlinear
    # (weight decay gather, SR row writes) consumes per-row totals
    sr_now = stochastic_rounding and weights.dtype in (
        jnp.bfloat16, jnp.float16
    )
    if (
        opt_state.optim in (EmbOptimType.SGD, EmbOptimType.EXACT_SGD)
        and not weight_decay
        and not sr_now
    ):
        lr0 = jnp.asarray(learning_rate, dtype=cdt)
        new_w = weights.at[uids].add(
            (-lr0 * g_sorted).astype(weights.dtype), mode="drop", **hints
        )
        return new_w, opt_state.replace(step=opt_state.step + 1)

    # run totals at first positions, zeros at dup positions
    g = _run_totals(g_sorted, run_start)

    _L2_ON_GRAD = (
        EmbOptimType.SGD,
        EmbOptimType.EXACT_SGD,
        EmbOptimType.ADAGRAD,
        EmbOptimType.ROWWISE_ADAGRAD,
        EmbOptimType.ADAM,
    )
    if weight_decay and opt_state.optim in _L2_ON_GRAD:
        g = g + (weight_decay * fm)[:, None] * weights.at[uids].get(
            mode="fill", fill_value=0.0, **hints
        ).astype(cdt)
    lr = jnp.asarray(learning_rate, dtype=cdt)
    optim = opt_state.optim

    # half-precision tables: write whole rows with stochastic rounding so
    # sub-ulp updates survive in expectation (fbgemm stochastic_rounding)
    sr_active = stochastic_rounding and weights.dtype in (
        jnp.bfloat16, jnp.float16
    )

    def _sr_set(upd_all):
        """SET every run position to SR(w_old + run_update)."""
        w_rows32 = weights.at[uids].get(
            mode="fill", fill_value=0.0, **hints
        ).astype(cdt)
        key = jax.random.fold_in(
            jax.random.PRNGKey(0x5EED), opt_state.step
        )
        w_q = stochastic_round(w_rows32 + upd_all, weights.dtype, key)
        return weights.at[uids].set(w_q, mode="drop", **hints)

    if optim in (EmbOptimType.SGD, EmbOptimType.EXACT_SGD):
        if sr_active:
            # run totals propagated to every position (dups included)
            total_all = g.at[run_start].get(**hints)
            new_w = _sr_set(-lr * total_all)
        else:
            new_w = weights.at[uids].add(
                (-lr * g).astype(weights.dtype), mode="drop", **hints
            )
        return new_w, opt_state.replace(step=opt_state.step + 1)

    def _gather_rowwise_state(state_1d, fill):
        """state_1d[uids] for a [R] rowwise optimizer state — via a
        128-wide row view + lane select. A scalar-row gather costs ~5.2ms
        at bench shapes on v5e while a 128-wide row gather costs ~1.8ms
        (both dispatch-bound per row, so width is free up to the tile;
        tools/bench_rowwise_r2.py): view [R] as [R/128, 128], gather the
        containing rows, pick the lane. OOB sentinel uids get `fill`."""
        Rp = -(-R // 128) * 128
        m2 = (
            state_1d
            if Rp == R
            else jnp.concatenate(
                [state_1d, jnp.zeros((Rp - R,), state_1d.dtype)]
            )
        ).reshape(-1, 128)
        rid = jnp.minimum(uids // 128, (Rp // 128) - 1)
        rows = m2.at[rid].get(
            mode="fill", fill_value=fill, indices_are_sorted=True
        )  # [N, 128]
        # lane select as a one-hot masked sum: take_along_axis lowers to
        # another per-element gather (~2.4ms); the VPU mask-reduce is
        # memory-bound (~0.8ms measured)
        oh = jax.nn.one_hot(uids % 128, 128, dtype=state_1d.dtype)
        vals = (rows * oh).sum(axis=1)
        return jnp.where(uids < R, vals, jnp.asarray(fill, state_1d.dtype))

    if optim is EmbOptimType.ROWWISE_ADAGRAD:
        m = opt_state.momentum1
        g_sq = jnp.mean(g * g, axis=1)  # [N]; zero at dup slots
        mom_impl = _mom_impl(
            R, N, mom_max_block_share, mom_block_fracs,
            default=mom_impl,
        )
        if mom_impl in ("stream", "split"):
            # streaming Pallas momentum (r3): the whole [R] accumulator
            # rides VMEM tiles and the per-position scale comes back
            # sorted-position-aligned — no scalar scatter, no gather.
            # Works on sorted-WITH-duplicate ids: dup slots carry
            # g_sq = 0 so they accumulate nothing, and their returned
            # scale multiplies g = 0. Windows are sized to the expected
            # worst block (layout share when given, uniform mean
            # otherwise); a hotter-than-expected distribution (Zipf)
            # overflows them, and the cond falls back to the XLA path
            # (kernel cost then wasted — rare by construction, and
            # layout-guaranteed overflow routes to XLA up front via the
            # cost model).
            from torchrec_tpu.ops.pallas_embedding import (
                rowwise_momentum_stream,
            )

            dense_blocks: Tuple[int, ...] = ()
            tier2_blocks: Tuple[int, ...] = ()
            cold_share = mom_max_block_share
            kr2 = 0
            if mom_impl == "split":
                dense_blocks, tier2_blocks, cold_share, kr2 = (
                    _mom_hot_blocks(mom_block_fracs, N)
                )
            gsq32 = g_sq.astype(jnp.float32)
            new_m_s, inv_s, ovf = rowwise_momentum_stream(
                m, uids, gsq32, eps=eps,
                max_block_share=cold_share,
                skip_blocks=dense_blocks + tier2_blocks,
            )
            if tier2_blocks:
                # second pass at the LARGE window over ONLY the medium
                # blocks (everything else passes through): per-block
                # cost is block_rows x KR2 x 512 FLOP, not R x KR2
                nb2 = -(-R // (64 * 128))
                skip2 = tuple(
                    b for b in range(nb2) if b not in set(tier2_blocks)
                )
                new_m_s, inv2, ovf2 = rowwise_momentum_stream(
                    new_m_s, uids, gsq32, eps=eps,
                    window_rows=kr2, skip_blocks=skip2,
                )
                in_t2 = _slots_in_blocks(uids, tier2_blocks, R)
                inv_s = jnp.where(in_t2, inv2, inv_s)
                ovf = ovf | ovf2
            if dense_blocks:
                new_m_s, inv_s = _mom_dense_hot(
                    new_m_s, m, uids, g_sq, inv_s, dense_blocks, eps, R
                )

            def _mom_xla(_):
                nm = m.at[uids].add(g_sq, mode="drop", **hints)
                mr = _gather_rowwise_state(nm, 1.0)
                return nm, (1.0 / (jnp.sqrt(mr) + eps)).astype(
                    jnp.float32
                )

            def _mom_stream(_):
                return new_m_s, (-inv_s).astype(jnp.float32)

            new_m, inv_sqrt = jax.lax.cond(
                ovf, _mom_xla, _mom_stream, None
            )
            inv_sqrt = inv_sqrt.astype(cdt)
        else:
            new_m = m.at[uids].add(g_sq, mode="drop", **hints)
            m_rows = _gather_rowwise_state(new_m, 1.0)
            inv_sqrt = 1.0 / (jnp.sqrt(m_rows) + eps)
        if sr_active:
            # inv_sqrt is per-position and constant across a duplicate
            # run (same id), so no run_start re-gather is needed
            total_all = g.at[run_start].get(**hints)
            new_w = _sr_set(-lr * total_all * inv_sqrt[:, None])
        else:
            upd = -lr * g * inv_sqrt[:, None]
            new_w = weights.at[uids].add(
                upd.astype(weights.dtype), mode="drop", **hints
            )
        return new_w, opt_state.replace(
            momentum1=new_m, step=opt_state.step + 1
        )

    if optim is EmbOptimType.ADAGRAD:
        m = opt_state.momentum1
        new_m = m.at[uids].add(g * g, mode="drop", **hints)
        m_rows = new_m.at[uids].get(mode="fill", fill_value=1.0, **hints)
        upd = -lr * g / (jnp.sqrt(m_rows) + eps)
        new_w = weights.at[uids].add(
            upd.astype(weights.dtype), mode="drop", **hints
        )
        return new_w, opt_state.replace(
            momentum1=new_m, step=opt_state.step + 1
        )

    if optim is EmbOptimType.ADAM:
        step = opt_state.step + 1
        m1 = opt_state.momentum1
        m2 = opt_state.momentum2
        m1_rows = m1.at[uids].get(mode="fill", fill_value=0.0, **hints)
        m2_rows = m2.at[uids].get(mode="fill", fill_value=0.0, **hints)
        new_m1_rows = beta1 * m1_rows + (1.0 - beta1) * g
        new_m2_rows = beta2 * m2_rows + (1.0 - beta2) * g * g
        # momentum "set" becomes a masked delta-add: duplicate slots must
        # not write (their new_m*_rows are stale beta-decayed values)
        new_m1 = m1.at[uids].add(
            fm[:, None] * (new_m1_rows - m1_rows), mode="drop", **hints
        )
        new_m2 = m2.at[uids].add(
            fm[:, None] * (new_m2_rows - m2_rows), mode="drop", **hints
        )
        # bias correction in the f32 compute dtype: beta**t computed in
        # bf16 rounds beta2=0.999 to ~0.99609 and mis-scales early steps
        t = step.astype(cdt)
        m1_hat = new_m1_rows / (1.0 - beta1**t)
        m2_hat = new_m2_rows / (1.0 - beta2**t)
        upd = -lr * fm[:, None] * m1_hat / (jnp.sqrt(m2_hat) + eps)
        new_w = weights.at[uids].add(
            upd.astype(weights.dtype), mode="drop", **hints
        )
        return new_w, opt_state.replace(momentum1=new_m1, momentum2=new_m2, step=step)

    w_rows = weights.at[uids].get(
        mode="fill", fill_value=0.0, **hints
    ).astype(cdt)

    if optim in (EmbOptimType.PARTIAL_ROWWISE_ADAM,):
        step = opt_state.step + 1
        m1_rows = opt_state.momentum1.at[uids].get(
            mode="fill", fill_value=0.0, **hints
        )
        m2_rows = _gather_rowwise_state(opt_state.momentum2, 0.0)
        new_m1_rows = beta1 * m1_rows + (1.0 - beta1) * g
        new_m2_rows = beta2 * m2_rows + (1.0 - beta2) * jnp.mean(
            g * g, axis=1
        )
        t = step.astype(cdt)
        m1_hat = new_m1_rows / (1.0 - beta1**t)
        m2_hat = new_m2_rows / (1.0 - beta2**t)
        upd = -lr * m1_hat / (jnp.sqrt(m2_hat)[:, None] + eps)
        if weight_decay:
            upd = upd - lr * weight_decay * w_rows
        upd = upd * fm[:, None]
        new_w = weights.at[uids].add(
            upd.astype(weights.dtype), mode="drop", **hints
        )
        new_m1 = opt_state.momentum1.at[uids].add(
            fm[:, None] * (new_m1_rows - m1_rows), mode="drop", **hints
        )
        new_m2 = opt_state.momentum2.at[uids].add(
            fm * (new_m2_rows - m2_rows), mode="drop", **hints
        )
        return new_w, opt_state.replace(
            momentum1=new_m1, momentum2=new_m2, step=step
        )

    if optim in (EmbOptimType.LAMB, EmbOptimType.PARTIAL_ROWWISE_LAMB):
        step = opt_state.step + 1
        rowwise = optim is EmbOptimType.PARTIAL_ROWWISE_LAMB
        m1_rows = opt_state.momentum1.at[uids].get(
            mode="fill", fill_value=0.0, **hints
        )
        m2_rows = (
            _gather_rowwise_state(opt_state.momentum2, 0.0)
            if rowwise
            else opt_state.momentum2.at[uids].get(
                mode="fill", fill_value=0.0, **hints
            )
        )
        new_m1_rows = beta1 * m1_rows + (1.0 - beta1) * g
        if rowwise:
            new_m2_rows = beta2 * m2_rows + (1.0 - beta2) * jnp.mean(
                g * g, axis=1
            )
        else:
            new_m2_rows = beta2 * m2_rows + (1.0 - beta2) * g * g
        t = step.astype(cdt)
        m1_hat = new_m1_rows / (1.0 - beta1**t)
        m2_hat = new_m2_rows / (1.0 - beta2**t)
        if rowwise:
            rt = m1_hat / (jnp.sqrt(m2_hat)[:, None] + eps)
        else:
            rt = m1_hat / (jnp.sqrt(m2_hat) + eps)
        if weight_decay:
            rt = rt + weight_decay * w_rows
        w_norm = jnp.linalg.norm(w_rows, axis=1)
        r_norm = jnp.linalg.norm(rt, axis=1)
        trust = jnp.where(
            (w_norm > 0) & (r_norm > 0), w_norm / (r_norm + eps), 1.0
        )
        new_w = weights.at[uids].add(
            (-lr * (trust * fm)[:, None] * rt).astype(weights.dtype),
            mode="drop", **hints,
        )
        new_m1 = opt_state.momentum1.at[uids].add(
            fm[:, None] * (new_m1_rows - m1_rows), mode="drop", **hints
        )
        m2_delta = new_m2_rows - m2_rows
        new_m2 = opt_state.momentum2.at[uids].add(
            (fm * m2_delta) if m2_delta.ndim == 1 else fm[:, None] * m2_delta,
            mode="drop", **hints,
        )
        return new_w, opt_state.replace(
            momentum1=new_m1, momentum2=new_m2, step=step
        )

    if optim is EmbOptimType.LARS_SGD:
        m_rows = opt_state.momentum1.at[uids].get(
            mode="fill", fill_value=0.0, **hints
        )
        w_norm = jnp.linalg.norm(w_rows, axis=1)
        g_norm = jnp.linalg.norm(g, axis=1)
        denom = g_norm + weight_decay * w_norm
        lr_adj = jnp.where(
            (w_norm > 0) & (denom > 0),
            lr * eta * w_norm / (denom + eps),
            lr,
        )
        new_m_rows = (
            momentum * m_rows
            + lr_adj[:, None] * (g + weight_decay * w_rows)
        )
        new_w = weights.at[uids].add(
            (-fm[:, None] * new_m_rows).astype(weights.dtype),
            mode="drop", **hints,
        )
        new_m = opt_state.momentum1.at[uids].add(
            fm[:, None] * (new_m_rows - m_rows), mode="drop", **hints
        )
        return new_w, opt_state.replace(
            momentum1=new_m, step=opt_state.step + 1
        )

    raise ValueError(f"unsupported fused optimizer: {optim}")


def _mom_impl(
    R: int,
    N: int,
    max_block_share: "Optional[float]" = None,
    block_fracs: "Optional[Tuple[float, ...]]" = None,
    default: str = "auto",
) -> str:
    """Rowwise-momentum implementation: 'stream' | 'xla' | 'split'.

    'split' (hot blocks dense on the XLA side, stream kernel skips
    them) requires the per-block layout (`block_fracs`) and is opt-in
    via TORCHREC_TPU_MOM_IMPL=split until chip-calibrated into 'auto'.
    """
    impl = os.environ.get("TORCHREC_TPU_MOM_IMPL", default)
    if impl == "split":
        return "split" if block_fracs else "stream"
    if impl in ("stream", "xla"):
        return impl
    if jax.default_backend() != "tpu":
        return "xla"
    from torchrec_tpu.ops.cost_model import (
        mom_split_cut,
        mom_stream_s,
        mom_xla_s,
    )

    costs = {
        "xla": mom_xla_s(N),
        "stream": mom_stream_s(R, N, max_block_share),
    }
    if block_fracs:
        dense, tier2, _, _, split_cost = mom_split_cut(block_fracs, N)
        if dense or tier2:  # else split degenerates to stream
            costs["split"] = split_cost
    return min(costs, key=costs.get)


def _mom_hot_blocks(
    block_fracs: "Tuple[float, ...]", N: int, TB: int = 64
):
    """(dense_blocks, tier2_blocks, cold_share, kr2): the COST-OPTIMAL
    three-way cut — a medium block inflates the stream kernel's global
    window (its cost is R x KR x 512 FLOP), so medium blocks go to a
    second large-window pass and packed blocks to the dense one-hot
    side (cost_model.mom_split_cut)."""
    from torchrec_tpu.ops.cost_model import mom_split_cut

    dense, tier2, cold_share, kr2, _ = mom_split_cut(block_fracs, N, TB)
    return dense, tier2, cold_share, kr2


def _slots_in_blocks(
    uids: Array, blocks: "Tuple[int, ...]", R: int, TB: int = 64
) -> Array:
    """[N] bool: slot's id lands in one of the given momentum blocks."""
    block = TB * 128
    uids32 = uids.astype(jnp.int32)
    out = jnp.zeros(uids.shape, bool)
    for b in blocks:
        out = out | (
            (uids32 >= b * block) & (uids32 < (b + 1) * block)
            & (uids32 < R)
        )
    return out


def _mom_dense_hot(
    m_kernel: Array,
    m_orig: Array,
    uids: Array,
    g_sq: Array,
    inv_kernel: Array,
    hot_blocks: "Tuple[int, ...]",
    eps: float,
    R: int,
    TB: int = 64,
) -> Tuple[Array, Array]:
    """Dense one-hot MXU momentum for statically-hot blocks.

    The scalar m-scatter costs ~9.5 ns per SLOT regardless of operand
    size, but a handful of 8192-row blocks can be accumulated and
    scale-extracted as [N, H*64] x [H*64, 128] one-hot matmuls at MXU
    speed. m_kernel is the stream kernel's output (hot tiles passed
    through); inv_kernel its sorted-position scale (hot slots = 0).
    Returns (merged momentum, merged NEGATIVE inverse scale) matching
    the kernel's -1/(sqrt(m_new)+eps) convention.
    """
    block = TB * 128
    nb = max(1, -(-R // block))
    Rp = nb * block
    H = len(hot_blocks)
    hp = jax.lax.Precision.HIGHEST

    uids32 = uids.astype(jnp.int32)
    is_hot = jnp.zeros(uids.shape, bool)
    hrank = jnp.zeros(uids.shape, jnp.int32)
    for j, b in enumerate(hot_blocks):
        lo = b * block
        hi = min((b + 1) * block, Rp)
        in_b = (uids32 >= lo) & (uids32 < hi) & (uids32 < R)
        is_hot = is_hot | in_b
        hrank = jnp.where(in_b, j, hrank)

    m_pad = jnp.pad(m_orig.astype(jnp.float32), (0, Rp - R))
    m_hot2d = jnp.concatenate(
        [
            jax.lax.dynamic_slice_in_dim(m_pad, b * block, block)
            for b in hot_blocks
        ]
    ).reshape(H * TB, 128)

    hidx = jnp.where(is_hot, hrank * block + uids32 % block, 0)
    row = hidx // 128  # [N] in [0, H*TB)
    lane = hidx % 128
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (1, H * TB), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    rsel = (
        (rows_iota == row[:, None]) & is_hot[:, None]
    ).astype(jnp.float32)  # [N, H*TB]
    lsel = (lane_iota == lane[:, None]).astype(jnp.float32)  # [N, 128]

    gsq32 = g_sq.astype(jnp.float32) * is_hot.astype(jnp.float32)
    contrib = jax.lax.dot_general(
        rsel, lsel * gsq32[:, None],
        (((0,), (0,)), ((), ())), precision=hp,
    )  # [H*TB, 128]
    m_hot_new = m_hot2d + contrib

    tmp = jax.lax.dot(rsel, m_hot_new, precision=hp)  # [N, 128]
    m_e = jnp.sum(tmp * lsel, axis=1)  # [N]
    hot_inv = -1.0 / (jnp.sqrt(m_e) + eps)

    m_out = jnp.pad(m_kernel.astype(jnp.float32), (0, Rp - R))
    flat = m_hot_new.reshape(-1)
    for j, b in enumerate(hot_blocks):
        m_out = jax.lax.dynamic_update_slice(
            m_out, jax.lax.dynamic_slice_in_dim(flat, j * block, block),
            (b * block,),
        )
    inv = jnp.where(is_hot, hot_inv.astype(inv_kernel.dtype), inv_kernel)
    return m_out[:R].astype(m_kernel.dtype), inv


def _use_mom_stream(
    R: int, N: int, max_block_share: "Optional[float]" = None,
    default: str = "auto",
) -> bool:
    """Pick the rowwise-momentum implementation: the streaming Pallas
    kernel (R-bound: whole [R] accumulator through VMEM tiles) vs the
    XLA scalar-scatter + wide-gather path (N-bound dispatch). Constants
    in ops/cost_model.py; the layout share makes guaranteed-overflow
    groups (heterogeneous tiny-table mixes) pay the honest stream+
    fallback cost and route to XLA up front.
    TORCHREC_TPU_MOM_IMPL=stream|xla overrides."""
    impl = os.environ.get("TORCHREC_TPU_MOM_IMPL", default)
    if impl == "split":
        # the hot-block split is an XLA-route feature; on the Pallas
        # route the closest honoring of the override is the stream
        # kernel (same choice _mom_impl makes when block_fracs are
        # absent) rather than silently falling back to auto
        impl = "stream"
    if impl == "stream":
        return True
    if impl == "xla":
        return False
    from torchrec_tpu.ops.cost_model import mom_stream_s, mom_xla_s

    return (
        jax.default_backend() == "tpu"
        and mom_stream_s(R, N, max_block_share) < mom_xla_s(N)
    )


def _w_impl(N: int, default: str = "auto") -> str:
    """Pallas weight-update form: "rmw" (in-place wave kernels) or
    "write" (XLA gather + write-only scatter). Measured r5: gather+write
    47 ns/row vs RMW 67-72 — BOTH costs are linear in N with no
    crossover, so "auto" currently resolves to "write" at every N; the
    cost-model comparison is kept so a re-measured constant (new chip
    generation) changes the dispatch here alone.
    TORCHREC_TPU_W_IMPL overrides."""
    impl = os.environ.get("TORCHREC_TPU_W_IMPL", default)
    if impl in ("rmw", "write"):
        return impl
    from torchrec_tpu.ops.cost_model import (
        gather_write_update_s,
        pallas_update_s,
    )

    return (
        "write"
        if gather_write_update_s(N) < pallas_update_s(N)
        else "rmw"
    )


def optim_supports_pallas(optim: EmbOptimType) -> bool:
    return optim in (
        EmbOptimType.SGD,
        EmbOptimType.EXACT_SGD,
        EmbOptimType.ROWWISE_ADAGRAD,
        EmbOptimType.ADAGRAD,
        EmbOptimType.ADAM,
    )


def _apply_fused_update_pallas(
    weights: Array,
    opt_state: FusedOptimizerState,
    uids: Array,
    g: Array,
    learning_rate,
    eps: float,
    weight_decay: float,
    beta1: float,
    beta2: float,
    mom_max_block_share: "Optional[float]" = None,
    mom_impl: str = "auto",
    w_impl: str = "auto",
) -> Tuple[Array, FusedOptimizerState]:
    """Route the deduped row update to the in-place Pallas kernels."""
    from torchrec_tpu.ops import pallas_embedding as pe

    lr = jnp.asarray(learning_rate, dtype=weights.dtype)
    optim = opt_state.optim
    step = opt_state.step + 1
    R = weights.shape[0]
    w_impl = _w_impl(uids.shape[0], default=w_impl)

    # wave sizes bounded by the sflag (DMA semaphore) budget: ~2KB total,
    # 4 bytes per semaphore, one read+write array pair per streamed
    # tensor (measured overflow at T=256 with 2 arrays on v5e)
    if optim in (EmbOptimType.SGD, EmbOptimType.EXACT_SGD):
        if w_impl == "write":
            # XLA gather (8.6 ns/row) + write-only scatter (35 ns/row)
            # vs the RMW wave kernel's 4 scalar-core DMA ops/row —
            # measured 47 vs 69-72 ns/row (bench_write_kernel_r5.py).
            # uids may interleave sentinels (run-total form): plain
            # clipped gather, writes predicated in-kernel.
            w_rows = weights[jnp.minimum(uids, R - 1)]
            g2 = g + weight_decay * w_rows if weight_decay else g
            new_w = pe.scatter_rows_write(
                weights, uids, w_rows - lr * g2
            )
        else:
            new_w = pe.fused_update_sgd(
                weights, uids, g, lr, weight_decay=weight_decay, T=128
            )
        return new_w, opt_state.replace(step=step)

    if optim is EmbOptimType.ROWWISE_ADAGRAD:
        new_w, new_m = pe.fused_update_rowwise_adagrad(
            weights, opt_state.momentum1, uids, g, lr,
            eps=eps, weight_decay=weight_decay, T=128,
            momentum_stream=_use_mom_stream(
                weights.shape[0], uids.shape[0], mom_max_block_share,
                default=mom_impl,
            ),
            mom_max_block_share=mom_max_block_share,
            w_impl=w_impl,
        )
        return new_w, opt_state.replace(momentum1=new_m, step=step)

    if optim is EmbOptimType.ADAGRAD:
        if w_impl == "write":
            # gathers 2x8.6 + writes 2x35 ~= 87 ns/row vs the in-wave
            # RMW kernel's ~95-105 (8 scalar-core DMA ops/row)
            safe = jnp.minimum(uids, R - 1)
            w_rows = weights[safe]
            m_rows = opt_state.momentum1[safe]
            g2 = g + weight_decay * w_rows if weight_decay else g
            m_new = m_rows + g2 * g2
            w_new = w_rows - lr * g2 / (jnp.sqrt(m_new) + eps)
            new_w = pe.scatter_rows_write(weights, uids, w_new)
            new_m = pe.scatter_rows_write(
                opt_state.momentum1, uids, m_new
            )
        else:
            new_w, new_m = pe.fused_update_adagrad(
                weights, opt_state.momentum1, uids, g, lr,
                eps=eps, weight_decay=weight_decay, T=64,
            )
        return new_w, opt_state.replace(momentum1=new_m, step=step)

    if optim is EmbOptimType.ADAM:
        if w_impl == "write":
            safe = jnp.minimum(uids, R - 1)
            w_rows = weights[safe]
            m1_rows = opt_state.momentum1[safe]
            m2_rows = opt_state.momentum2[safe]
            g2 = g + weight_decay * w_rows if weight_decay else g
            m1n = beta1 * m1_rows + (1.0 - beta1) * g2
            m2n = beta2 * m2_rows + (1.0 - beta2) * g2 * g2
            t_f = step.astype(jnp.float32)
            bc1 = 1.0 / (1.0 - jnp.float32(beta1) ** t_f)
            bc2 = 1.0 / (1.0 - jnp.float32(beta2) ** t_f)
            w_new = w_rows - lr * (m1n * bc1) / (
                jnp.sqrt(m2n * bc2) + eps
            )
            new_w = pe.scatter_rows_write(weights, uids, w_new)
            new_m1 = pe.scatter_rows_write(
                opt_state.momentum1, uids, m1n
            )
            new_m2 = pe.scatter_rows_write(
                opt_state.momentum2, uids, m2n
            )
        else:
            new_w, new_m1, new_m2 = pe.fused_update_adam(
                weights, opt_state.momentum1, opt_state.momentum2,
                uids, g, lr, step, eps=eps, weight_decay=weight_decay,
                beta1=beta1, beta2=beta2, T=64,
            )
        return new_w, opt_state.replace(
            momentum1=new_m1, momentum2=new_m2, step=step
        )

    raise ValueError(f"unsupported fused optimizer: {optim}")
