"""Measured v5e kernel cost model — the single source of truth shared by
the runtime kernel chooser (ops/fused_update.py) and the planner
(planner/constants.py, estimators.py). Numbers from the r2 measurement
campaign (NOTES_r2.md):

* gather: ~8.6 ns per randomly-addressed 512B row, independent of table
  size;
* XLA scatter: rewrites the WHOLE operand — max(~26 ns/row dispatch,
  2 x operand_bytes / 630 GB/s stream). The stream term was re-measured
  r4 AFTER the 128-row operand padding fix (which removed the separate
  whole-operand LAYOUT copies at unaligned row counts): it is intrinsic
  — 626 GB/s equivalent at an 8.68 GiB operand
  (tools/bench_scatter_hbm_r4.py) — so the dispatch crossover at
  operand_bytes ~ N x 21 KB stands;
* Pallas per-row RMW: ~67 ns/row for the 2-descriptor kernels (SGD;
  rowwise with streamed momentum), table-size AND wave-size independent
  (r4: T=64 vs T=128 within 0.5% at R=18.2M); in-wave-momentum kernels
  run ~95-105 ns/row. Wins beyond the stream crossover. An r4
  double-buffered variant measured NEUTRAL (NOTES_r4) and was reverted
  to the simpler serial form.

Re-measure with tools/bench_scatter_hbm_r4.py (scatter/RMW) and
tools/bench_rowwise_r2.py when the hardware generation changes; update
HERE only.
"""

GATHER_NS_PER_ROW = 8.6
SCATTER_NS_PER_ROW = 26.0
PALLAS_RMW_NS_PER_ROW = 67.0
STREAM_BW_BYTES_S = 630.0e9
# Gather+write update (r5, tools/bench_write_kernel_r5.py): XLA's native
# gather does the read half at ~8.6 ns/row, a write-only Pallas kernel
# (scatter_rows_write) the write half at ~35 ns/row (1 start + 1 wait
# per row vs the RMW kernels' 4 scalar-core ops/row) — full EXACT_SGD
# update measured 46.6 ns/row at R=18.2M and 47.3 at R=3.19M
# (table-size independent). Run-coalescing was ALSO evaluated for the
# r4 "70 ns/row floor" question and measured analytically worthless at
# uniform ids (mean adjacent-run length 1.012 -> <=1.2% descriptor
# saving, NOTES_r5.md); the real lever was halving descriptors/row.
PALLAS_GW_NS_PER_ROW = 47.0


def fused_lookup_s(rows_touched: float) -> float:
    """Forward gather time (seconds)."""
    return rows_touched * GATHER_NS_PER_ROW * 1e-9


def xla_update_s(rows_touched: float, operand_bytes: float) -> float:
    """XLA scatter update time: per-row dispatch vs full-operand stream."""
    return max(
        rows_touched * SCATTER_NS_PER_ROW * 1e-9,
        2.0 * operand_bytes / STREAM_BW_BYTES_S,
    )


def pallas_update_s(rows_touched: float) -> float:
    """Pallas per-row RMW update time (table-size independent)."""
    return rows_touched * PALLAS_RMW_NS_PER_ROW * 1e-9


def gather_write_update_s(rows_touched: float) -> float:
    """XLA gather + Pallas write-only scatter update (table-size
    independent; SGD/rowwise w-side)."""
    return rows_touched * PALLAS_GW_NS_PER_ROW * 1e-9


def unique_slot_cap(unique_entries, n_slots: int) -> int:
    """HARD upper bound on unique real rows in an update's id list.

    unique_entries: per-device tuples of (rows_t, slot_frac_t) for the
    packed operand layout — slot_frac_t is the fraction of the N update
    slots that carry table t's ids (a deterministic layout constant:
    feats_t / F-slots, NOT the expected per-device load). A table can
    never contribute more unique rows than min(its slot count, its local
    row count), so the per-device sum is a hard bound; SPMD compiles one
    program, so the worst device gates everyone.
    """
    import math

    caps = [
        sum(min(int(math.ceil(f * n_slots)), int(r)) for r, f in dev)
        for dev in unique_entries
        if dev
    ]
    return max(caps) if caps else n_slots


# Compact pre-pass overheads (measured r4, tools/bench_compact_r4.py):
# one extra [N] int sort + one [cap, D] row gather + the run-total
# one-hot matmul the SGD fast path otherwise skips. Engage only when the
# scatter-slot saving clearly beats that.
COMPACT_EXTRA_NS_PER_SLOT = 5.0  # sort + run-total matmul, per input slot


def use_compact_prepass(n_slots: int, cap: int) -> bool:
    """True when compacting N update slots to `cap` unique slots wins.

    Saving: (N - cap) scatter-dispatch rows. Cost: the extra sort +
    run-total matmul over N slots plus a [cap, D] gather.
    """
    saving = (n_slots - cap) * SCATTER_NS_PER_ROW
    cost = n_slots * COMPACT_EXTRA_NS_PER_SLOT + cap * GATHER_NS_PER_ROW
    return saving > 1.5 * cost


def fused_update_s(rows_touched: float, operand_bytes: float) -> float:
    """Best achievable update time — the runtime picks the cheaper kernel
    (ops/fused_update.py auto dispatch), so the planner models min()."""
    return min(
        xla_update_s(rows_touched, operand_bytes),
        pallas_update_s(rows_touched),
        gather_write_update_s(rows_touched),
    )


# --- rowwise momentum side (r3, re-measured r4) ----------------------------
# XLA path = scalar scatter (~9.5 ns/elem) + 128-wide-row gather + one-hot
# lane select (~0.8 ms at N=213k => ~3.8 ns/elem) + run-total overheads.
# Streaming Pallas kernel (TB=64 blocks): MXU cost = nblocks x 2 loops x
# KR x (TB x 128^2 x 2) MAC = R x KR x 512 FLOP — TB cancels, KR (the
# whole-tile window size, pallas_embedding._mom_window_rows) is the only
# knob. Measured r4 on chip: R=3.19M, KR=16 -> 1.99 ms => ~14 TFLOP/s
# achieved on the kernel's [TB,128]@[128,128] f32 dots (v5e f32 MXU peak
# ~49T; the small dot shapes underutilize it). Stream term: momentum
# in+out + id/gsq/scale windows.
MOM_XLA_NS_PER_ELEM = 13.5  # scatter 9.5 + wide-gather lane select ~4
MOM_STREAM_BYTES_PER_ROW = 25.0  # m in+out (8) + id/gsq/scale windows
MOM_MXU_F32_FLOPS_S = 14.0e12  # achieved, r4 chip anchor
MOM_STREAM_FIXED_S = 30.0e-6


def mom_xla_s(n_elems: float) -> float:
    """XLA rowwise-momentum path: scalar scatter + wide gather."""
    return n_elems * MOM_XLA_NS_PER_ELEM * 1e-9


def mom_max_block_share(
    offsets, rows, id_fracs, total_rows: int, TB: int = 64
) -> float:
    """Max over TB x 128-row momentum blocks of the EXPECTED fraction of
    the batch's id slots whose rows land in that block, given the packed
    table layout (each table's ids uniform over its own rows).

    The uniform-occupancy window sizing (`_mom_kr` with share=None)
    assumes ids spread evenly over the whole packed operand — false for
    heterogeneous groups: at the pod-shard mix a handful of tiny tables
    (3-600 rows, one feature = 8192 ids EACH) pack into ONE 8192-row
    block, whose expected load is ~15 features x B, hundreds of times
    the window cap. The kernel then overflows EVERY step and the
    lax.cond fallback runs the XLA path on top of the wasted kernel
    (measured r4: 1.04 ms kernel + 2.59 ms conditional per pod rowwise
    step). Strategies compute this share from their static layout so
    the dispatch can see the skew.
    """
    return max(mom_block_fracs(offsets, rows, id_fracs, total_rows, TB))


def mom_block_fracs(
    offsets, rows, id_fracs, total_rows: int, TB: int = 64
):
    """Per-block expected load fractions (see mom_max_block_share) as a
    tuple — static metadata the split dispatch uses to pick which blocks
    to handle densely."""
    block = TB * 128
    nb = max(1, -(-int(total_rows) // block))
    load = [0.0] * nb
    for off, r, fr in zip(offsets, rows, id_fracs):
        off, r, fr = int(off), int(r), float(fr)
        if r <= 0 or fr <= 0.0:
            continue
        b0 = off // block
        b1 = (off + r - 1) // block
        for b in range(b0, min(b1, nb - 1) + 1):
            lo = max(off, b * block)
            hi = min(off + r, (b + 1) * block)
            load[b] += fr * (hi - lo) / float(r)
    return tuple(load)


def _mom_kr(
    table_rows: float,
    n_elems: float,
    TB: int = 64,
    max_block_share: "float | None" = None,
) -> int:
    """Mirror of pallas_embedding._mom_window_rows + whole-tile rounding."""
    block = TB * 128
    Rp = max(block, -(-int(table_rows) // block) * block)
    share = block / Rp if max_block_share is None else max_block_share
    mean = n_elems * share
    need = mean + 8.0 * (max(mean, 1.0) ** 0.5) + 64.0
    raw = int(min(TB + 1, max(3, -(-need // 128))))
    return -(-raw // 8) * 8


def mom_needed_rows(load_elems: float) -> int:
    """Window sublane rows a block with `load_elems` expected
    contributions needs (mean + 8 sigma + 64 slack, in 128-lane rows).
    Blocks needing more than TB+1 rows cannot fit any window and must be
    skipped (handled densely) or the whole group routed to XLA."""
    need = load_elems + 8.0 * (max(load_elems, 1.0) ** 0.5) + 64.0
    return int(-(-need // 128))


def _mom_overflows(
    n_elems: float, TB: int = 64, max_block_share: "float | None" = None
) -> bool:
    """True when the expected worst-block load exceeds the window CAP
    (TB+1 sublane rows) — the stream kernel would overflow and its
    lax.cond fallback would run the XLA path on top of it."""
    if max_block_share is None:
        return False
    need = n_elems * max_block_share
    return need > (TB + 1) * 128


MOM_DENSE_FIXED_S = 0.4e-3  # [N,128] tmp traffic + merges (r4 chip fit)
MOM_PASS2_FIXED_S = 0.15e-3  # 2nd kernel sweep: grid + m/sc restream


def mom_split_cut(
    block_fracs, n_elems: float, TB: int = 64
):
    """Cost-optimal three-way cut for the split momentum dispatch.

    The stream kernel's cost is R x KR x 512 FLOP: ONE medium block
    inflates every block's window (measured r4: the pod mix's 9222-row
    table forced KR=64 => 5.5 ms kernel). Blocks sorted by needed
    window rows split into:
      dense  — can't fit any window (needed > TB+1) or worth the
               ~4 x N x TB x 128 FLOP one-hot cost;
      tier2  — fit at a LARGE window: a second kernel pass processes
               only them (skipped blocks are pass-through), costing
               just block_rows x KR2 x 512 FLOP each + a fixed sweep;
      cold   — the base pass at the small window.

    Returns (dense_blocks, tier2_blocks, cold_share, kr2, cost_s).
    """
    nb = len(block_fracs)
    needed = [mom_needed_rows(f * n_elems) for f in block_fracs]
    order = sorted(range(nb), key=lambda b: -needed[b])
    k0 = sum(1 for r in needed if r > TB + 1)  # can't-fit: always dense
    table_rows = nb * TB * 128.0
    block_rows = TB * 128.0
    dense_each = 4.0 * n_elems * TB * 128.0 / MOM_MXU_F32_FLOPS_S
    best = None
    for kd in range(k0, min(nb, k0 + 8) + 1):
        dense_cost = kd * dense_each + (MOM_DENSE_FIXED_S if kd else 0.0)
        for k2 in range(0, min(nb - kd, 16) + 1):
            t2 = order[kd : kd + k2]
            cold = [block_fracs[b] for b in order[kd + k2 :]]
            cold_share = max(cold) if cold else None
            kr2 = 0
            if t2:
                kr2 = -(-max(needed[b] for b in t2) // 8) * 8
                kr2 = min(kr2, -(-(TB + 1) // 8) * 8)
            stream = (
                mom_stream_s(table_rows, n_elems, cold_share)
                if cold else 0.0
            )
            pass2 = (
                MOM_PASS2_FIXED_S
                + k2 * block_rows * kr2 * 512.0 / MOM_MXU_F32_FLOPS_S
                + table_rows * 8.0 / STREAM_BW_BYTES_S
            ) if t2 else 0.0
            total = stream + pass2 + dense_cost
            if best is None or total < best[4]:
                best = (
                    tuple(sorted(order[:kd])), tuple(sorted(t2)),
                    cold_share, kr2, total,
                )
    return best


def mom_stream_s(
    table_rows: float,
    n_elems: float = 213_000.0,
    max_block_share: "float | None" = None,
) -> float:
    """Streaming Pallas rowwise-momentum kernel: R x KR x 512 FLOP of
    one-hot dots + the R-bound VMEM stream. When the layout share says
    the window cap can't hold the worst block, the real cost is the
    kernel PLUS the always-taken XLA fallback."""
    kr = _mom_kr(table_rows, n_elems, max_block_share=max_block_share)
    t = (
        table_rows * kr * 512.0 / MOM_MXU_F32_FLOPS_S
        + table_rows * MOM_STREAM_BYTES_PER_ROW / STREAM_BW_BYTES_S
        + MOM_STREAM_FIXED_S
    )
    if _mom_overflows(n_elems, max_block_share=max_block_share):
        t += mom_xla_s(n_elems)
    return t
