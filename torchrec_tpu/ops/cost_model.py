"""Measured v5e kernel cost model — the single source of truth shared by
the runtime kernel chooser (ops/fused_update.py) and the planner
(planner/constants.py, estimators.py). Numbers from the r2 measurement
campaign (NOTES_r2.md):

* gather: ~8.6 ns per randomly-addressed 512B row, independent of table
  size;
* XLA scatter: rewrites the WHOLE operand — max(~26 ns/row dispatch,
  2 x operand_bytes / 630 GB/s stream);
* Pallas per-row RMW: ~67 ns/row, table-size independent (wins beyond
  the stream crossover, shard_bytes > N x ~21 KB).

Re-measure with tools/bench_rowwise_r2.py + the NOTES_r2 follow-up
scripts when the hardware generation changes; update HERE only.
"""

GATHER_NS_PER_ROW = 8.6
SCATTER_NS_PER_ROW = 26.0
PALLAS_RMW_NS_PER_ROW = 67.0
STREAM_BW_BYTES_S = 630.0e9


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


def fused_update_s(rows_touched: float, operand_bytes: float) -> float:
    """Best achievable update time — the runtime picks the cheaper kernel
    (ops/fused_update.py auto dispatch), so the planner models min()."""
    return min(
        xla_update_s(rows_touched, operand_bytes),
        pallas_update_s(rows_touched),
    )


# --- rowwise momentum side (r3) -------------------------------------------
# XLA path = scalar scatter (~9.5 ns/elem) + 128-wide-row gather + one-hot
# lane select (~0.8 ms at N=213k => ~3.8 ns/elem) + run-total overheads.
# Streaming Pallas kernel (expectation-sized windows, TB=64 blocks) =
# whole [R] momentum through VMEM tiles (stream, R-bound) + one-hot MXU
# accumulate: 2 dots x TB x window x 128 MAC per block with window =
# ~2.5 x mean occupancy => total ~= 2 x TB x 128 x 2.5 x 2 FLOP/elem
# ~= 41 kFLOP per contribution (N-bound). PROVISIONAL until the r3 chip
# campaign lands (tools/bench_mom_stream_r3.py); re-measure HERE only.
MOM_XLA_NS_PER_ELEM = 13.5  # scatter 9.5 + wide-gather lane select ~4
MOM_STREAM_BYTES_PER_ROW = 25.0  # m in+out (8) + id/gsq/scale windows
MOM_STREAM_FLOP_PER_ELEM = 41.0e3  # one-hot dots, expectation windows
MXU_F32_FLOPS_S = 45.0e12
MOM_STREAM_FIXED_S = 30.0e-6


def mom_xla_s(n_elems: float) -> float:
    """XLA rowwise-momentum path: scalar scatter + wide gather."""
    return n_elems * MOM_XLA_NS_PER_ELEM * 1e-9


def mom_stream_s(table_rows: float, n_elems: float = 213_000.0) -> float:
    """Streaming Pallas rowwise-momentum kernel: R-bound stream +
    N-bound one-hot accumulate."""
    return (
        table_rows * MOM_STREAM_BYTES_PER_ROW / STREAM_BW_BYTES_S
        + n_elems * MOM_STREAM_FLOP_PER_ELEM / MXU_F32_FLOPS_S
        + MOM_STREAM_FIXED_S
    )
