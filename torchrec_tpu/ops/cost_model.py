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
