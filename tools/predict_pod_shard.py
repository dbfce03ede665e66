"""Planner-predicted per-chip step time for the bench pod_shard config
(VERDICT r2 item 2: "wire the same shapes through the planner's cost
model — predicted vs measured in NOTES_r3").

Uses the SAME measured-constant cost model the planner's perf estimator
uses (ops/cost_model.py via planner/constants.py): per-chip compute =
fused gather + size-adaptive fused update per table shard, plus the
dense arches at the MXU, plus input/output dist terms (which bench.py's
single-chip run does NOT pay — both predictions are printed).

  python tools/predict_pod_shard.py            # MLPerf/64 pod shard
  python tools/predict_pod_shard.py --chips 1 --rows 100000  # bench cfg
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench_config import (
    B,
    BASELINE_PER_GPU,
    DENSE_IN,
    DIM,
    MLPERF_CARDINALITIES,
    NUM_TABLES,
)
from torchrec_tpu.ops import cost_model


def predict(chips: int = 64, rows: int = None,
            optim: str = "exact_sgd") -> dict:
    """Cost-model step-time prediction for a bench config; pure math
    (no jax) so bench.py can attach predictions to its relay-down error
    record. Returns {step_ms, ex_s, vs_baseline, parts}."""
    if rows is not None:
        row_list = [rows] * NUM_TABLES
    else:
        row_list = [max(8, -(-c // chips)) for c in MLPERF_CARDINALITIES]

    # one fused update covers the whole group of RW shards: ids of all
    # 26 features are deduped per shard; bench concatenates tables into
    # one row space per strategy, so model the group as one operand
    total_rows = sum(row_list)
    group_bytes = total_rows * DIM * 4
    n_ids = NUM_TABLES * B  # L=1 Criteo

    lookup = cost_model.fused_lookup_s(n_ids)
    update = cost_model.fused_update_s(n_ids, group_bytes)
    # layout share: the dispatch sees heterogeneous tiny-table mixes
    # (pod) and routes to XLA instead of overflowing the window
    offs, acc = [], 0
    for r in row_list:
        offs.append(acc)
        acc += r
    share = cost_model.mom_max_block_share(
        offs, row_list, [1 / NUM_TABLES] * NUM_TABLES, acc
    )
    mom = 0.0
    if optim == "rowwise_adagrad":
        mom = min(
            cost_model.mom_xla_s(n_ids),
            cost_model.mom_stream_s(total_rows, n_ids, share),
        )

    # dense arches: fwd+bwd FLOPs at the bf16 MXU (2x fwd for bwd)
    def mlp_flops(sizes, b):
        f = 0
        prev = sizes[0]
        for s in sizes[1:]:
            f += 2 * b * prev * s
            prev = s
        return f

    dense_flops = 3 * (
        mlp_flops((DENSE_IN, 512, 256, DIM), B)
        + mlp_flops(((NUM_TABLES + 1) * DIM + 0, 1024, 1024, 512, 256, 1),
                    B)
        + 2 * B * (NUM_TABLES + 1) * DIM * (NUM_TABLES + 1)  # interaction
    )
    MXU_BF16 = 197e12 * 0.5  # ~50% achievable on small batches
    dense_s = dense_flops / MXU_BF16

    # misc measured overhead of the fused step (sort/dedup/gen), from the
    # r2 profile: SGD total 6.82 ms - w-scatter 5.41 - gather ~1.8*?;
    # keep the profiled residual
    misc_s = 1.4e-3

    step_s = lookup + update + mom + dense_s + misc_s
    ex_s = B / step_s
    return {
        "total_rows": total_rows,
        "group_gib": group_bytes / 2**30,
        "n_ids": n_ids,
        "step_ms": step_s * 1e3,
        "ex_s": ex_s,
        "vs_baseline": ex_s / BASELINE_PER_GPU,
        "parts_ms": {
            "lookup": lookup * 1e3,
            "update": update * 1e3,
            "momentum": mom * 1e3,
            "dense": dense_s * 1e3,
            "misc": misc_s * 1e3,
        },
        "update_xla_ms": cost_model.xla_update_s(n_ids, group_bytes) * 1e3,
        "update_pallas_ms": cost_model.pallas_update_s(n_ids) * 1e3,
        "mom_xla_ms": cost_model.mom_xla_s(n_ids) * 1e3,
        "mom_stream_ms": cost_model.mom_stream_s(
            total_rows, n_ids, share
        ) * 1e3,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chips", type=int, default=64)
    p.add_argument("--rows", type=int, default=None,
                   help="uniform per-table rows (overrides MLPerf/chips)")
    p.add_argument("--optim", choices=["exact_sgd", "rowwise_adagrad"],
                   default="exact_sgd")
    args = p.parse_args()

    r = predict(args.chips, args.rows, args.optim)
    parts = r["parts_ms"]
    print(f"config: {args.chips}-chip shard, "
          f"total_rows={r['total_rows']:,} "
          f"({r['group_gib']:.2f} GiB), N={r['n_ids']:,}, "
          f"optim={args.optim}")
    print(f"  lookup   {parts['lookup']:7.2f} ms")
    print(f"  update   {parts['update']:7.2f} ms  "
          f"(xla {r['update_xla_ms']:.2f} / "
          f"pallas {r['update_pallas_ms']:.2f})")
    if args.optim == "rowwise_adagrad":
        print(f"  momentum {parts['momentum']:7.2f} ms  "
              f"(xla {r['mom_xla_ms']:.2f} / "
              f"stream {r['mom_stream_ms']:.2f})")
    print(f"  dense    {parts['dense']:7.2f} ms")
    print(f"  misc     {parts['misc']:7.2f} ms")
    print(f"predicted single-chip step {r['step_ms']:.2f} ms -> "
          f"{r['ex_s']:,.0f} ex/s/chip "
          f"(vs A100 baseline {r['vs_baseline']:.3f}x)")


if __name__ == "__main__":
    main()
