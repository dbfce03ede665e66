"""r5 chip A/B: the compaction pre-pass at the pod MLPerf mix.

VERDICT r4 items 2/3/5: the pre-pass was built in r4 but never ran (missing
import + unwired unique_entries). Now wired, this measures the full fused
gen+train step (bench.py machinery, identical to the driver's pod_shard /
pod_shard_rowwise suites) under TORCHREC_TPU_COMPACT=never vs auto, for
EXACT_SGD and ROWWISE_ADAGRAD.

Pod layout cap: sum_t min(8192, shard_rows_t) ~= 65,634 of N=212,992 slots
(31%) -> every downstream scatter/gather pays 3.2x fewer dispatch rows.

Run: python tools/bench_compact_pod_r5.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench_config import (  # noqa: E402
    B,
    BASELINE_PER_GPU,
    MLPERF_CARDINALITIES,
    NUM_TABLES,
    POD_CHIPS,
)


def main():
    import bench as bench_mod

    rows64 = [max(8, -(-c // POD_CHIPS)) for c in MLPERF_CARDINALITIES]

    results = {}
    for optim in ("exact_sgd", "rowwise_adagrad"):
        for mode in ("never", "auto"):
            os.environ["TORCHREC_TPU_COMPACT"] = mode
            dmp = bench_mod._build(optim, None, per_table_rows=rows64)
            ex = bench_mod._throughput(dmp, None, per_table_rows=rows64)
            del dmp
            key = f"pod_{optim}_{mode}"
            results[key] = ex
            print(
                f"{key}: {ex:,.0f} ex/s  step={B / ex * 1e3:.2f} ms  "
                f"vs_baseline={ex / BASELINE_PER_GPU:.4f}",
                flush=True,
            )

    print("\nsummary:")
    for optim in ("exact_sgd", "rowwise_adagrad"):
        nv = results[f"pod_{optim}_never"]
        au = results[f"pod_{optim}_auto"]
        print(
            f"  {optim}: never {nv:,.0f} -> auto {au:,.0f} "
            f"({(au / nv - 1) * 100:+.1f}%)"
        )


if __name__ == "__main__":
    main()
