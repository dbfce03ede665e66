"""Run ONLY the hbm_scale suite (full DLRM step, 8.7 GiB tables, one
chip) — quick re-measure after fused-update dispatch changes.

Run: python tools/bench_hbm_only_r4.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_config import BASELINE_PER_GPU, HBM_ROWS

import bench  # noqa: E402  (module body defines _build/_throughput)


def main():
    hbm = bench._throughput(bench._build("exact_sgd", HBM_ROWS), HBM_ROWS)
    print(
        f"hbm_scale: {hbm:,.1f} ex/s/chip  "
        f"vs_baseline {hbm / BASELINE_PER_GPU:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
