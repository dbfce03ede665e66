"""Shared bench constants (imported by bench.py AND tools/*).

Lives outside bench.py so tools can read the config without re-executing
the benchmark's module top level: `python bench.py` registers the script
as `__main__`, and a tool's `from bench import ...` inside it would run
bench.py a SECOND time as module `bench` (duplicate _OUT/locks).

Config mirrors the reference's MLPerf DLRM shape (26 sparse features,
embedding_dim 128, dense 13 -> [512,256,128], over [1024,1024,512,256,1],
local batch 8192, Criteo L=1; ref examples/dlrm/README.MD:37-45).
Baseline: the reference's 8x A100-40GB MLPerf run = 5,497,159.68 rec/s
(BASELINE.md) = 687,145 rec/s per GPU.
"""

NUM_TABLES = 26
ROWS = 100_000
HBM_ROWS = 700_000  # 26 x 700k x 128 x 4B = 8.7 GiB of tables
DIM = 128
DENSE_IN = 13
B = 8192
L = 1  # Criteo: exactly one id per feature
STEPS = 60
BASELINE_PER_GPU = 5_497_159.68 / 8.0

# The reference's MLPerf config table cardinalities (97.36 GiB at
# dim=128 fp32; examples/dlrm/README.MD:45). pod_shard benches the
# per-chip shard of this config RW-sharded over POD_CHIPS chips.
MLPERF_CARDINALITIES = (
    40000000, 39060, 17295, 7424, 20265, 3, 7122, 1543, 63, 40000000,
    3067956, 405282, 10, 2209, 11938, 155, 4, 976, 14, 40000000,
    40000000, 40000000, 590152, 12973, 108, 36,
)
POD_CHIPS = 64
