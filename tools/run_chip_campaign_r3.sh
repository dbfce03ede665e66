#!/bin/bash
# r3 chip campaign — run top-to-bottom the moment the axon relay works.
# Each step is independently timeout-bounded; one TPU job at a time
# (NOTES_r2: the relay serializes; parallel chip jobs stall each other).
# Big-table steps run in their own process (jit constant caches pin
# tables -> OOM otherwise).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== 1. bench (full suites) $(date) ==="
TORCHREC_BENCH_BUDGET_S=2400 timeout 3000 python bench.py

echo "=== 2. momentum-stream campaign $(date) ==="
timeout 1800 python tools/bench_mom_stream_r3.py --rows 2600000
timeout 1800 python tools/bench_mom_stream_r3.py --rows 3190449
timeout 2400 python tools/bench_mom_stream_r3.py --rows 18200000

echo "=== 3. overlap evidence $(date) ==="
timeout 1200 python tools/overlap_r3.py --mode trace
timeout 1200 python tools/overlap_r3.py --mode hlo --n_devices 1
timeout 1200 python tools/overlap_r3.py --mode hlo --n_devices 1 --prefetch

echo "=== 4. quality (chip scale) $(date) ==="
bash tools/run_quality_r3.sh

echo "=== 5. serving tier (chip) $(date) ==="
timeout 1200 python tools/bench_serving.py --requests 200 --batch_size 2048

echo "=== CAMPAIGN DONE $(date) ==="
