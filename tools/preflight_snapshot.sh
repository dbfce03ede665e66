#!/bin/bash
# End-of-round snapshot gate (VERDICT r4 item 1: a round's last commit
# must be a verified tree). Run BEFORE the final commit; every step must
# pass. Exits nonzero on the first failure.
set -e
cd "$(dirname "$0")/.."

echo "== 1/3 full test suite (CPU mesh) =="
PYTHONPATH="$PWD:${PYTHONPATH}" python -m pytest tests/ -q -x

echo "== 2/3 multichip dryrun (8 virtual devices) =="
# PYTHONPATH WITHOUT .axon_site here: its sitecustomize initializes the
# axon backend at interpreter start, before the CPU flags can take
# effect (the suite step survives because conftest.py re-forces cpu)
PYTHONPATH="$PWD" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')"

echo "== 3/3 fast bench (headline only; chip if reachable) =="
PYTHONPATH="$PWD:${PYTHONPATH}" TORCHREC_BENCH_FAST=1 timeout 900 python bench.py

echo "PREFLIGHT GREEN"
