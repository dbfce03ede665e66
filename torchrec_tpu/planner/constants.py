"""Planner hardware-model constants for TPU generations.

ref: torchrec/distributed/planner/constants.py:14-27 (A100-class
assumptions: HBM 897GB/s / 32GB, NVLink 600GB/s, cross-node 12.5GB/s).
Replaced with TPU chip specs; all overridable through `Topology`.
"""

# Per-chip specs {gen: (hbm_cap_bytes, hbm_gbps, ici_gbps, dcn_gbps)}
TPU_SPECS = {
    # v5e: 16 GB HBM @ ~819 GB/s, ICI 4x ~186 GB/s aggregate per chip
    "v5e": (16 * 1024**3, 819.0, 186.0, 25.0),
    # v5p: 95 GB HBM @ ~2765 GB/s, ICI 6 links ~600 GB/s aggregate
    "v5p": (95 * 1024**3, 2765.0, 600.0, 25.0),
    # v4: 32 GB @ 1228 GB/s
    "v4": (32 * 1024**3, 1228.0, 400.0, 25.0),
}

DEFAULT_TPU_GEN = "v5e"

HOST_DDR_CAP = 512 * 1024**3
DDR_MEM_BW = 51.0  # GB/s

# lookup-kernel efficiency vs pure HBM roofline (measured: gather+scatter
# path reaches a fraction of peak; fused path profiled on v5e)
FUSED_KERNEL_BW_FRACTION = 0.5

# Measured v5e random-row (512B) fused-kernel cost model (r2,
# NOTES_r2.md "Scatter is stream-bound at scale"). The numbers live in
# ops/cost_model.py — the SAME source the runtime kernel chooser uses,
# so the planner and apply_fused_update's XLA/Pallas crossover never
# disagree. Splitting huge tables across devices shrinks each shard's
# stream term n-fold, which is why the planner prefers it.
from torchrec_tpu.ops.cost_model import (  # noqa: F401
    GATHER_NS_PER_ROW,
    SCATTER_NS_PER_ROW,
    STREAM_BW_BYTES_S,
    fused_lookup_s,
    fused_update_s,
)
DENSE_KERNEL_BW_FRACTION = 0.35
QUANT_KERNEL_BW_FRACTION = 0.6

# UVM-equivalent (host table + HBM row cache, ops/uvm_cache.py):
# CACHE_LOAD_FACTOR of the table stays in HBM; misses stream over host
# DRAM at a fraction of DDR bw (staging overhead), mirroring the
# reference's UVM-caching bandwidth model (ref constants.py:30-73 where
# UVM bw = DDR/10..DDR/2 depending on caching).
UVM_CACHE_LOAD_FACTOR = 0.2
UVM_CACHING_BW_FRACTION = 0.5  # x DDR_MEM_BW effective

BATCH_SIZE_DEFAULT = 512
POOLING_FACTOR_DEFAULT = 1.0
CACHING_RATIO_DEFAULT = 0.2

MIN_CW_DIM = 32  # ref: cw_sharding MIN_CW_DIM
STORAGE_RESERVE_PERCENT = 0.15

BIGINT = 2**62
