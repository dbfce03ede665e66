"""Perf and storage estimation per shard
(ref: planner/shard_estimators.py:35-782).

Wall-time model per shard = input-dist + compute + output-dist, all as
bytes / bandwidth closed forms, with the collective patterns of the TPU
strategies (parallel/strategies.py):

  input-dist:  all_gather of int32 ids over ICI (all sharded types)
  compute:     touched bytes / (HBM bw x kernel efficiency)
  output-dist: RW -> reduce_scatter of [F,B,D]; TW/CW -> all_to_all of
               pooled rows; DP -> none

Storage per shard = tensor bytes + input/output activation buffers +
optimizer state (rowwise-adagrad: rows x 4B; DP gets a dense gradient's
worth extra, ref shard_estimators.py:376-782 uses 2x for DP only).
"""

from __future__ import annotations

from typing import Dict, Optional

from torchrec_tpu.parallel.types import ComputeKernel, ShardingType
from torchrec_tpu.planner import constants
from torchrec_tpu.planner.types import (
    ParameterConstraints,
    ShardingOption,
    Storage,
    Topology,
)

_DTYPE_BYTES = 4  # fp32 training


def _kernel_bw(topology: Topology, kernel: ComputeKernel) -> float:
    if kernel is ComputeKernel.FUSED_UVM_CACHING:
        # hit fraction at HBM speed, miss fraction over host DRAM
        lf = constants.UVM_CACHE_LOAD_FACTOR
        hbm = topology.hbm_mem_bw * constants.FUSED_KERNEL_BW_FRACTION
        ddr = constants.DDR_MEM_BW * constants.UVM_CACHING_BW_FRACTION
        return lf * hbm + (1.0 - lf) * ddr
    frac = {
        ComputeKernel.FUSED: constants.FUSED_KERNEL_BW_FRACTION,
        ComputeKernel.DENSE: constants.DENSE_KERNEL_BW_FRACTION,
        ComputeKernel.QUANT: constants.QUANT_KERNEL_BW_FRACTION,
    }[kernel]
    return topology.hbm_mem_bw * frac


class EmbeddingPerfEstimator:
    """ref: shard_estimators.py:35-373."""

    def __init__(
        self,
        topology: Topology,
        constraints: Optional[Dict[str, ParameterConstraints]] = None,
    ):
        self._topology = topology
        self._constraints = constraints or {}

    def estimate(self, option: ShardingOption) -> None:
        t = self._topology
        n = t.world_size
        B = t.batch_size  # per-device batch
        c = self._constraints.get(option.name)
        pooling = (
            sum(c.pooling_factors) / len(c.pooling_factors)
            if c and c.pooling_factors
            else constants.POOLING_FACTOR_DEFAULT
        )
        D = option.table.embedding_dim
        F = max(len(option.table.feature_names), 1)
        ids_bytes = F * B * n * pooling * 4  # gathered global ids, int32
        pooled_bytes = F * B * D * _DTYPE_BYTES
        bw_comm = t.ici_bw
        kernel_bw = _kernel_bw(t, option.compute_kernel)

        def compute_time(rows_touched, shard_bytes, cols):
            """Lookup + update time for `rows_touched` random row
            accesses against a shard with `shard_bytes` resident.

            FUSED kernels follow the measured v5e model (NOTES_r2.md):
            gather is ~8.6 ns/row regardless of table size; the update
            scatter is max(26 ns/row, streaming the whole shard at
            630 GB/s) — so splitting a huge table across devices shrinks
            each shard's stream term. Other kernels (DENSE autodiff,
            QUANT, UVM host path) stay on the bandwidth model."""
            if option.compute_kernel is ComputeKernel.FUSED:
                return constants.fused_lookup_s(
                    rows_touched
                ) + constants.fused_update_s(rows_touched, shard_bytes)
            # fwd + bwd + update passes over the touched bytes
            return 3.0 * rows_touched * cols * _DTYPE_BYTES / kernel_bw

        for shard in option.shards:
            rows, cols = shard.size
            shard_bytes = rows * cols * _DTYPE_BYTES
            if option.sharding_type is ShardingType.DATA_PARALLEL:
                input_dist = 0.0
                # local lookup of local batch
                compute = compute_time(F * B * pooling, shard_bytes, cols)
                # gradient sync of sparse rows (all_gather of row grads)
                output_dist = (F * B * pooling * cols * _DTYPE_BYTES * n) / bw_comm
            elif option.sharding_type is ShardingType.ROW_WISE:
                input_dist = ids_bytes / bw_comm
                # this shard touches ~1/n of the gathered tokens
                compute = compute_time(F * B * pooling, shard_bytes, cols)
                # reduce_scatter of partial pooled sums
                output_dist = pooled_bytes / bw_comm
            elif option.sharding_type is ShardingType.TABLE_WISE:
                input_dist = ids_bytes / bw_comm
                # the single owner looks up the WHOLE global batch
                compute = compute_time(
                    F * B * n * pooling, shard_bytes, cols
                )
                output_dist = (pooled_bytes * n) / bw_comm
            elif option.sharding_type is ShardingType.COLUMN_WISE:
                input_dist = ids_bytes / bw_comm
                compute = compute_time(
                    F * B * n * pooling, shard_bytes, cols
                )
                output_dist = pooled_bytes / bw_comm
            elif option.sharding_type is ShardingType.TABLE_ROW_WISE:
                # host-pinned rows: intra-host reduce-scatter rides ICI,
                # the cross-host batch routing rides DCN
                # (ref twrw_sharding.py:441-484; bandwidths §2.5)
                Lc = t.local_world_size
                input_dist = ids_bytes / bw_comm
                compute = compute_time(
                    F * (B * n / Lc) * pooling, shard_bytes, cols
                )
                output_dist = (
                    pooled_bytes / bw_comm  # intra reduce-scatter
                    + pooled_bytes * t.num_hosts / t.dcn_bw  # cross a2a
                )
            elif option.sharding_type is ShardingType.TABLE_COLUMN_WISE:
                Lc = t.local_world_size
                input_dist = ids_bytes / bw_comm
                compute = compute_time(
                    F * B * n * pooling, shard_bytes, cols
                )
                output_dist = (
                    pooled_bytes / bw_comm
                    + pooled_bytes * t.num_hosts / t.dcn_bw
                )
            else:
                raise NotImplementedError(option.sharding_type)
            # fwd + bwd symmetric collective traffic; compute_time already
            # covers the fwd lookup + bwd update passes
            shard.perf = 2.0 * (input_dist + output_dist) + compute


class EmbeddingStorageEstimator:
    """ref: shard_estimators.py:376-782."""

    def __init__(
        self,
        topology: Topology,
        constraints: Optional[Dict[str, ParameterConstraints]] = None,
    ):
        self._topology = topology
        self._constraints = constraints or {}

    def estimate(self, option: ShardingOption) -> None:
        t = self._topology
        B = t.batch_size
        F = max(len(option.table.feature_names), 1)
        for shard in option.shards:
            rows, cols = shard.size
            tensor = rows * cols * _DTYPE_BYTES
            # rowwise-adagrad state + update workspace
            optimizer = rows * _DTYPE_BYTES
            io_buffers = F * B * (cols + 1) * _DTYPE_BYTES * 4
            if option.sharding_type is ShardingType.DATA_PARALLEL:
                # replicated grads sync buffer (ref: 2x for DP only)
                optimizer += tensor
            if option.compute_kernel is ComputeKernel.FUSED_UVM_CACHING:
                # table + optimizer live on the host; HBM holds the row
                # cache + io buffers (ref shard_estimators.py: UVM-caching
                # HBM = ddr x caching_ratio)
                cache = int(tensor * constants.UVM_CACHE_LOAD_FACTOR)
                shard.storage = Storage(
                    hbm=int(cache + io_buffers),
                    ddr=int(tensor + optimizer),
                )
            else:
                shard.storage = Storage(
                    hbm=int(tensor + optimizer + io_buffers), ddr=0
                )
