"""Distributed core types: the sharding vocabulary.

ref: torchrec/distributed/types.py — `ShardingType` (:64), `ParameterSharding`
(:288), `ShardingEnv` (:328), `ShardingPlan` (:515).

TPU re-design notes:

* `ShardingEnv` wraps a `jax.sharding.Mesh` instead of a ProcessGroup.
  The mesh has a flat "dev" axis (every chip does both data-parallel batch
  work and model-parallel table work, like every rank in the reference) and
  optionally a ("host", "dev") factorization for hierarchical strategies
  (TWRW/TWCW), mirroring intra_and_cross_node_pg (ref: comm.py:102-150).

* There is NO Awaitable/LazyAwaitable system (ref: types.py:108-285):
  inside one jitted step XLA's async scheduler overlaps collectives with
  compute automatically; the design replaces "wait on handle" with "let
  the compiler schedule it".

* Placements are mesh coordinates, not "rank:r/cuda:d" strings.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


class ShardingType(enum.Enum):
    """ref: distributed/types.py:64-82."""

    DATA_PARALLEL = "data_parallel"
    TABLE_WISE = "table_wise"
    COLUMN_WISE = "column_wise"
    ROW_WISE = "row_wise"
    TABLE_ROW_WISE = "table_row_wise"
    TABLE_COLUMN_WISE = "table_column_wise"


class ComputeKernel(enum.Enum):
    """ref: distributed/embedding_types.py:44-54. On TPU there is one fused
    lookup path; DENSE keeps plain-autodiff tables (optimizer outside),
    QUANT is the int8/int4 inference path, and FUSED_UVM_CACHING maps the
    reference's UVM kernels to a host-resident table with a software-
    managed HBM row cache (ops/uvm_cache.py)."""

    DENSE = "dense"
    FUSED = "fused"
    QUANT = "quant"
    FUSED_UVM_CACHING = "fused_uvm_caching"


@dataclasses.dataclass
class ParameterSharding:
    """Per-table sharding decision (ref: types.py:288-325).

    ranks: devices participating (flat mesh positions). For TABLE_WISE a
    single entry; ROW_WISE/COLUMN_WISE default to all devices.
    """

    sharding_type: ShardingType
    compute_kernel: ComputeKernel = ComputeKernel.FUSED
    ranks: Optional[List[int]] = None
    # host index for TABLE_ROW_WISE / TABLE_COLUMN_WISE placements
    host: Optional[int] = None


@dataclasses.dataclass
class ShardingPlan:
    """module path -> {table name -> ParameterSharding}
    (ref: types.py:515-540)."""

    plan: Dict[str, Dict[str, ParameterSharding]]

    def get_plan_for_module(
        self, module_path: str
    ) -> Optional[Dict[str, ParameterSharding]]:
        return self.plan.get(module_path)


class ShardingEnv:
    """Mesh wrapper (ref: types.py:328-363).

    axis "dev": the flat device axis every collective rides (ICI).
    local_size: devices per host, for hierarchical strategies.
    """

    AXIS = "dev"
    HOST_AXIS = "host"

    def __init__(self, mesh: Mesh, local_size: Optional[int] = None):
        self.mesh = mesh
        self.world_size = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.local_size = local_size or self.world_size
        if self.world_size % self.local_size:
            raise ValueError(
                f"world_size {self.world_size} not divisible by "
                f"local_size {self.local_size}"
            )
        self._check_host_contiguous(list(mesh.devices.flat), self.local_size)

    @staticmethod
    def _check_host_contiguous(devices, local_size: int) -> None:
        """Hierarchical strategies assume flat-mesh device i lives on
        host i // local_size (axis_index_groups are built from that
        layout, hierarchical_strategies.py:62-67). A mesh whose devices
        interleave processes silently mis-routes the intra/cross-host
        collectives — reject it here. (All-one-process meshes — CPU
        test meshes, single-host TPU — pass trivially; the reference's
        equivalent is the env-driven rank⇄host mapping contract of
        comm.py:31-99.)"""
        pidx = [getattr(d, "process_index", 0) for d in devices]
        seen = set()
        prev = None
        for i, p in enumerate(pidx):
            if p != prev:
                if p in seen:
                    raise ValueError(
                        "mesh devices are not host-contiguous: process "
                        f"{p} reappears at flat position {i} (order: "
                        f"{pidx}). Sort devices by (process_index, id) — "
                        "ShardingEnv.from_distributed() does this."
                    )
                seen.add(p)
                prev = p
        if len(seen) > 1:
            # every logical host block must sit inside one process
            for h in range(len(devices) // local_size):
                block = set(pidx[h * local_size:(h + 1) * local_size])
                if len(block) > 1:
                    raise ValueError(
                        f"logical host {h} (local_size={local_size}) "
                        f"spans processes {sorted(block)}; hierarchical "
                        "strategies would route DCN traffic as ICI. Use "
                        "local_size=jax.local_device_count()."
                    )

    @staticmethod
    def from_devices(
        devices: Optional[List[jax.Device]] = None,
        local_size: Optional[int] = None,
    ) -> "ShardingEnv":
        devices = devices if devices is not None else jax.devices()
        mesh = Mesh(np.asarray(devices), (ShardingEnv.AXIS,))
        return ShardingEnv(mesh, local_size)

    @staticmethod
    def from_distributed(
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None,
    ) -> "ShardingEnv":
        """Multi-host env: one controller process per host (ref: the
        torchrun/env-driven process-group init, comm.py:31-99 +
        examples/dlrm/README.MD:23-33). Calls
        ``jax.distributed.initialize()`` — args default to env /
        TPU-metadata discovery (JAX's analogue of RANK/WORLD_SIZE env
        vars) — then builds a host-contiguous flat mesh over ALL
        processes' devices with ``local_size = jax.local_device_count()``
        so hierarchical strategies route intra-host traffic over ICI and
        cross-host over DCN."""
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
        devices = sorted(
            jax.devices(), key=lambda d: (d.process_index, d.id)
        )
        return ShardingEnv.from_devices(
            devices, local_size=jax.local_device_count()
        )

    @staticmethod
    def from_local(world_size: int) -> "ShardingEnv":
        """Single-host inference env over the first `world_size` local
        devices — no training collectives assumed (ref: the
        process-group-free ShardingEnv.from_local used by quantized
        inference, types.py:351-363 + quant_embeddingbag.py:62)."""
        devices = jax.devices()[:world_size]
        if len(devices) < world_size:
            raise ValueError(
                f"from_local({world_size}): only {len(devices)} devices"
            )
        return ShardingEnv.from_devices(devices, local_size=world_size)

    @property
    def num_hosts(self) -> int:
        return self.world_size // self.local_size

    def __repr__(self) -> str:
        return f"ShardingEnv(world={self.world_size}, local={self.local_size})"
