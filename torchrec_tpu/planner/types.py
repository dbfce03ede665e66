"""Planner data model (ref: torchrec/distributed/planner/types.py:65-403).

Topology describes a TPU slice (chips, HBM, ICI/DCN bandwidths); a
ShardingOption is one candidate (table x sharding_type x kernel) with its
shards; pluggable stages (Enumerator/Proposer/Partitioner/Estimator/
PerfModel/StorageReservation/Stats) mirror the reference's interfaces."""

from __future__ import annotations

import abc
import dataclasses
from typing import Dict, List, Optional, Tuple

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.parallel.types import ComputeKernel, ShardingType
from torchrec_tpu.planner import constants


class PlannerError(Exception):
    """ref: planner/types.py PlannerError."""


@dataclasses.dataclass
class Storage:
    """HBM/DDR byte amounts (ref: planner/types.py Storage)."""

    hbm: int = 0
    ddr: int = 0

    def __add__(self, other: "Storage") -> "Storage":
        return Storage(self.hbm + other.hbm, self.ddr + other.ddr)

    def __sub__(self, other: "Storage") -> "Storage":
        return Storage(self.hbm - other.hbm, self.ddr - other.ddr)

    def fits_in(self, other: "Storage") -> bool:
        return self.hbm <= other.hbm and self.ddr <= other.ddr


@dataclasses.dataclass
class DeviceHardware:
    """One TPU chip (ref: planner/types.py DeviceHardware)."""

    rank: int
    storage: Storage
    perf: float = 0.0  # accumulated wall-time estimate (seconds)


class Topology:
    """A TPU slice (ref: planner/types.py:65-146, constants swapped for
    TPU generations)."""

    def __init__(
        self,
        world_size: int,
        tpu_gen: str = constants.DEFAULT_TPU_GEN,
        local_world_size: Optional[int] = None,
        hbm_cap: Optional[int] = None,
        ddr_cap: int = constants.HOST_DDR_CAP,
        hbm_mem_bw: Optional[float] = None,
        ici_bw: Optional[float] = None,
        dcn_bw: Optional[float] = None,
        batch_size: int = constants.BATCH_SIZE_DEFAULT,
    ):
        spec = constants.TPU_SPECS.get(tpu_gen)
        if spec is None:
            raise PlannerError(f"unknown tpu generation {tpu_gen}")
        cap, hbm_bw, ici, dcn = spec
        self.tpu_gen = tpu_gen
        self.world_size = world_size
        self.local_world_size = local_world_size or world_size
        self.hbm_cap = hbm_cap if hbm_cap is not None else cap
        self.ddr_cap = ddr_cap
        # bandwidths normalized to bytes/sec
        self.hbm_mem_bw = (hbm_mem_bw or hbm_bw) * 1024**3
        self.ici_bw = (ici_bw or ici) * 1024**3
        self.dcn_bw = (dcn_bw or dcn) * 1024**3
        self.batch_size = batch_size
        self.devices = [
            DeviceHardware(rank=r, storage=Storage(self.hbm_cap, ddr_cap))
            for r in range(world_size)
        ]

    @property
    def num_hosts(self) -> int:
        return self.world_size // self.local_world_size

    def __repr__(self) -> str:
        return (
            f"Topology({self.tpu_gen} x{self.world_size}, "
            f"hbm={self.hbm_cap/1024**3:.0f}GiB)"
        )


@dataclasses.dataclass
class Shard:
    """One physical shard (ref: planner/types.py Shard)."""

    size: Tuple[int, int]  # (rows, cols)
    offset: Tuple[int, int]
    rank: Optional[int] = None
    storage: Storage = dataclasses.field(default_factory=Storage)
    perf: float = 0.0


@dataclasses.dataclass
class ShardingOption:
    """A candidate plan entry (ref: planner/types.py ShardingOption)."""

    name: str
    table: EmbeddingBagConfig
    sharding_type: ShardingType
    compute_kernel: ComputeKernel
    shards: List[Shard]
    host: Optional[int] = None
    dependency: Optional[str] = None  # co-location group (tower)

    @property
    def total_perf(self) -> float:
        return sum(s.perf for s in self.shards)

    @property
    def total_storage(self) -> Storage:
        out = Storage()
        for s in self.shards:
            out = out + s.storage
        return out

    @property
    def num_shards(self) -> int:
        return len(self.shards)

    @property
    def is_uniform(self) -> bool:
        """One shard per device in rank order (RW/DP)."""
        return self.sharding_type in (
            ShardingType.ROW_WISE,
            ShardingType.DATA_PARALLEL,
        )


@dataclasses.dataclass
class ParameterConstraints:
    """Per-table planner constraints (ref: planner/types.py:246-258)."""

    sharding_types: Optional[List[ShardingType]] = None
    compute_kernels: Optional[List[ComputeKernel]] = None
    min_partition: Optional[int] = None
    pooling_factors: Optional[List[float]] = None
    caching_ratio: Optional[float] = None
    # co-location tag: tables sharing a dependency (e.g. one embedding
    # tower's tables) must land on the SAME rank; forces TABLE_WISE
    # (ref: planner/enumerators.py:130-135 tower dependency tagging)
    dependency: Optional[str] = None


# -- pluggable stage interfaces (ref: planner/types.py:268-403) -------------


class Enumerator(abc.ABC):
    @abc.abstractmethod
    def enumerate(
        self, tables, constraints
    ) -> List[ShardingOption]: ...


class Proposer(abc.ABC):
    @abc.abstractmethod
    def propose(
        self, options_by_table: Dict[str, List[ShardingOption]]
    ) -> List[List[ShardingOption]]: ...


class Partitioner(abc.ABC):
    @abc.abstractmethod
    def partition(
        self, proposal: List[ShardingOption], topology: Topology
    ) -> List[ShardingOption]: ...


class PerfModel(abc.ABC):
    @abc.abstractmethod
    def rate(self, plan: List[ShardingOption], topology: Topology) -> float: ...


class StorageReservation(abc.ABC):
    @abc.abstractmethod
    def reserve(self, topology: Topology, tables, constraints) -> Topology: ...
