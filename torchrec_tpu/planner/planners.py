"""EmbeddingShardingPlanner (ref: planner/planners.py:126-309).

plan() = StorageReservation -> Enumerator (+ estimators) ->
{Proposer -> Partitioner -> PerfModel rate}* -> best plan -> Stats.

Output is the framework's ShardingPlan: {module_path: {table:
ParameterSharding}} with mesh ranks — consumable directly by
DistributedModelParallel. There is no collective_plan()/broadcast stage:
planning is deterministic and every host computes the identical plan
(the reference needs rank-0 + broadcast only because its planner is
stateful per process group, ref planners.py:175-191)."""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.parallel.types import (
    ParameterSharding,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.planner import constants
from torchrec_tpu.planner.enumerators import EmbeddingEnumerator
from torchrec_tpu.planner.estimators import (
    EmbeddingPerfEstimator,
    EmbeddingStorageEstimator,
)
from torchrec_tpu.planner.partitioners import GreedyPerfPartitioner
from torchrec_tpu.planner.proposers import GreedyProposer, UniformProposer
from torchrec_tpu.planner.stats import EmbeddingStats
from torchrec_tpu.planner.types import (
    ParameterConstraints,
    PlannerError,
    ShardingOption,
    Storage,
    Topology,
)


class HeuristicalStorageReservation:
    """Reserve a fraction of HBM for dense params + activations before
    planning (ref: planner/storage_reservations.py:43-160)."""

    def __init__(self, percentage: float = constants.STORAGE_RESERVE_PERCENT):
        self._pct = percentage

    def reserve(self, topology: Topology, tables, constraints) -> Topology:
        reserved = Topology(
            world_size=topology.world_size,
            tpu_gen=topology.tpu_gen,
            local_world_size=topology.local_world_size,
            hbm_cap=int(topology.hbm_cap * (1 - self._pct)),
            ddr_cap=topology.ddr_cap,
            batch_size=topology.batch_size,
        )
        return reserved


class NoopPerfModel:
    """Plan rating = max per-device accumulated perf (critical path)
    (ref: planner/perf_models.py:13-24)."""

    def rate(self, plan: List[ShardingOption], topology: Topology) -> float:
        per_dev = [0.0] * topology.world_size
        for opt in plan:
            for s in opt.shards:
                if s.rank is not None:
                    per_dev[s.rank] += s.perf
        return max(per_dev) if per_dev else 0.0


class EmbeddingShardingPlanner:
    """ref: planners.py:126."""

    def __init__(
        self,
        topology: Topology,
        constraints: Optional[Dict[str, ParameterConstraints]] = None,
        enumerator=None,
        proposers=None,
        partitioner=None,
        perf_model=None,
        storage_reservation=None,
        stats=None,
    ):
        self._topology = topology
        self._constraints = constraints or {}
        self._enumerator = enumerator or EmbeddingEnumerator(topology)
        self._proposers = proposers or [GreedyProposer(), UniformProposer()]
        self._partitioner = partitioner or GreedyPerfPartitioner()
        self._perf_model = perf_model or NoopPerfModel()
        self._storage_reservation = (
            storage_reservation or HeuristicalStorageReservation()
        )
        self._stats = stats or EmbeddingStats()
        self._perf_estimator = EmbeddingPerfEstimator(
            topology, self._constraints
        )
        self._storage_estimator = EmbeddingStorageEstimator(
            topology, self._constraints
        )
        self.last_stats: Optional[str] = None

    def plan(
        self,
        tables: Sequence[EmbeddingBagConfig],
        module_path: str = "",
    ) -> ShardingPlan:
        topology = self._storage_reservation.reserve(
            self._topology, tables, self._constraints
        )
        options = self._enumerator.enumerate(tables, self._constraints)
        if not options:
            raise PlannerError("no sharding options enumerated")
        for opt in options:
            self._perf_estimator.estimate(opt)
            self._storage_estimator.estimate(opt)

        by_table: Dict[str, List[ShardingOption]] = {}
        for opt in options:
            by_table.setdefault(opt.name, []).append(opt)

        best_plan = None
        best_rating = math.inf
        last_error: Optional[Exception] = None
        for proposer in self._proposers:
            for proposal in proposer.propose(by_table):
                try:
                    partitioned = self._partitioner.partition(
                        proposal, topology
                    )
                except PlannerError as e:
                    last_error = e
                    continue
                rating = self._perf_model.rate(partitioned, topology)
                if rating < best_rating:
                    best_rating = rating
                    best_plan = partitioned
        if best_plan is None:
            raise PlannerError(
                f"unable to find a feasible sharding plan: {last_error}"
            )
        self.last_stats = self._stats.log(best_plan, topology, best_rating)
        return self._to_sharding_plan(best_plan, module_path)

    def collective_plan(
        self,
        tables,
        module_path: str = "",
    ) -> ShardingPlan:
        """ref: planners.py:175-191 — the reference plans on rank 0 and
        broadcasts. Under SPMD there is one host program and planning is
        deterministic, so collective_plan IS plan; the alias keeps the
        reference call sites valid."""
        return self.plan(tables, module_path=module_path)

    def _to_sharding_plan(
        self, plan: List[ShardingOption], module_path: str
    ) -> ShardingPlan:
        entries: Dict[str, ParameterSharding] = {}
        for opt in plan:
            ranks = [s.rank for s in opt.shards if s.rank is not None]
            entries[opt.name] = ParameterSharding(
                sharding_type=opt.sharding_type,
                compute_kernel=opt.compute_kernel,
                ranks=ranks,
                host=opt.host,
            )
        return ShardingPlan({module_path: entries})
