"""Proposal generation (ref: planner/proposers.py:17,86).

GreedyProposer: per table pick the best-perf remaining option, then emit
successive proposals flipping the currently worst table to its next-best
option. UniformProposer: one proposal per sharding type with every table
sharded the same way (when feasible for all)."""

from __future__ import annotations

from typing import Dict, List

from torchrec_tpu.parallel.types import ShardingType
from torchrec_tpu.planner.types import Proposer, ShardingOption


class GreedyProposer(Proposer):
    def __init__(self, max_proposals: int = 16):
        self._max = max_proposals

    def propose(
        self, options_by_table: Dict[str, List[ShardingOption]]
    ) -> List[List[ShardingOption]]:
        ranked = {
            name: sorted(opts, key=lambda o: o.total_perf)
            for name, opts in options_by_table.items()
        }
        cursor = {name: 0 for name in ranked}
        proposals: List[List[ShardingOption]] = []
        for _ in range(self._max):
            proposals.append(
                [ranked[n][cursor[n]] for n in ranked]
            )
            # advance the table whose current choice is the worst perf
            movable = [
                n for n in ranked if cursor[n] + 1 < len(ranked[n])
            ]
            if not movable:
                break
            worst = max(
                movable, key=lambda n: ranked[n][cursor[n]].total_perf
            )
            cursor[worst] += 1
        return proposals


class UniformProposer(Proposer):
    def propose(
        self, options_by_table: Dict[str, List[ShardingOption]]
    ) -> List[List[ShardingOption]]:
        proposals = []
        for st in ShardingType:
            picks = []
            for opts in options_by_table.values():
                match = [o for o in opts if o.sharding_type is st]
                if not match:
                    picks = []
                    break
                picks.append(min(match, key=lambda o: o.total_perf))
            if picks:
                proposals.append(picks)
        return proposals
