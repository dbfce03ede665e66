"""ShardedEmbeddingBagCollection — the flagship sharded module.

ref: torchrec/distributed/embeddingbag.py:226-488. Groups tables by
sharding type into one strategy each (ref :246-254), routes each group's
features, and fuses the group outputs back into one KeyedTensor in the
unsharded module's canonical feature order (ref :369-402).

TPU re-design: forward is a pure function over (group states, padded
batch) running inside the caller's jit; there are no lazy input dists,
Awaitables, or streams — the collectives live inside each strategy's
shard_map and XLA overlaps them. The backward is an explicit `update`
taking the pooled-output cotangent (the fused-optimizer contract)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_modules import embedding_names_by_table
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel.embedding_sharding import (
    GroupedInputDistMixin,
    group_tables,
)
from torchrec_tpu.parallel.strategies import (
    EmbeddingGroupState,
    create_sharding_strategy,
)
from torchrec_tpu.parallel.types import ParameterSharding, ShardingEnv
from torchrec_tpu.sparse import KeyedTensor, PaddedSparseBatch

Array = jax.Array


class ShardedEmbeddingBagCollection(GroupedInputDistMixin):
    """Functional sharded EBC: holds static routing info + strategies,
    state lives in the caller's train state (a tuple of group states)."""

    def __init__(
        self,
        env: ShardingEnv,
        tables: Sequence[EmbeddingBagConfig],
        plan: Dict[str, ParameterSharding],
        is_weighted: bool = False,
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
    ):
        self.env = env
        self.tables = tuple(tables)
        self.is_weighted = is_weighted
        enames_per_table = embedding_names_by_table(self.tables)
        self.groups = group_tables(
            self.tables, enames_per_table, plan, is_weighted
        )
        self.strategies = [
            create_sharding_strategy(env, g, optim, optim_kwargs)
            for g in self.groups
        ]
        # canonical output order: tables in declaration order
        self.embedding_names: Tuple[str, ...] = tuple(
            n for names in enames_per_table for n in names
        )
        dim_by_name = {}
        for cfg, names in zip(self.tables, enames_per_table):
            for n in names:
                dim_by_name[n] = cfg.embedding_dim
        self.length_per_key: Tuple[int, ...] = tuple(
            dim_by_name[n] for n in self.embedding_names
        )
        self._out_offsets = np.concatenate(
            [[0], np.cumsum(self.length_per_key)]
        ).astype(np.int64)
        self._name_pos = {n: i for i, n in enumerate(self.embedding_names)}

    # -- state -------------------------------------------------------------

    def init(self, key: jax.Array) -> Tuple[EmbeddingGroupState, ...]:
        return tuple(
            s.init_state(jax.random.fold_in(key, i))
            for i, s in enumerate(self.strategies)
        )

    def shard_from_dense(
        self, dense: Dict[str, np.ndarray]
    ) -> Tuple[EmbeddingGroupState, ...]:
        """Build sharded states from unsharded per-table weights (golden
        parity / checkpoint import path; optimizer state starts fresh)."""
        return tuple(
            EmbeddingGroupState(
                weights=s.shard_from_dense(dense), opt=s.init_opt()
            )
            for s in self.strategies
        )

    def unshard_to_dense(
        self, states: Sequence[EmbeddingGroupState]
    ) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for s, st in zip(self.strategies, states):
            out.update(s.unshard_to_dense(st.weights))
        return out

    # -- compute -----------------------------------------------------------

    # _group_batch / input_dist come from GroupedInputDistMixin

    def forward(
        self,
        states: Sequence[EmbeddingGroupState],
        sb: PaddedSparseBatch,
        dist: Optional[Tuple[Optional[PaddedSparseBatch], ...]] = None,
    ) -> KeyedTensor:
        """-> KeyedTensor [B, sum(D)] (batch-sharded over the mesh)."""
        per_name: Dict[str, Array] = {}
        for gi, (strat, group) in enumerate(zip(self.strategies, self.groups)):
            # profiler label per comm/compute region, the analogue of the
            # reference's record_function markers (SURVEY §5.1;
            # comm_ops.py:489-921 "## alltoall_fwd_single ##" etc.)
            with jax.named_scope(
                f"## ebc_fwd_{group.sharding_type.value}_g{gi} ##"
            ):
                d = dist[gi] if dist is not None else None
                if d is not None:
                    out = strat.forward_from_dist(states[gi], d)
                else:
                    out = strat.forward(
                        states[gi], self._group_batch(sb, gi)
                    )
            for j, ename in enumerate(group.embedding_names):
                per_name[ename] = out[j]
        values = jnp.concatenate(
            [per_name[n] for n in self.embedding_names], axis=1
        )
        return KeyedTensor(
            values=values,
            keys=self.embedding_names,
            length_per_key=self.length_per_key,
        )

    def update(
        self,
        states: Sequence[EmbeddingGroupState],
        sb: PaddedSparseBatch,
        d_values: Array,
        learning_rate,
        dist: Optional[Tuple[Optional[PaddedSparseBatch], ...]] = None,
    ) -> Tuple[EmbeddingGroupState, ...]:
        """Apply fused optimizer step given the cotangent of the forward's
        KeyedTensor.values ([B, sum(D)], batch-sharded)."""
        new_states: List[EmbeddingGroupState] = []
        for gi, (strat, group) in enumerate(zip(self.strategies, self.groups)):
            slices = []
            for ename in group.embedding_names:
                pos = self._name_pos[ename]
                lo, hi = self._out_offsets[pos], self._out_offsets[pos + 1]
                slices.append(d_values[:, lo:hi])
            d_pooled = jnp.stack(slices, axis=0)  # [F_g, B, D_g]
            with jax.named_scope(
                f"## ebc_update_{group.sharding_type.value}_g{gi} ##"
            ):
                d = dist[gi] if dist is not None else None
                if d is not None:
                    new_states.append(
                        strat.update_from_dist(
                            states[gi], d, d_pooled, learning_rate
                        )
                    )
                else:
                    new_states.append(
                        strat.update(
                            states[gi],
                            self._group_batch(sb, gi),
                            d_pooled,
                            learning_rate,
                        )
                    )
        return tuple(new_states)
