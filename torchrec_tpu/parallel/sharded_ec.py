"""ShardedEmbeddingCollection — sharded unpooled embeddings.

ref: torchrec/distributed/embedding.py:195-539 (ShardedEmbeddingCollection
returning Dict[str, JaggedTensor]). Here the output is a dict
feature -> [B, L, D] padded per-token array (batch-sharded), the layout
BERT4Rec consumes directly; `_construct_jagged_tensors` (ref :144-160)
becomes a trivial view because shapes are static."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import EmbeddingConfig
from torchrec_tpu.modules.embedding_modules import embedding_names_by_table
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel.embedding_sharding import (
    GroupedInputDistMixin,
    group_tables,
)
from torchrec_tpu.parallel.sequence_strategies import (
    create_sequence_sharding_strategy,
)
from torchrec_tpu.parallel.strategies import EmbeddingGroupState
from torchrec_tpu.parallel.types import ParameterSharding, ShardingEnv
from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array


class ShardedEmbeddingCollection(GroupedInputDistMixin):
    """Functional sharded EC (ref: embedding.py:195)."""

    def __init__(
        self,
        env: ShardingEnv,
        tables: Sequence[EmbeddingConfig],
        plan: Dict[str, ParameterSharding],
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
    ):
        dims = {t.embedding_dim for t in tables}
        if len(dims) > 1:
            raise ValueError("EmbeddingCollection tables must share one dim")
        self.env = env
        self.tables = tuple(tables)
        enames_per_table = embedding_names_by_table(self.tables)
        self.groups = group_tables(self.tables, enames_per_table, plan)
        self.strategies = [
            create_sequence_sharding_strategy(env, g, optim, optim_kwargs)
            for g in self.groups
        ]
        self.embedding_names: Tuple[str, ...] = tuple(
            n for names in enames_per_table for n in names
        )
        self.embedding_dim = self.tables[0].embedding_dim

    def init(self, key: jax.Array) -> Tuple[EmbeddingGroupState, ...]:
        return tuple(
            s.init_state(jax.random.fold_in(key, i))
            for i, s in enumerate(self.strategies)
        )

    def shard_from_dense(self, dense) -> Tuple[EmbeddingGroupState, ...]:
        return tuple(
            EmbeddingGroupState(
                weights=s.shard_from_dense(dense), opt=s.init_opt()
            )
            for s in self.strategies
        )

    def unshard_to_dense(self, states) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for s, st in zip(self.strategies, states):
            out.update(s.unshard_to_dense(st.weights))
        return out

    # _group_batch / input_dist come from GroupedInputDistMixin

    def forward(
        self, states, sb: PaddedSparseBatch, dist=None
    ) -> Dict[str, Array]:
        """-> {embedding_name: [B, L, D]} per-token rows (pad rows zero)."""
        out: Dict[str, Array] = {}
        for gi, (strat, group) in enumerate(zip(self.strategies, self.groups)):
            with jax.named_scope(
                f"## ec_fwd_{group.sharding_type.value}_g{gi} ##"
            ):
                d = dist[gi] if dist is not None else None
                if d is not None:
                    rows = strat.forward_from_dist(states[gi], d)
                else:
                    rows = strat.forward(
                        states[gi], self._group_batch(sb, gi)
                    )
            for j, ename in enumerate(group.embedding_names):
                out[ename] = rows[j]
        return out

    def update(
        self, states, sb: PaddedSparseBatch, d_tokens: Dict[str, Array],
        learning_rate, dist=None,
    ):
        new_states: List[EmbeddingGroupState] = []
        for gi, (strat, group) in enumerate(zip(self.strategies, self.groups)):
            d = jnp.stack(
                [d_tokens[ename] for ename in group.embedding_names], axis=0
            )  # [F_g, B, L, D]
            with jax.named_scope(
                f"## ec_update_{group.sharding_type.value}_g{gi} ##"
            ):
                dg = dist[gi] if dist is not None else None
                if dg is not None:
                    new_states.append(
                        strat.update_from_dist(
                            states[gi], dg, d, learning_rate
                        )
                    )
                else:
                    new_states.append(
                        strat.update(
                            states[gi], self._group_batch(sb, gi), d,
                            learning_rate,
                        )
                    )
        return tuple(new_states)

    # -- stacked views (used by DistributedModelParallel's injection) -------

    def forward_stacked(
        self, states, sb: PaddedSparseBatch, dist=None
    ) -> Array:
        """[F_all, B, L, D] in canonical embedding-name order."""
        per_name = self.forward(states, sb, dist=dist)
        return jnp.stack([per_name[n] for n in self.embedding_names], axis=0)

    def update_stacked(self, states, sb, d_stacked: Array, learning_rate,
                       dist=None):
        d_tokens = {
            n: d_stacked[i] for i, n in enumerate(self.embedding_names)
        }
        return self.update(states, sb, d_tokens, learning_rate, dist=dist)
