"""ShardedEmbeddingBag — sharding for a single raw embedding bag.

ref: torchrec/distributed/embeddingbag.py:531-758 (`ShardedEmbeddingBag`
+ `EmbeddingBagSharder`): the reference shards a bare `nn.EmbeddingBag`
(one table, one implicit feature) through the same machinery as the
collection. Here it is a thin adapter over ShardedEmbeddingBagCollection
with a single-table config; inputs are (ids, lengths[, weights]) arrays
rather than a keyed batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    PoolingType,
)
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel.sharded_ebc import ShardedEmbeddingBagCollection
from torchrec_tpu.parallel.types import ParameterSharding, ShardingEnv
from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array

_FEATURE = "__bag__"


class ShardedEmbeddingBag:
    """One sharded embedding bag (ref: embeddingbag.py:531).

    forward(states, ids [B, L], lengths [B][, per_sample_weights [B, L]])
    -> pooled [B, D].
    """

    def __init__(
        self,
        env: ShardingEnv,
        num_embeddings: int,
        embedding_dim: int,
        sharding: ParameterSharding,
        pooling: PoolingType = PoolingType.SUM,
        is_weighted: bool = False,
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
        name: str = "embedding_bag",
    ):
        self.name = name
        self.is_weighted = is_weighted
        cfg = EmbeddingBagConfig(
            num_embeddings=num_embeddings,
            embedding_dim=embedding_dim,
            name=name,
            feature_names=[_FEATURE],
            pooling=pooling,
        )
        self._ebc = ShardedEmbeddingBagCollection(
            env, (cfg,), {name: sharding}, is_weighted=is_weighted,
            optim=optim, optim_kwargs=optim_kwargs,
        )

    def init(self, key: jax.Array):
        return self._ebc.init(key)

    def shard_from_dense(self, weights) -> Tuple:
        return self._ebc.shard_from_dense({self.name: weights})

    def unshard_to_dense(self, states):
        return self._ebc.unshard_to_dense(states)[self.name]

    def _batch(
        self, ids: Array, lengths: Array, per_sample_weights: Optional[Array]
    ) -> PaddedSparseBatch:
        return PaddedSparseBatch(
            ids=ids[None],
            lengths=lengths[None],
            keys=(_FEATURE,),
            weights=None
            if per_sample_weights is None
            else per_sample_weights[None],
        )

    def forward(
        self,
        states,
        ids: Array,
        lengths: Array,
        per_sample_weights: Optional[Array] = None,
    ) -> Array:
        kt = self._ebc.forward(
            states, self._batch(ids, lengths, per_sample_weights)
        )
        return kt.values  # [B, D]

    def update(
        self,
        states,
        ids: Array,
        lengths: Array,
        d_pooled: Array,
        learning_rate,
        per_sample_weights: Optional[Array] = None,
    ):
        return self._ebc.update(
            states,
            self._batch(ids, lengths, per_sample_weights),
            d_pooled,
            learning_rate,
        )
