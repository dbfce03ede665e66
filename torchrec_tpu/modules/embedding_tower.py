"""Embedding towers: an embedding module co-located with its interaction
module (ref: torchrec/modules/embedding_tower.py:39,87). The distributed
layer may place a whole tower on one device/host
(ref: torchrec/distributed/embedding_tower_sharding.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax

from torchrec_tpu.sparse import PaddedSparseBatch


class EmbeddingTower(nn.Module):
    """embedding module + interaction module (ref: embedding_tower.py:39).

    Contract: the interaction module takes the pooled values array
    [B, sum(table dims x features)] in declaration order — the same input
    the sharded tower feeds it on its owning device
    (parallel/tower_sharding.py), so authored and sharded paths agree."""

    embedding_module: nn.Module
    interaction_module: nn.Module

    def __call__(self, features: PaddedSparseBatch) -> jax.Array:
        embeddings = self.embedding_module(features)
        values = getattr(embeddings, "values", embeddings)
        return self.interaction_module(values)


class EmbeddingTowerCollection(nn.Module):
    """Pack of towers; outputs concatenated along the feature dim
    (ref: embedding_tower.py:87)."""

    towers: Tuple[EmbeddingTower, ...]

    @nn.compact
    def __call__(self, features: PaddedSparseBatch) -> jax.Array:
        import jax.numpy as jnp

        outs = [tower(features) for tower in self.towers]
        return jnp.concatenate(outs, axis=1)
