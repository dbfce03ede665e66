"""Feature processors (ref: torchrec/modules/feature_processor.py:29 and
torchrec/distributed/grouped_position_weighted.py).

PositionWeightedModule attaches a learned per-position weight to each id
before pooling — on the padded [F, B, L] layout the fbgemm `offsets_range`
position computation is just a broadcasted iota.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchrec_tpu.sparse import PaddedSparseBatch


class FeatureProcessedEmbeddingBagCollection(nn.Module):
    """EBC with a learned feature processor applied before pooling (ref:
    torchrec fp_ebc pattern — GroupedPositionWeightedModule feeding a
    weighted EBC, grouped_position_weighted.py:25-77).

    Unsharded: plain composition, autodiff handles the processor grads.
    Under DistributedModelParallel the processor params stay in the dense
    (replicated) tree and receive EXACT gradients through the sharded
    pooled lookup: pooling is linear in the per-sample weights, so DMP
    chains `vjp(pooled, weights)` into `vjp(weights, processor params)`
    (see dmp.py train step).
    """

    embedding_bag_collection: "nn.Module"
    feature_processor: "nn.Module"

    @property
    def tables(self):
        return self.embedding_bag_collection.tables

    @property
    def is_weighted(self) -> bool:
        return True

    @nn.compact
    def __call__(self, features: PaddedSparseBatch):
        return self.embedding_bag_collection(self.feature_processor(features))


class PositionWeightedModule(nn.Module):
    """Learned position weights per feature (ref: feature_processor.py:29).

    max_feature_lengths: feature name -> max position count.
    """

    max_feature_lengths: Tuple[Tuple[str, int], ...]

    @nn.compact
    def __call__(self, features: PaddedSparseBatch) -> PaddedSparseBatch:
        max_lengths = dict(self.max_feature_lengths)
        F, B, L = features.ids.shape
        weights = []
        for f, key in enumerate(features.keys):
            max_len = max_lengths.get(key, L)
            pw = self.param(
                f"position_weight_{key}",
                nn.initializers.ones,
                (max(max_len, L),),
            )
            pos = jnp.minimum(jnp.arange(L), max_len - 1)
            weights.append(jnp.broadcast_to(pw[pos][None, :], (B, L)))
        w = jnp.stack(weights, axis=0)  # [F, B, L]
        mask = features.mask().astype(w.dtype)
        return features.replace(weights=w * mask)
