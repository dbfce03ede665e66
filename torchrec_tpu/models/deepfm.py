"""SimpleDeepFMNN model (ref: torchrec/models/deepfm.py:219-345)."""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchrec_tpu.modules.deepfm import DeepFM, FactorizationMachine
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import KeyedTensor, PaddedSparseBatch

Array = jax.Array


class _DenseArch(nn.Module):
    """dense in -> hidden -> embedding_dim (ref: models/deepfm.py:69-111)."""

    hidden_layer_size: int
    embedding_dim: int

    @nn.compact
    def __call__(self, features: Array) -> Array:
        x = jax.nn.relu(nn.Dense(self.hidden_layer_size)(features))
        return jax.nn.relu(nn.Dense(self.embedding_dim)(x))


class FMInteractionArch(nn.Module):
    """dense ++ deep(DeepFM) ++ FM scalar (ref: models/deepfm.py:114-185)."""

    sparse_feature_names: Tuple[str, ...]
    deep_fm_dimension: int

    @nn.compact
    def __call__(self, dense_features: Array, sparse_features: KeyedTensor) -> Array:
        """Call Args: dense_features [B, D]; sparse_features pooled
        KeyedTensor. Returns [B, D + 1] (deep ⊕ FM)."""
        if len(self.sparse_feature_names) == 0:
            return dense_features
        tensors: List[Array] = [dense_features]
        for name in self.sparse_feature_names:
            tensors.append(sparse_features[name])
        deep = DeepFM(
            deep_module=nn.Sequential(
                [nn.Dense(self.deep_fm_dimension), jax.nn.relu]
            )
        )(tensors)
        fm = FactorizationMachine()(tensors)
        return jnp.concatenate([dense_features, deep, fm], axis=1)


class _OverArch(nn.Module):
    """Linear -> sigmoid (ref: models/deepfm.py:187-216)."""

    @nn.compact
    def __call__(self, features: Array) -> Array:
        return jax.nn.sigmoid(nn.Dense(1)(features))


class SimpleDeepFMNN(nn.Module):
    """ref: models/deepfm.py:219. All tables must share embedding_dim."""

    num_dense_features: int
    embedding_bag_collection: EmbeddingBagCollection
    hidden_layer_size: int
    deep_fm_dimension: int

    def setup(self) -> None:
        tables = self.embedding_bag_collection.tables
        assert len(tables) > 0, "At least one embedding bag is required"
        dims = {cfg.embedding_dim for cfg in tables}
        if len(dims) != 1:
            raise ValueError("All EmbeddingBagConfigs must have the same dimension")
        embedding_dim = tables[0].embedding_dim
        feature_names = [f for cfg in tables for f in cfg.feature_names]
        self.sparse_arch = self.embedding_bag_collection
        self.dense_arch = _DenseArch(self.hidden_layer_size, embedding_dim)
        self.inter_arch = FMInteractionArch(
            tuple(feature_names), self.deep_fm_dimension
        )
        self.over_arch = _OverArch()

    def __call__(
        self, dense_features: Array, sparse_features: PaddedSparseBatch
    ) -> Array:
        """Call Args: dense_features [B, d_in]; sparse_features padded
        [F, B, L] batch. Returns logits [B, 1]."""
        embedded_dense = self.dense_arch(dense_features)
        embedded_sparse = self.sparse_arch(sparse_features)
        concatenated_dense = self.inter_arch(embedded_dense, embedded_sparse)
        return self.over_arch(concatenated_dense)
