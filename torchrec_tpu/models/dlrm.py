"""DLRM (Deep Learning Recommendation Model, arxiv 1906.00091).

ref: torchrec/models/dlrm.py:36 (SparseArch), :116 (DenseArch),
:155-219 (InteractionArch), :222 (OverArch), :270 (DLRM) and the training
wrapper examples/dlrm/modules/dlrm_train.py.

TPU notes: the pairwise interaction is a single [B, F+1, D] x [B, D, F+1]
batched matmul (MXU-friendly), with the upper triangle gathered by static
indices. All dims are static; run the whole model under one jit.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.modules.mlp import MLP, Perceptron
from torchrec_tpu.sparse import KeyedTensor, PaddedSparseBatch

Array = jax.Array


class SparseArch(nn.Module):
    """EBC wrapper returning [B, F, D] (ref: dlrm.py:36)."""

    embedding_bag_collection: EmbeddingBagCollection

    def __call__(self, features: PaddedSparseBatch) -> Array:
        kt: KeyedTensor = self.embedding_bag_collection(features)
        B = kt.values.shape[0]
        F = len(kt.keys)
        return kt.values.reshape(B, F, -1)


class DenseArch(nn.Module):
    """MLP over dense input -> [B, D] (ref: dlrm.py:116)."""

    layer_sizes: Sequence[int]
    dtype: Any = None  # compute dtype; params stay fp32

    @nn.compact
    def __call__(self, features: Array) -> Array:
        return MLP(self.layer_sizes, dtype=self.dtype)(features)


class InteractionArch(nn.Module):
    """Pairwise dot interactions of (dense ⊕ sparse) features
    (ref: dlrm.py:155-219).

    Output: [B, D + F + C(F, 2)] = dense ++ upper-triangle (offset 1) of
    the (F+1)x(F+1) Gram matrix, in torch.triu_indices row-major order.
    """

    num_sparse_features: int
    dtype: Any = None  # compute dtype for the Gram matmul (fp32 accum)

    def __call__(self, dense_features: Array, sparse_features: Array) -> Array:
        """Call Args: dense_features [B, D]; sparse_features [B, F, D].
        Returns [B, D + F*(F+1)/2]."""
        F = self.num_sparse_features
        if F <= 0:
            return dense_features
        combined = jnp.concatenate(
            [dense_features[:, None, :], sparse_features], axis=1
        )  # [B, F+1, D]
        if self.dtype is not None:
            combined = combined.astype(self.dtype)
        gram = jnp.einsum(
            "bnd,bmd->bnm",
            combined,
            combined,
            preferred_element_type=jnp.float32,
        )
        iu, ju = np.triu_indices(F + 1, k=1)  # row-major, == torch.triu_indices
        interactions = gram[:, iu, ju]  # [B, F + C(F,2)]
        return jnp.concatenate([dense_features, interactions], axis=1)


class OverArch(nn.Module):
    """MLP + final linear head (ref: dlrm.py:222)."""

    layer_sizes: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, features: Array) -> Array:
        if len(self.layer_sizes) <= 1:
            raise ValueError("OverArch must have multiple layers.")
        x = MLP(self.layer_sizes[:-1], dtype=self.dtype)(features)
        return Perceptron(
            self.layer_sizes[-1], activation=lambda y: y, name="head",
            dtype=self.dtype,
        )(x)


class DLRM(nn.Module):
    """ref: dlrm.py:270-406. All tables must share embedding_dim; the
    dense arch's last layer must equal embedding_dim."""

    embedding_bag_collection: EmbeddingBagCollection
    dense_in_features: int
    dense_arch_layer_sizes: Tuple[int, ...]
    over_arch_layer_sizes: Tuple[int, ...]
    # compute dtype of the dense/interaction/over arches; bf16 here is the
    # TPU analogue of the reference's TF32 A100 matmuls (params/loss fp32)
    dense_dtype: Any = None

    def setup(self) -> None:
        tables = self.embedding_bag_collection.tables
        assert len(tables) > 0, "At least one embedding bag is required"
        dims = {cfg.embedding_dim for cfg in tables}
        if len(dims) != 1:
            raise ValueError("All EmbeddingBagConfigs must have the same dimension")
        embedding_dim = tables[0].embedding_dim
        if self.dense_arch_layer_sizes[-1] != embedding_dim:
            raise ValueError(
                f"embedding_dim {embedding_dim} must match dense arch output "
                f"{self.dense_arch_layer_sizes[-1]}"
            )
        num_features = sum(len(cfg.feature_names) for cfg in tables)
        self.sparse_arch = SparseArch(self.embedding_bag_collection)
        self.dense_arch = DenseArch(
            self.dense_arch_layer_sizes, dtype=self.dense_dtype
        )
        self.inter_arch = InteractionArch(
            num_features, dtype=self.dense_dtype
        )
        self.over_arch = OverArch(
            self.over_arch_layer_sizes, dtype=self.dense_dtype
        )
        self._num_features = num_features

    def __call__(
        self, dense_features: Array, sparse_features: PaddedSparseBatch
    ) -> Array:
        """Call Args: dense_features [B, d_in]; sparse_features the padded
        [F, B, L] batch. Returns logits [B, 1]."""
        embedded_dense = self.dense_arch(dense_features)
        embedded_sparse = self.sparse_arch(sparse_features)
        concatenated_dense = self.inter_arch(embedded_dense, embedded_sparse)
        logits = self.over_arch(concatenated_dense)
        # logits/loss always fp32 regardless of the compute dtype
        return logits.astype(jnp.float32)


class DLRMTrain(nn.Module):
    """DLRM + BCE-with-logits loss
    (ref: examples/dlrm/modules/dlrm_train.py:77-84)."""

    dlrm: DLRM

    def __call__(
        self,
        dense_features: Array,
        sparse_features: PaddedSparseBatch,
        labels: Array,
    ) -> Tuple[Array, Tuple[Array, Array, Array]]:
        """Call Args: dense_features [B, d_in]; sparse_features padded
        batch; labels [B]. Returns (loss, (loss, logits, labels))."""
        logits = self.dlrm(dense_features, sparse_features).squeeze(-1)
        labels = labels.astype(logits.dtype)
        # BCE with logits, mean reduction
        loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        return loss, (loss, logits, labels)
