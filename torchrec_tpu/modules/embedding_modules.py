"""Unsharded EmbeddingBagCollection / EmbeddingCollection as flax modules.

ref: torchrec/modules/embedding_modules.py:67 (EBC), :204 (EC).

These are the "author as if single-device" modules: a DLRM/BERT4Rec model
embeds one of these, trains on one chip with plain autodiff, and the
distributed layer (parallel/) later swaps the table params for sharded
state — the same contract as the reference's DistributedModelParallel
module swap (ref: torchrec/distributed/model_parallel.py:310-341).

Input is the padded [F, B, L] `PaddedSparseBatch` (the jit twin of a
KeyedJaggedTensor); a KJT is accepted and converted eagerly for parity.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    EmbeddingConfig,
    PoolingType,
    pooling_type_to_mode,
)
from torchrec_tpu.ops.embedding import PoolingMode, batched_embedding_lookup
from torchrec_tpu.sparse import (
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
    PaddedSparseBatch,
)

Array = jax.Array


def embedding_names_by_table(
    tables: Sequence[Union[EmbeddingBagConfig, EmbeddingConfig]]
) -> List[List[str]]:
    """Output names per table; a feature shared by several tables is
    disambiguated as `feature@table` (ref: embedding_modules.py:49-64)."""
    shared: Dict[str, int] = {}
    for cfg in tables:
        for f in cfg.feature_names:
            shared[f] = shared.get(f, 0) + 1
    out: List[List[str]] = []
    for cfg in tables:
        out.append(
            [
                f"{f}@{cfg.name}" if shared[f] > 1 else f
                for f in cfg.feature_names
            ]
        )
    return out


def _as_padded(features, max_length: int) -> PaddedSparseBatch:
    if isinstance(features, PaddedSparseBatch):
        return features
    if isinstance(features, KeyedJaggedTensor):
        return features.to_padded(max_length)
    raise TypeError(f"unsupported sparse input: {type(features)}")


class EmbeddingBagCollection(nn.Module):
    """KJT [F x B x L] -> KeyedTensor [B, sum(D_f)] of pooled embeddings.

    tables: table configs; each owns >=1 feature names.
    is_weighted: consume per-sample weights (id_score_list features).
    max_feature_length: L budget used when a jagged KJT is passed directly.
    """

    tables: Tuple[EmbeddingBagConfig, ...]
    is_weighted: bool = False
    max_feature_length: int = 1

    def setup(self) -> None:
        seen = set()
        for cfg in self.tables:
            if cfg.name in seen:
                raise ValueError(f"duplicate table name {cfg.name}")
            seen.add(cfg.name)
        self._emb_names = embedding_names_by_table(self.tables)
        self._weights = [
            self.param(
                cfg.name,
                lambda key, shape, lo, hi: jax.random.uniform(
                    key, shape, minval=lo, maxval=hi
                ),
                (cfg.num_embeddings, cfg.embedding_dim),
                cfg.get_weight_init_min(),
                cfg.get_weight_init_max(),
            )
            for cfg in self.tables
        ]

    @property
    def embedding_names(self) -> List[str]:
        return [n for names in self._emb_names for n in names]

    def __call__(
        self, features: Union[PaddedSparseBatch, KeyedJaggedTensor]
    ) -> KeyedTensor:
        sb = _as_padded(features, self.max_feature_length)
        key_index = {k: i for i, k in enumerate(sb.keys)}
        outputs: List[Array] = []
        names: List[str] = []
        for cfg, w, enames in zip(self.tables, self._weights, self._emb_names):
            fidx = [key_index[f] for f in cfg.feature_names]
            ids = sb.ids[jnp.asarray(fidx)]
            lengths = sb.lengths[jnp.asarray(fidx)]
            psw = None
            if self.is_weighted and sb.weights is not None:
                psw = sb.weights[jnp.asarray(fidx)]
            pooled = batched_embedding_lookup(
                w,
                ids,
                lengths,
                jnp.zeros((len(fidx),), jnp.int32),
                pooling=pooling_type_to_mode(cfg.pooling),
                per_sample_weights=psw,
            )  # [f, B, D]
            for j, name in enumerate(enames):
                outputs.append(pooled[j])
                names.append(name)
        return KeyedTensor.from_tensor_list(names, outputs)


class EmbeddingCollection(nn.Module):
    """KJT -> per-token (unpooled) embeddings for sequence models.

    ref: embedding_modules.py:204; enforces a uniform embedding_dim
    (ref :277-280). Returns a dict feature -> [B, L, D] padded array by
    default (the TPU-friendly layout BERT4Rec consumes); `as_jagged=True`
    returns Dict[str, JaggedTensor] for API parity.
    """

    tables: Tuple[EmbeddingConfig, ...]
    max_feature_length: int = 1
    need_indices: bool = False

    def setup(self) -> None:
        dims = {cfg.embedding_dim for cfg in self.tables}
        if len(dims) > 1:
            raise ValueError(
                f"All tables in an EmbeddingCollection must share one "
                f"embedding_dim, got {sorted(dims)}"
            )
        self._emb_names = embedding_names_by_table(self.tables)
        self._weights = [
            self.param(
                cfg.name,
                lambda key, shape, lo, hi: jax.random.uniform(
                    key, shape, minval=lo, maxval=hi
                ),
                (cfg.num_embeddings, cfg.embedding_dim),
                cfg.get_weight_init_min(),
                cfg.get_weight_init_max(),
            )
            for cfg in self.tables
        ]

    @property
    def embedding_dim(self) -> int:
        return self.tables[0].embedding_dim

    @property
    def embedding_names(self) -> List[str]:
        return [n for names in self._emb_names for n in names]

    def __call__(
        self,
        features: Union[PaddedSparseBatch, KeyedJaggedTensor],
        as_jagged: bool = False,
    ) -> Dict[str, Union[Array, JaggedTensor]]:
        """Call Args: features sparse batch; as_jagged selects JaggedTensor
        outputs (the reference's Dict[str, JaggedTensor] contract) over
        padded [B, L, D] arrays."""
        sb = _as_padded(features, self.max_feature_length)
        key_index = {k: i for i, k in enumerate(sb.keys)}
        out: Dict[str, Union[Array, JaggedTensor]] = {}
        for cfg, w, enames in zip(self.tables, self._weights, self._emb_names):
            fidx = [key_index[f] for f in cfg.feature_names]
            ids = sb.ids[jnp.asarray(fidx)]
            lengths = sb.lengths[jnp.asarray(fidx)]
            rows = batched_embedding_lookup(
                w,
                ids,
                lengths,
                jnp.zeros((len(fidx),), jnp.int32),
                pooling=PoolingMode.NONE,
            )  # [f, B, L, D]
            for j, name in enumerate(enames):
                if as_jagged:
                    out[name] = JaggedTensor.from_dense_lengths(
                        rows[j], lengths[j]
                    )
                else:
                    out[name] = rows[j]
        return out
