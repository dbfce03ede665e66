"""Quantized EmbeddingBagCollection for inference.

ref: torchrec/quant/embedding_modules.py:91 (eager-quantized EBC built by
`from_float`, lookup via int-N TBE) and quantize_state_dict (:49).

The quantized EBC is a functional module: `from_float` converts trained
fp32 table weights into `QuantizedTable`s; `forward` mirrors the fp32
EBC's KeyedTensor contract. No training support (inference only)."""

from __future__ import annotations

from typing import Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import (
    DATA_TYPE_NUM_BITS,
    DataType,
    EmbeddingBagConfig,
    pooling_type_to_mode,
)
from torchrec_tpu.modules.embedding_modules import embedding_names_by_table
from torchrec_tpu.ops.quant import (
    QuantizedTable,
    quant_embedding_bag_lookup,
    quantize_rowwise,
)
from torchrec_tpu.sparse import KeyedJaggedTensor, KeyedTensor, PaddedSparseBatch


class QuantEmbeddingBagCollection:
    """ref: quant/embedding_modules.py:91."""

    def __init__(
        self,
        tables: Sequence[EmbeddingBagConfig],
        quantized: Dict[str, QuantizedTable],
        is_weighted: bool = False,
        max_feature_length: int = 1,
    ):
        self.tables = tuple(tables)
        self.quantized = quantized
        self.is_weighted = is_weighted
        self.max_feature_length = max_feature_length
        self._emb_names = embedding_names_by_table(self.tables)
        self.embedding_names = tuple(
            n for names in self._emb_names for n in names
        )

    @staticmethod
    def from_float(
        tables: Sequence[EmbeddingBagConfig],
        weights: Dict[str, np.ndarray],
        data_type: DataType = DataType.INT8,
        is_weighted: bool = False,
        max_feature_length: int = 1,
    ) -> "QuantEmbeddingBagCollection":
        """Quantize trained fp32 tables (ref: from_float,
        quant/embedding_modules.py:49-88)."""
        bits = DATA_TYPE_NUM_BITS[data_type]
        if bits > 8:
            raise ValueError(f"{data_type} is not a quantized type")
        quantized = {
            t.name: quantize_rowwise(jnp.asarray(weights[t.name]), bits)
            for t in tables
        }
        return QuantEmbeddingBagCollection(
            tables, quantized, is_weighted, max_feature_length
        )

    def __call__(
        self, features: Union[PaddedSparseBatch, KeyedJaggedTensor]
    ) -> KeyedTensor:
        if isinstance(features, KeyedJaggedTensor):
            features = features.to_padded(self.max_feature_length)
        key_index = {k: i for i, k in enumerate(features.keys)}
        outputs, names = [], []
        for cfg, enames in zip(self.tables, self._emb_names):
            fidx = [key_index[f] for f in cfg.feature_names]
            ids = features.ids[jnp.asarray(fidx)]
            lengths = features.lengths[jnp.asarray(fidx)]
            psw = None
            if self.is_weighted and features.weights is not None:
                psw = features.weights[jnp.asarray(fidx)]
            pooled = quant_embedding_bag_lookup(
                self.quantized[cfg.name],
                ids,
                lengths,
                pooling=pooling_type_to_mode(cfg.pooling),
                per_sample_weights=psw,
            )
            for j, name in enumerate(enames):
                outputs.append(pooled[j])
                names.append(name)
        return KeyedTensor.from_tensor_list(names, outputs)
