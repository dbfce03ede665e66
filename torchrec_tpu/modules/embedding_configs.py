"""Embedding table configuration dataclasses.

ref: torchrec/modules/embedding_configs.py:26-133 — the vocabulary every
layer shares: table name/rows/dim, dtype, pooling, feature mapping.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

from torchrec_tpu.ops.embedding import PoolingMode


class DataType(enum.Enum):
    """ref: embedding_configs.py:26 (incl. sub-byte inference types)."""

    FP32 = "FP32"
    FP16 = "FP16"
    BF16 = "BF16"
    INT8 = "INT8"
    INT4 = "INT4"
    INT2 = "INT2"


DATA_TYPE_NUM_BITS = {
    DataType.FP32: 32,
    DataType.FP16: 16,
    DataType.BF16: 16,
    DataType.INT8: 8,
    DataType.INT4: 4,
    DataType.INT2: 2,
}


class PoolingType(enum.Enum):
    SUM = "SUM"
    MEAN = "MEAN"
    NONE = "NONE"


def pooling_type_to_mode(p: PoolingType) -> PoolingMode:
    return {
        PoolingType.SUM: PoolingMode.SUM,
        PoolingType.MEAN: PoolingMode.MEAN,
        PoolingType.NONE: PoolingMode.NONE,
    }[p]


def data_type_to_jnp_dtype(dt: DataType):
    """Training storage dtype per table (ref: fbgemm weights_precision via
    `data_type_to_sparse_type`, modules/embedding_configs.py:77). INT
    types are inference-only (quant path), not valid here."""
    import jax.numpy as jnp

    m = {
        DataType.FP32: jnp.float32,
        DataType.FP16: jnp.float16,
        DataType.BF16: jnp.bfloat16,
    }
    if dt not in m:
        raise ValueError(f"{dt} is not a training weights dtype")
    return m[dt]


@dataclasses.dataclass
class BaseEmbeddingConfig:
    num_embeddings: int
    embedding_dim: int
    name: str = ""
    data_type: DataType = DataType.FP32
    feature_names: List[str] = dataclasses.field(default_factory=list)
    weight_init_max: Optional[float] = None
    weight_init_min: Optional[float] = None

    def get_weight_init_max(self) -> float:
        # ref default: sqrt(1/num_embeddings) (embedding_configs.py)
        if self.weight_init_max is not None:
            return self.weight_init_max
        return (1.0 / self.num_embeddings) ** 0.5

    def get_weight_init_min(self) -> float:
        if self.weight_init_min is not None:
            return self.weight_init_min
        return -((1.0 / self.num_embeddings) ** 0.5)

    def num_features(self) -> int:
        return len(self.feature_names)


@dataclasses.dataclass
class EmbeddingBagConfig(BaseEmbeddingConfig):
    """Pooled table (ref: embedding_configs.py:92)."""

    pooling: PoolingType = PoolingType.SUM


@dataclasses.dataclass
class EmbeddingConfig(BaseEmbeddingConfig):
    """Unpooled/sequence table (ref: embedding_configs.py:110)."""


@dataclasses.dataclass
class EmbeddingTableConfig(BaseEmbeddingConfig):
    """Internal sharding-time table descriptor (ref: embedding_configs.py:120)."""

    pooling: PoolingType = PoolingType.SUM
    is_weighted: bool = False
    has_feature_processor: bool = False
    embedding_names: List[str] = dataclasses.field(default_factory=list)
