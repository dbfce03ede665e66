"""Table grouping for sharded embedding collections.

ref: torchrec/distributed/embedding_sharding.py:393-490 (`group_tables`:
tables grouped by (data type, pooling, weighted, kernel)) and
embeddingbag.py:246-254 (one EmbeddingSharding per sharding type).

Here tables are grouped by (sharding_type, embedding_dim, is_weighted):
one group = one table-batched weight array = one lookup = one set of
collectives. Pooling may vary per table inside a group (carried as static
per-feature flags into the kernel)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from torchrec_tpu.modules.embedding_configs import (
    DataType,
    EmbeddingBagConfig,
    PoolingType,
    pooling_type_to_mode,
)
from torchrec_tpu.ops.embedding import PoolingMode
from torchrec_tpu.parallel.types import ParameterSharding, ShardingType


@dataclasses.dataclass(frozen=True)
class ShardedTableMeta:
    """Static per-table metadata inside a group."""

    name: str
    rows: int
    dim: int
    pooling: PoolingMode
    feature_names: Tuple[str, ...]
    embedding_names: Tuple[str, ...]
    rank: int = 0  # TABLE_WISE placement; host index for TWRW/TWCW


@dataclasses.dataclass(frozen=True)
class GroupMeta:
    """Static metadata of one sharding group."""

    sharding_type: ShardingType
    tables: Tuple[ShardedTableMeta, ...]
    dim: int
    is_weighted: bool
    data_type: DataType = DataType.FP32

    @property
    def features(self) -> Tuple[str, ...]:
        return tuple(f for t in self.tables for f in t.feature_names)

    @property
    def embedding_names(self) -> Tuple[str, ...]:
        return tuple(n for t in self.tables for n in t.embedding_names)

    @property
    def feature_table(self) -> np.ndarray:
        """[F] table index for each feature."""
        out = []
        for ti, t in enumerate(self.tables):
            out.extend([ti] * len(t.feature_names))
        return np.asarray(out, dtype=np.int32)

    @property
    def feature_pooling_mean(self) -> np.ndarray:
        """[F] bool: feature uses MEAN pooling."""
        out = []
        for t in self.tables:
            out.extend([t.pooling is PoolingMode.MEAN] * len(t.feature_names))
        return np.asarray(out, dtype=bool)


class GroupedInputDistMixin:
    """Per-group sparse input-dist dispatch shared by the sharded
    EBC/EC modules (host class must define ``self.groups`` /
    ``self.strategies``)."""

    def _group_batch(self, sb, group_idx: int):
        feats = self.groups[group_idx].features
        key_index = {k: i for i, k in enumerate(sb.keys)}
        return sb.select_features([key_index[f] for f in feats])

    def input_dist(self, sb):
        """The prefetchable sparse input dist: per-group pre-gathered
        global batches (None for groups whose strategy gathers in-step).
        Feed the result to forward/update's `dist` to skip the in-step
        id all_gather — the TPU analogue of the reference's pre-issued
        input dist (ref train_pipeline.py:422-536)."""
        return tuple(
            strat.input_dist(self._group_batch(sb, gi))
            if strat.supports_input_dist
            else None
            for gi, strat in enumerate(self.strategies)
        )


def group_tables(
    tables: Sequence[EmbeddingBagConfig],
    embedding_names_per_table: Sequence[Sequence[str]],
    plan: Dict[str, ParameterSharding],
    is_weighted: bool = False,
) -> List[GroupMeta]:
    """Partition tables into sharding groups, preserving table order within
    each group (output feature order is reassembled by the sharded module)."""
    groups: Dict[Tuple[ShardingType, int], List[ShardedTableMeta]] = {}
    order: List[Tuple[ShardingType, int]] = []
    from torchrec_tpu.parallel.types import ComputeKernel

    for cfg, enames in zip(tables, embedding_names_per_table):
        ps = plan.get(cfg.name)
        if ps is None:
            raise ValueError(f"no sharding plan entry for table {cfg.name}")
        if (
            getattr(ps, "compute_kernel", None)
            is ComputeKernel.FUSED_UVM_CACHING
        ):
            raise NotImplementedError(
                f"table {cfg.name}: FUSED_UVM_CACHING is planned for "
                "host offload — drive it with parallel.uvm_ebc."
                "UvmEmbeddingBagCollection (host-managed staging per "
                "step); the jitted sharded EBC path holds tables in HBM "
                "only"
            )
        pooling = pooling_type_to_mode(getattr(cfg, "pooling", PoolingType.SUM))
        meta = ShardedTableMeta(
            name=cfg.name,
            rows=cfg.num_embeddings,
            dim=cfg.embedding_dim,
            pooling=pooling,
            feature_names=tuple(cfg.feature_names),
            embedding_names=tuple(enames),
            rank=(ps.ranks[0] if ps.ranks else 0)
            if ps.sharding_type is ShardingType.TABLE_WISE
            else (ps.host or 0),
        )
        dt = getattr(cfg, "data_type", DataType.FP32)
        key = (ps.sharding_type, cfg.embedding_dim, dt)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(meta)
    return [
        GroupMeta(
            sharding_type=key[0],
            tables=tuple(groups[key]),
            dim=key[1],
            is_weighted=is_weighted,
            data_type=key[2],
        )
        for key in order
    ]
