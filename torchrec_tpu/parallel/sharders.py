"""Module sharders — the capability declarations DMP plans against.

ref: torchrec/distributed/types.py:437 (`ModuleSharder`),
embeddingbag.py:489 (`EmbeddingBagCollectionSharder`), embedding.py:505
(`EmbeddingCollectionSharder`), quant_embeddingbag.py:259
(`QuantEmbeddingBagCollectionSharder`) and
model_parallel.py:43-47 (`get_default_sharders`).

A sharder declares which sharding types and compute kernels a module
kind supports and carries the opaque `fused_params` dict handed to the
kernel layer (ref embedding_types.py:239-301). DistributedModelParallel
uses these to constrain the planner when no explicit plan is given —
the TPU analogue of the reference's collective_plan-by-default flow
(ref model_parallel.py:200-212).
"""

from __future__ import annotations

import abc
from typing import Dict, List, Optional

from torchrec_tpu.parallel.types import ComputeKernel, ShardingType


class ModuleSharder(abc.ABC):
    """ref: types.py:437."""

    #: which DMP module kind this sharder handles ("ebc" pooled /
    #: "ec" sequence)
    module_kind: str = "ebc"

    def __init__(self, fused_params: Optional[dict] = None):
        self.fused_params: Dict = dict(fused_params or {})

    @abc.abstractmethod
    def sharding_types(self, device_type: str = "tpu") -> List[ShardingType]:
        ...

    def compute_kernels(
        self, sharding_type: ShardingType, device_type: str = "tpu"
    ) -> List[ComputeKernel]:
        return [ComputeKernel.FUSED]


class EmbeddingBagCollectionSharder(ModuleSharder):
    """ref: embeddingbag.py:489 — pooled collections support every
    sharding type."""

    module_kind = "ebc"

    def sharding_types(self, device_type: str = "tpu") -> List[ShardingType]:
        return [
            ShardingType.DATA_PARALLEL,
            ShardingType.TABLE_WISE,
            ShardingType.ROW_WISE,
            ShardingType.COLUMN_WISE,
            ShardingType.TABLE_ROW_WISE,
            ShardingType.TABLE_COLUMN_WISE,
        ]

    def compute_kernels(self, sharding_type, device_type="tpu"):
        return [ComputeKernel.FUSED, ComputeKernel.FUSED_UVM_CACHING]


class EmbeddingCollectionSharder(ModuleSharder):
    """ref: embedding.py:505 — sequence (unpooled) collections support
    TW / RW / DP (ref sharding/{tw,rw,dp}_sequence_sharding.py)."""

    module_kind = "ec"

    def sharding_types(self, device_type: str = "tpu") -> List[ShardingType]:
        return [
            ShardingType.DATA_PARALLEL,
            ShardingType.TABLE_WISE,
            ShardingType.ROW_WISE,
        ]


class QuantEmbeddingBagCollectionSharder(ModuleSharder):
    """ref: quant_embeddingbag.py:259 — TW-only int-N inference."""

    module_kind = "quant_ebc"

    def sharding_types(self, device_type: str = "tpu") -> List[ShardingType]:
        return [ShardingType.TABLE_WISE]

    def compute_kernels(self, sharding_type, device_type="tpu"):
        return [ComputeKernel.QUANT]


class EmbeddingTowerCollectionSharder(ModuleSharder):
    """ref: embedding_tower_sharding.py:835-941
    (EmbeddingTower(Collection)Sharder) — a tower's tables are whole
    tables co-located with their interaction module on ONE device, so
    only TABLE_WISE placements are legal; the planner co-locates them
    via the constraint dependency tag (enumerators.py:130-135)."""

    module_kind = "tower"

    def sharding_types(self, device_type: str = "tpu") -> List[ShardingType]:
        return [ShardingType.TABLE_WISE]


def get_default_sharders() -> List[ModuleSharder]:
    """ref: model_parallel.py:43-47."""
    return [
        EmbeddingBagCollectionSharder(),
        EmbeddingCollectionSharder(),
        QuantEmbeddingBagCollectionSharder(),
        EmbeddingTowerCollectionSharder(),
    ]
