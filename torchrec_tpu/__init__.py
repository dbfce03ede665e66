"""torchrec_tpu — a TPU-native sharded-embedding recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of TorchRec
(reference: samiwilf/torchrec-oldfork): giant sharded embedding tables,
a cost-model sharding planner, KeyedJaggedTensor-style sparse batches,
DLRM / DeepFM / BERT4Rec model families, fused embedding optimizers and
int8 quantized inference — all mapped onto device meshes with
`jax.sharding` + `shard_map` collectives rather than NCCL process groups.

Layer map (mirrors reference SURVEY.md §1):
  sparse/    JaggedTensor, KeyedJaggedTensor, KeyedTensor     (ref: torchrec/sparse/)
  ops/       embedding lookup/update kernels (XLA + Pallas)    (ref: FBGEMM surface)
  modules/   EmbeddingBagCollection, MLP, crossnets, DeepFM    (ref: torchrec/modules/)
  models/    DLRM, DeepFM, BERT4Rec                            (ref: torchrec/models/)
  parallel/  mesh, sharding strategies, DistributedModel       (ref: torchrec/distributed/)
  planner/   cost-model sharding planner                       (ref: torchrec/distributed/planner/)
  optim/     keyed/combined optimizers, warmup, clipping       (ref: torchrec/optim/)
  datasets/  criteo, movielens, random                         (ref: torchrec/datasets/)
  quant/     int8/int4 quantized embedding collections         (ref: torchrec/quant/)
  inference/ predict modules + export                          (ref: torchrec/inference/)
"""

__version__ = "0.1.0"

from torchrec_tpu.sparse import (  # noqa: F401
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
    PaddedSparseBatch,
)
from torchrec_tpu.modules.embedding_configs import (  # noqa: F401
    DataType,
    EmbeddingBagConfig,
    EmbeddingConfig,
    PoolingType,
)
from torchrec_tpu.modules.embedding_modules import (  # noqa: F401
    EmbeddingBagCollection,
    EmbeddingCollection,
)
from torchrec_tpu.modules.feature_processor import (  # noqa: F401
    FeatureProcessedEmbeddingBagCollection,
    PositionWeightedModule,
)


def __getattr__(name):
    """Lazy heavyweight exports (the reference exposes these at top level
    too: torchrec.DistributedModelParallel etc.)."""
    if name == "DistributedModelParallel":
        from torchrec_tpu.parallel import DistributedModelParallel

        return DistributedModelParallel
    if name == "EmbeddingShardingPlanner":
        from torchrec_tpu.planner import EmbeddingShardingPlanner

        return EmbeddingShardingPlanner
    raise AttributeError(f"module 'torchrec_tpu' has no attribute {name!r}")
