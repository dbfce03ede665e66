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
)
