from torchrec_tpu.parallel.types import (  # noqa: F401
    ComputeKernel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.parallel.sharded_ebc import (  # noqa: F401
    ShardedEmbeddingBagCollection,
)
from torchrec_tpu.parallel.dmp import DistributedModelParallel  # noqa: F401
