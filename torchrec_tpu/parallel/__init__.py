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
from torchrec_tpu.parallel.tower_sharding import (  # noqa: F401
    ShardedEmbeddingTower,
    ShardedEmbeddingTowerCollection,
    TowerSpec,
)
from torchrec_tpu.parallel.quant_sharded import (  # noqa: F401
    ShardedQuantEmbeddingBagCollection,
)
from torchrec_tpu.parallel.sharded_bag import (  # noqa: F401
    ShardedEmbeddingBag,
)
from torchrec_tpu.parallel.sharded_ec import (  # noqa: F401
    ShardedEmbeddingCollection,
)
from torchrec_tpu.parallel.variable_batch import (  # noqa: F401
    VariableBatch,
    masked_bce_with_logits,
    masked_mean,
)
from torchrec_tpu.parallel.sharders import (  # noqa: F401
    EmbeddingBagCollectionSharder,
    EmbeddingCollectionSharder,
    ModuleSharder,
    QuantEmbeddingBagCollectionSharder,
    get_default_sharders,
)
