from torchrec_tpu.modules.embedding_configs import (  # noqa: F401
    BaseEmbeddingConfig,
    DataType,
    EmbeddingBagConfig,
    EmbeddingConfig,
    PoolingType,
    pooling_type_to_mode,
)
from torchrec_tpu.modules.embedding_modules import (  # noqa: F401
    EmbeddingBagCollection,
    EmbeddingCollection,
)
from torchrec_tpu.modules.feature_processor import (  # noqa: F401
    FeatureProcessedEmbeddingBagCollection,
    PositionWeightedModule,
)
from torchrec_tpu.modules.mlp import MLP, Perceptron  # noqa: F401
