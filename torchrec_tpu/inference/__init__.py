from torchrec_tpu.inference.batching import (  # noqa: F401
    BatchingPredictServer,
    make_dlrm_collate,
)
from torchrec_tpu.inference.native_batching import (  # noqa: F401
    NativePredictServer,
    PredictClient,
    native_serving_available,
)
from torchrec_tpu.inference.modules import (  # noqa: F401
    PredictFactory,
    PredictFactoryPackager,
    PredictModule,
    ShardedPredictModule,
    quantize_embeddings,
    shard_quantized,
)
