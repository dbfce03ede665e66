from torchrec_tpu.inference.modules import (  # noqa: F401
    PredictFactory,
    PredictFactoryPackager,
    PredictModule,
    ShardedPredictModule,
    quantize_embeddings,
    shard_quantized,
)
