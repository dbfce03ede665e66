from torchrec_tpu.inference.modules import (  # noqa: F401
    PredictFactory,
    PredictModule,
    quantize_embeddings,
)
