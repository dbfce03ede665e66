from torchrec_tpu.quant.embedding_modules import (  # noqa: F401
    QuantEmbeddingBagCollection,
)
