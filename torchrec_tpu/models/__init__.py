from torchrec_tpu.models.dlrm import (  # noqa: F401
    DLRM,
    DLRMTrain,
    DenseArch,
    InteractionArch,
    OverArch,
    SparseArch,
)
from torchrec_tpu.models.deepfm import SimpleDeepFMNN  # noqa: F401
