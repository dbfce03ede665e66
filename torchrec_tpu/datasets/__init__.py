from torchrec_tpu.datasets.utils import Batch  # noqa: F401
from torchrec_tpu.datasets.random import RandomRecDataset  # noqa: F401
