from torchrec_tpu.optim.keyed import (  # noqa: F401
    CombinedOptimizer,
    KeyedOptimizer,
    KeyedOptimizerWrapper,
)
from torchrec_tpu.optim.warmup import (  # noqa: F401
    WarmupPolicy,
    WarmupStage,
    make_warmup_schedule,
    warmup_optimizer,
)
from torchrec_tpu.optim.clipping import (  # noqa: F401
    GradientClipping,
    gradient_clipping,
)
