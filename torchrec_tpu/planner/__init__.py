from torchrec_tpu.planner.planners import EmbeddingShardingPlanner  # noqa: F401
from torchrec_tpu.planner.types import (  # noqa: F401
    ParameterConstraints,
    PlannerError,
    Topology,
)
