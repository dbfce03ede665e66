"""LR warmup/decay policies (ref: torchrec/optim/warmup.py:21-127).

Policies LINEAR / CONSTANT / POLY / STEP / INVSQRT over staged iteration
ranges. The reference persists the iteration counter in a fake parameter
so it survives checkpoints (warmup.py:103-112); here the schedule is a
pure function of the step count that optax threads through its own state
(optax.scale_by_schedule keeps `count` in the optimizer state, which the
keyed state_dict already persists)."""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Sequence

import jax.numpy as jnp
import optax


class WarmupPolicy(enum.Enum):
    NONE = "none"
    LINEAR = "linear"
    CONSTANT = "constant"
    POLY = "poly"
    STEP = "step"
    INVSQRT = "inv_sqrt"


@dataclasses.dataclass
class WarmupStage:
    """ref: warmup.py WarmupStage(policy, max_iters, value, lr_scale)."""

    policy: WarmupPolicy = WarmupPolicy.LINEAR
    max_iters: int = 1
    value: float = 1.0
    lr_scale: float = 1.0
    # POLY exponent / STEP decay interval packed in `value` as in reference


def _stage_scale(policy: WarmupPolicy, progress, value: float):
    """LR multiplier within a stage; `progress` in [0, 1]."""
    if policy is WarmupPolicy.NONE:
        return jnp.ones_like(progress)
    if policy is WarmupPolicy.LINEAR:
        # ramp from `value` to 1.0
        return value + (1.0 - value) * progress
    if policy is WarmupPolicy.CONSTANT:
        return jnp.full_like(progress, value)
    if policy is WarmupPolicy.POLY:
        return jnp.power(jnp.maximum(1.0 - progress, 1e-9), value)
    if policy is WarmupPolicy.STEP:
        # halve every `value` fraction of the stage
        return 0.5 ** jnp.floor(progress / jnp.maximum(value, 1e-9))
    if policy is WarmupPolicy.INVSQRT:
        return 1.0 / jnp.sqrt(jnp.maximum(progress, 1e-9))
    raise ValueError(policy)


def make_warmup_schedule(
    stages: Sequence[WarmupStage], base_lr: float = 1.0
):
    """Staged schedule: stage i covers iterations
    [prev_max, stage.max_iters) (ref: warmup.py:78-127)."""

    boundaries = [s.max_iters for s in stages]

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        prev_bounds = [0] + boundaries[:-1]
        # piecewise, built last-to-first so earlier stages take precedence
        out = lr  # after all stages: base lr
        for stage, lo, hi in reversed(list(zip(stages, prev_bounds, boundaries))):
            span = max(hi - lo, 1)
            progress = jnp.clip((count - lo) / span, 0.0, 1.0)
            scale = _stage_scale(stage.policy, progress, stage.value)
            stage_lr = lr * stage.lr_scale * scale
            out = jnp.where(count < hi, stage_lr, out)
        return out

    return schedule


def warmup_optimizer(
    inner: optax.GradientTransformation,
    stages: Sequence[WarmupStage],
    base_lr: float = 1.0,
) -> optax.GradientTransformation:
    """Wrap an optimizer with the staged warmup schedule
    (ref: WarmupOptimizer, warmup.py:78)."""
    schedule = make_warmup_schedule(stages, base_lr)
    return optax.chain(inner, optax.scale_by_schedule(schedule))
