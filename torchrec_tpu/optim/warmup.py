"""LR warmup/decay policies (ref: torchrec/optim/warmup.py:21-147).

Policies LINEAR / CONSTANT / POLY / STEP / INVSQRT over staged iteration
ranges, with EXACT reference semantics (golden-parity tested against a
hand-computed WarmupOptimizer trace, tests/test_warmup_parity.py):

* the multiplier is a function of the GLOBAL iteration count, not the
  within-stage progress (ref `_get_multiplier(stage, iter)` with the
  optimizer-wide `iter_`, warmup.py:63-75,108-112);
* stage s applies while iter <= s.max_iters (transition happens when the
  post-step counter EXCEEDS max_iters, warmup.py:131-135);
* `decay_iters` defaults to 1 for STEP and max_iters otherwise
  (warmup.py:55-59); STEP decays by `value ** (iter // decay_iters)`,
  POLY by `(1 - iter/decay_iters) ** value`, INVSQRT by `1/sqrt(iter)`;
* after the last configured stage an implicit NONE stage holds the base
  lr forever (warmup.py:44).

The reference persists the iteration counter in a fake parameter so it
survives checkpoints (warmup.py:102-106); here the schedule is a pure
function of the step count that optax threads through its own state
(optax.scale_by_schedule keeps `count` in the optimizer state, which the
keyed state_dict already persists). `schedule(count)` equals the lr the
reference applies on update number `count` (0-based): WarmupOptimizer
sets lr from iter=0 before the first step and from iter=k after step k.

One jit-safety divergence: INVSQRT at iter 0 returns 1.0 instead of the
reference's ZeroDivisionError (reference configs never start INVSQRT at
iteration 0).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Sequence, Tuple

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
    """ref: warmup.py WarmupStage(policy, max_iters, value, lr_scale,
    decay_iters)."""

    policy: WarmupPolicy = WarmupPolicy.LINEAR
    max_iters: int = 1
    value: float = 1.0
    lr_scale: float = 1.0
    # POLY: denominator of iters in the decay; STEP: the step size.
    # <= 0 means "default": 1 for STEP, max_iters otherwise
    # (ref: warmup.py:36-39,55-59)
    decay_iters: int = -1


def _normalize_stages(
    stages: Sequence[WarmupStage],
) -> List[WarmupStage]:
    """Validate ordering and fill decay_iters defaults
    (ref `_lr_stages`, warmup.py:43-60; the implicit trailing NONE stage
    is handled by the schedule's base case)."""
    out: List[WarmupStage] = []
    start_iter = 0
    for stage in stages:
        if stage.max_iters <= start_iter:
            raise ValueError(
                f"max_iters of stage {stage} must exceed the previous "
                f"max_iters {start_iter}"
            )
        start_iter = stage.max_iters
        decay = stage.decay_iters
        if decay <= 0:
            decay = 1 if stage.policy is WarmupPolicy.STEP else stage.max_iters
        out.append(dataclasses.replace(stage, decay_iters=decay))
    return out


def _stage_multiplier(stage: WarmupStage, it):
    """LR multiplier of one stage at GLOBAL iteration `it`
    (ref `_get_multiplier`, warmup.py:63-75)."""
    p = stage.policy
    if p is WarmupPolicy.NONE:
        m = jnp.ones_like(it)
    elif p is WarmupPolicy.LINEAR:
        m = stage.value + (1.0 - stage.value) * it / stage.max_iters
    elif p is WarmupPolicy.CONSTANT:
        m = jnp.full_like(it, stage.value)
    elif p is WarmupPolicy.POLY:
        m = jnp.power(1.0 - it / stage.decay_iters, stage.value)
    elif p is WarmupPolicy.STEP:
        m = jnp.power(stage.value, jnp.floor(it / stage.decay_iters))
    elif p is WarmupPolicy.INVSQRT:
        m = 1.0 / jnp.sqrt(jnp.maximum(it, 1.0))
    else:
        raise ValueError(p)
    return m * stage.lr_scale


def make_warmup_schedule(
    stages: Sequence[WarmupStage], base_lr: float = 1.0
):
    """Staged schedule; `schedule(count)` is the lr of update `count`
    (0-based), matching the reference WarmupOptimizer trace exactly
    (ref: warmup.py:78-147)."""
    stages = _normalize_stages(stages)

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        out = lr  # implicit trailing NONE stage (warmup.py:44)
        for stage in reversed(stages):
            out = jnp.where(
                it <= stage.max_iters,
                lr * _stage_multiplier(stage, it),
                out,
            )
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
