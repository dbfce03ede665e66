"""Warmup-policy golden parity (VERDICT r1 item 9).

`_ref_lr_trace` re-implements the reference WarmupOptimizer's exact
stepping semantics in pure Python, hand-computed from
/root/reference/torchrec/optim/warmup.py:43-147 (`_lr_stages` defaults,
`_get_multiplier` formulas on the GLOBAL iteration, the
`iter_ > max_iters` stage transition, and the implicit trailing NONE
stage). `make_warmup_schedule(count)` must reproduce the lr the
reference applies on update number `count` for every policy.
"""

import math

import numpy as np
import pytest

from torchrec_tpu.optim import WarmupPolicy, WarmupStage, make_warmup_schedule


def _ref_lr_stages(stages):
    """ref warmup.py:43-60."""
    out = []
    start_iter = 0
    for s in stages:
        assert s.max_iters > start_iter
        start_iter = s.max_iters
        decay = s.decay_iters
        if decay <= 0:
            decay = 1 if s.policy is WarmupPolicy.STEP else s.max_iters
        out.append(
            WarmupStage(s.policy, s.max_iters, s.value, s.lr_scale, decay)
        )
    out.append(
        WarmupStage(WarmupPolicy.NONE, 1 << 62, 1.0, 1.0, 1 << 62)
    )
    return out


def _ref_multiplier(stage, it):
    """ref warmup.py:63-75."""
    m = 1.0
    if stage.policy is WarmupPolicy.LINEAR:
        m = stage.value + (1.0 - stage.value) * it / stage.max_iters
    elif stage.policy is WarmupPolicy.CONSTANT:
        m = stage.value
    elif stage.policy is WarmupPolicy.POLY:
        m = math.pow(1 - it / stage.decay_iters, stage.value)
    elif stage.policy is WarmupPolicy.STEP:
        m = math.pow(stage.value, it // stage.decay_iters)
    elif stage.policy is WarmupPolicy.INVSQRT:
        m = 1.0 / math.sqrt(it) if it > 0 else 1.0  # documented it=0 guard
    return m * stage.lr_scale


def _ref_lr_trace(stages, lr, n_steps):
    """lr used by each of the first n_steps updates, following the
    reference WarmupOptimizer: _set_lr(0, 0) at init, then after each
    step iter += 1 and advance the stage when iter exceeds max_iters
    (ref warmup.py:90-147)."""
    stages = _ref_lr_stages(stages)
    iter_, stage_id = 0, 0
    out = []
    for _ in range(n_steps):
        out.append(lr * _ref_multiplier(stages[stage_id], iter_))
        iter_ += 1
        if iter_ > stages[stage_id].max_iters and stage_id + 1 < len(stages):
            stage_id += 1
    return out


CONFIGS = {
    "linear": [WarmupStage(WarmupPolicy.LINEAR, max_iters=10, value=0.25)],
    "constant": [WarmupStage(WarmupPolicy.CONSTANT, max_iters=15, value=0.5)],
    "poly_default_decay": [
        WarmupStage(WarmupPolicy.POLY, max_iters=20, value=2.0)
    ],
    "poly_decay_iters": [
        WarmupStage(WarmupPolicy.POLY, max_iters=20, value=2.0,
                    decay_iters=40)
    ],
    "step_default_decay": [
        WarmupStage(WarmupPolicy.STEP, max_iters=12, value=0.7)
    ],
    "step_decay_iters": [
        WarmupStage(WarmupPolicy.STEP, max_iters=30, value=0.5,
                    decay_iters=7)
    ],
    "invsqrt": [
        WarmupStage(WarmupPolicy.LINEAR, max_iters=5, value=0.0),
        WarmupStage(WarmupPolicy.INVSQRT, max_iters=50, value=1.0),
    ],
    "mlperf_like": [
        WarmupStage(WarmupPolicy.LINEAR, max_iters=8, value=0.0),
        WarmupStage(WarmupPolicy.CONSTANT, max_iters=20, value=1.0),
        WarmupStage(WarmupPolicy.POLY, max_iters=40, value=2.0,
                    decay_iters=40, lr_scale=0.5),
    ],
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_schedule_matches_reference_trace(name):
    stages = CONFIGS[name]
    lr = 0.34
    n = max(s.max_iters for s in stages) + 10
    want = _ref_lr_trace(stages, lr, n)
    sched = make_warmup_schedule(stages, base_lr=lr)
    got = [float(sched(k)) for k in range(n)]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                               err_msg=name)


def test_stage_order_validation():
    with pytest.raises(ValueError, match="must exceed"):
        make_warmup_schedule(
            [
                WarmupStage(WarmupPolicy.LINEAR, max_iters=10),
                WarmupStage(WarmupPolicy.CONSTANT, max_iters=5),
            ]
        )
