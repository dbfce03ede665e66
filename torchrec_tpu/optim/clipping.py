"""Gradient clipping wrappers (ref: torchrec/optim/clipping.py:163-199:
GradientClippingOptimizer with NORM / VALUE modes)."""

from __future__ import annotations

import enum

import optax


class GradientClipping(enum.Enum):
    NONE = "none"
    NORM = "norm"
    VALUE = "value"


def gradient_clipping(
    inner: optax.GradientTransformation,
    clipping: GradientClipping = GradientClipping.NONE,
    max_gradient: float = 0.1,
) -> optax.GradientTransformation:
    """Clip gradients before the inner optimizer (ref: clipping.py:169)."""
    if clipping is GradientClipping.NONE:
        return inner
    if clipping is GradientClipping.NORM:
        return optax.chain(optax.clip_by_global_norm(max_gradient), inner)
    if clipping is GradientClipping.VALUE:
        return optax.chain(optax.clip(max_gradient), inner)
    raise ValueError(clipping)
