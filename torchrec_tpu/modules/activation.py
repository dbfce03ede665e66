"""Activation modules (ref: torchrec/modules/activation.py:18)."""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax


class SwishLayerNorm(nn.Module):
    """x * sigmoid(LayerNorm(x)) (ref: activation.py:18)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x * jax.nn.sigmoid(nn.LayerNorm()(x))
