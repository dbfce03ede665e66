"""Perceptron / MLP building blocks (ref: torchrec/modules/mlp.py:16,76)."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Perceptron(nn.Module):
    """Linear + activation (ref: mlp.py:16). `dtype` sets the COMPUTE
    precision (params stay fp32) — bf16 is the TPU analogue of the
    reference's TF32 matmuls on A100."""

    out_size: int
    bias: bool = True
    activation: Callable[[Array], Array] = jax.nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch.nn.Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        fan_in = x.shape[-1]
        bound = 1.0 / (fan_in**0.5)
        init = nn.initializers.uniform(scale=2 * bound)
        y = nn.Dense(
            self.out_size,
            use_bias=self.bias,
            dtype=self.dtype,
            kernel_init=lambda k, s, d=jnp.float32: init(k, s, d) - bound,
            bias_init=lambda k, s, d=jnp.float32: init(k, s, d) - bound,
        )(x)
        return self.activation(y)


class MLP(nn.Module):
    """Stack of Perceptrons (ref: mlp.py:76)."""

    layer_sizes: Sequence[int]
    bias: bool = True
    activation: Callable[[Array], Array] = jax.nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for size in self.layer_sizes:
            x = Perceptron(
                size, bias=self.bias, activation=self.activation,
                dtype=self.dtype,
            )(x)
        return x
