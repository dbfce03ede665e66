"""DeepFM interaction modules (ref: torchrec/modules/deepfm.py:35,133)."""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _flatten_cat(inputs: Sequence[Array]) -> Array:
    """Flatten each input to [B, -1] and concat along dim 1."""
    B = inputs[0].shape[0]
    return jnp.concatenate([x.reshape(B, -1) for x in inputs], axis=1)


class DeepFM(nn.Module):
    """The "deep" interaction of DeepFM: flatten+concat all inputs, run a
    dense module over them (ref: deepfm.py:35 — `deep_fm.DeepFM`)."""

    deep_module: nn.Module

    @nn.compact
    def __call__(self, embeddings: Sequence[Array]) -> Array:
        return self.deep_module(_flatten_cat(embeddings))


class FactorizationMachine(nn.Module):
    """O(kN) FM pairwise interaction: 0.5*((Σv)² - Σv²) summed over dims
    (ref: deepfm.py:133)."""

    @nn.compact
    def __call__(self, embeddings: Sequence[Array]) -> Array:
        # inputs: list of [B, F_i, D] or [B, N]; FM needs a common last dim,
        # so treat the flattened concat as [B, N] with implicit D=1 fields —
        # matching the reference which concatenates then computes
        # sum-square minus square-sum over the feature axis.
        x = _flatten_cat(embeddings)  # [B, N]
        sum_sq = jnp.square(jnp.sum(x, axis=1, keepdims=True))
        sq_sum = jnp.sum(jnp.square(x), axis=1, keepdims=True)
        return 0.5 * (sum_sq - sq_sum)  # [B, 1]
