"""Cross networks: DCN/DCN-V2 family (ref: torchrec/modules/crossnet.py).

All variants operate on [B, N] and return [B, N]; matmuls are kept large
and 2-D so XLA maps them onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class CrossNet(nn.Module):
    """Full-rank cross net: x_{l+1} = x0 * (W_l x_l + b_l) + x_l
    (ref: crossnet.py:19)."""

    num_layers: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x0 = x
        for i in range(self.num_layers):
            xw = nn.Dense(x.shape[-1], name=f"cross_{i}")(x)
            x = x0 * xw + x
        return x


class LowRankCrossNet(nn.Module):
    """x_{l+1} = x0 * (W_l (V_l x_l) + b_l) + x_l with rank-r factors
    (ref: crossnet.py:92)."""

    num_layers: int
    low_rank: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x0 = x
        for i in range(self.num_layers):
            v = nn.Dense(self.low_rank, use_bias=False, name=f"V_{i}")(x)
            w = nn.Dense(x.shape[-1], name=f"W_{i}")(v)
            x = x0 * w + x
        return x


class VectorCrossNet(nn.Module):
    """DCN-V1: scalar-weight cross x_{l+1} = x0 <x_l, w_l> + b_l + x_l
    (ref: crossnet.py:191)."""

    num_layers: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x0 = x
        N = x.shape[-1]
        for i in range(self.num_layers):
            w = self.param(
                f"weight_{i}", nn.initializers.lecun_normal(), (N, 1)
            )
            b = self.param(f"bias_{i}", nn.initializers.zeros, (N,))
            dot = x @ w  # [B, 1]
            x = x0 * dot + b + x
        return x


class LowRankMixtureCrossNet(nn.Module):
    """DCN-V2 mixture-of-low-rank-experts cross (ref: crossnet.py:271)."""

    num_layers: int
    num_experts: int = 1
    low_rank: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x0 = x
        N = x.shape[-1]
        for i in range(self.num_layers):
            expert_outs = []
            gate_scores = []
            for e in range(self.num_experts):
                v = nn.Dense(
                    self.low_rank, use_bias=False, name=f"V_{i}_{e}"
                )(x)
                c = nn.Dense(
                    self.low_rank, use_bias=False, name=f"C_{i}_{e}"
                )(jax.nn.tanh(v))
                u = nn.Dense(N, name=f"U_{i}_{e}")(jax.nn.tanh(c))
                expert_outs.append(x0 * u)
                if self.num_experts > 1:
                    gate_scores.append(
                        nn.Dense(1, use_bias=False, name=f"gate_{i}_{e}")(x)
                    )
            if self.num_experts == 1:
                out = expert_outs[0]
            else:
                gates = jax.nn.softmax(
                    jnp.concatenate(gate_scores, axis=-1), axis=-1
                )  # [B, E]
                stacked = jnp.stack(expert_outs, axis=-1)  # [B, N, E]
                out = jnp.einsum("bne,be->bn", stacked, gates)
            x = out + x
        return x
