"""Accurate TPU op timing through a high-latency dispatch tunnel.

The local chip is reached via a relay with ~29ms host roundtrip, so
single-dispatch wall timing is useless. Instead: chain K async dispatches
of a jitted op whose output feeds the next call's input (device-resident
carry, no host syncs), fetch one scalar at the end, and take the slope
between two K values:

    t_op = (wall(K2) - wall(K1)) / (K2 - K1)

The op must take and return the same pytree structure (the carry), and
must be genuinely data-dependent on the carry so XLA cannot elide work.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _fetch(c):
    return jax.tree.map(lambda x: float(x.ravel()[0]), c)


def bench_chain(op, carry, k1=10, k2=50, reps=3, donate=False):
    """Seconds per op application. `op(carry) -> carry` (same structure)."""
    f = jax.jit(op, donate_argnums=(0,) if donate else ())

    def wall(k):
        c = jax.tree.map(jnp.copy, carry)
        c = f(c)  # warm (compile outside timing)
        _fetch(c)
        c = jax.tree.map(jnp.copy, carry)
        t0 = time.perf_counter()
        for _ in range(k):
            c = f(c)
        _fetch(c)
        return time.perf_counter() - t0

    t1 = min(wall(k1) for _ in range(reps))
    t2 = min(wall(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)
