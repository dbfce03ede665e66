"""UVM-equivalent software row cache: parity vs an uncached table.

ref: FBGEMM EmbeddingLocation.MANAGED_CACHING consumed at
torchrec/distributed/embedding_types.py:57-76 — training through the
cache must produce the same table as training directly.
"""

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.ops.embedding import PoolingMode, embedding_bag_lookup
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    FusedOptimizerState,
    apply_fused_update,
)
from torchrec_tpu.ops.uvm_cache import UvmCachedEmbedding

R, D, B, L, C = 500, 16, 32, 2, 96
LR = 0.1


def _run_cached(table, batches):
    uvm = UvmCachedEmbedding(table.copy(), cache_rows=C)
    for ids, lengths, d_pooled in batches:
        slots = uvm.prepare(ids)
        slots_j = jnp.asarray(slots)
        lengths_j = jnp.asarray(lengths)
        out = uvm.lookup_pooled(slots_j, lengths_j)
        mask = (np.arange(L)[None, :] < lengths[:, None])
        row_grads = np.repeat(d_pooled[:, None, :], L, axis=1)
        uvm.update(
            slots_j.reshape(-1),
            jnp.asarray(row_grads.reshape(-1, D)),
            jnp.asarray(mask.reshape(-1)),
            LR,
        )
    uvm.flush()
    return uvm, np.asarray(out)


def _run_uncached(table, batches):
    w = jnp.asarray(table)
    opt = FusedOptimizerState(
        momentum1=jnp.zeros((R,), jnp.float32), momentum2=None,
        step=jnp.zeros((), jnp.int32), optim=EmbOptimType.ROWWISE_ADAGRAD,
    )
    for ids, lengths, d_pooled in batches:
        out = embedding_bag_lookup(
            w, jnp.asarray(ids), jnp.asarray(lengths), PoolingMode.SUM
        )
        mask = (np.arange(L)[None, :] < lengths[:, None])
        row_grads = np.repeat(d_pooled[:, None, :], L, axis=1)
        w, opt = apply_fused_update(
            w, opt, jnp.asarray(ids.reshape(-1)),
            jnp.asarray(row_grads.reshape(-1, D)),
            jnp.asarray(mask.reshape(-1)), LR,
        )
    return np.asarray(w), np.asarray(out)


def _batches(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ids = rng.randint(0, R, size=(B, L)).astype(np.int32)
        lengths = rng.randint(0, L + 1, size=(B,)).astype(np.int32)
        d_pooled = rng.randn(B, D).astype(np.float32)
        out.append((ids, lengths, d_pooled))
    return out


def test_uvm_cache_training_parity():
    rng = np.random.RandomState(42)
    table = rng.randn(R, D).astype(np.float32)
    batches = _batches(6)
    uvm, out_c = _run_cached(table, batches)
    ref_w, out_u = _run_uncached(table, batches)
    np.testing.assert_allclose(out_c, out_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(uvm.table, ref_w, rtol=1e-5, atol=1e-6)
    assert uvm.misses > 0 and uvm.hits > 0  # cache actually exercised


def test_uvm_cache_eviction_pressure():
    """Working set far larger than the cache: every row still correct."""
    rng = np.random.RandomState(1)
    table = rng.randn(R, D).astype(np.float32)
    batches = _batches(10, seed=9)
    uvm, _ = _run_cached(table, batches)
    ref_w, _ = _run_uncached(table, batches)
    np.testing.assert_allclose(uvm.table, ref_w, rtol=1e-5, atol=1e-6)


def test_uvm_cache_overflow_raises():
    table = np.zeros((R, D), np.float32)
    uvm = UvmCachedEmbedding(table, cache_rows=4)
    try:
        uvm.prepare(np.arange(10, dtype=np.int32))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
