"""Shared test fixtures/helpers.

ref: torchrec/test_utils/__init__.py:26-114 (free-port finder, sanitizer
skips, PG init, seed_and_log) and
torchrec/distributed/test_utils/test_model.py:37-174 (`ModelInput
.generate` synthetic global batch).

TPU translation: no processes/ports/sanitizers — the multi-device harness
is a virtual CPU mesh (tests/conftest.py). What carries over: seeding,
synthetic batch generation, and pytree comparison for golden-parity
tests.
"""

from __future__ import annotations

import functools
import logging
import random
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.sparse import KeyedJaggedTensor, PaddedSparseBatch

logger = logging.getLogger(__name__)


def seed_and_log(fn):
    """Seed python/numpy RNGs and log the seed (ref: test_utils:104)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        seed = random.randint(0, 2**31)
        logger.info("Using random seed %d", seed)
        random.seed(seed)
        np.random.seed(seed % (2**32))
        return fn(*args, **kwargs)

    return wrapped


def random_padded_batch(
    tables: Sequence[EmbeddingBagConfig],
    batch_size: int,
    max_length: int,
    seed: int = 0,
    weighted: bool = False,
) -> PaddedSparseBatch:
    """Synthetic [F, B, L] sparse batch for the given tables — the
    equivalent of ModelInput.generate's sparse part (test_model.py:37)."""
    rng = np.random.RandomState(seed)
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    B, L = batch_size, max_length
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    values = []
    for fi, f in enumerate(feats):
        for b in range(B):
            n = lengths[fi * B + b]
            values.extend(rng.randint(0, rows[f], size=(n,)).tolist())
    weights = rng.rand(len(values)).astype(np.float32) if weighted else None
    kjt = KeyedJaggedTensor.from_lengths(
        feats,
        jnp.asarray(np.asarray(values, np.int32)),
        jnp.asarray(lengths),
        weights=None if weights is None else jnp.asarray(weights),
    )
    return kjt.to_padded(L)


def random_dense_tables(
    tables: Sequence[EmbeddingBagConfig], seed: int = 0
) -> Dict[str, np.ndarray]:
    """Unsharded per-table weights for golden-copy parity tests (the
    reference's _copy_state_dict idea, test_model_parallel_base.py:92)."""
    rng = np.random.RandomState(seed)
    return {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(
            np.float32
        )
        for t in tables
    }


def assert_allclose_pytree(got, want, rtol=1e-5, atol=1e-6):
    """Structure-aware allclose for parameter/optimizer pytrees."""
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        ),
        got,
        want,
    )
