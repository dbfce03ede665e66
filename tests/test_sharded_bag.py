"""ShardedEmbeddingBag (single raw bag) parity tests.

ref: torchrec/distributed/embeddingbag.py:531-758 and its coverage in
distributed/tests/test_model_parallel via TestEBSharder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.parallel import ParameterSharding, ShardingEnv, ShardingType
from torchrec_tpu.parallel.sharded_bag import ShardedEmbeddingBag

R, D, B, L = 120, 16, 16, 3
LR = 0.1
EPS = 1e-8


@pytest.fixture(scope="module")
def env():
    return ShardingEnv.from_devices()


@pytest.mark.parametrize(
    "stype",
    [ShardingType.ROW_WISE, ShardingType.TABLE_WISE,
     ShardingType.COLUMN_WISE, ShardingType.DATA_PARALLEL],
    ids=lambda s: s.value,
)
def test_sharded_bag_forward_and_update(env, stype):
    rng = np.random.RandomState(0)
    w = rng.randn(R, D).astype(np.float32)
    bag = ShardedEmbeddingBag(
        env, R, D,
        ParameterSharding(stype, ranks=[2] if stype is ShardingType.TABLE_WISE else None),
        optim_kwargs={"eps": EPS},
    )
    states = bag.shard_from_dense(w)
    ids = rng.randint(0, R, size=(B, L)).astype(np.int32)
    lengths = rng.randint(0, L + 1, size=(B,)).astype(np.int32)
    out = np.asarray(
        jax.jit(bag.forward)(states, jnp.asarray(ids), jnp.asarray(lengths))
    )
    ref = np.zeros((B, D), np.float32)
    for b in range(B):
        for l in range(lengths[b]):
            ref[b] += w[ids[b, l]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    d_pooled = rng.randn(B, D).astype(np.float32)
    new_states = jax.jit(bag.update)(
        states, jnp.asarray(ids), jnp.asarray(lengths),
        jnp.asarray(d_pooled), LR,
    )
    got = bag.unshard_to_dense(new_states)
    g = np.zeros_like(w)
    for b in range(B):
        for l in range(lengths[b]):
            g[ids[b, l]] += d_pooled[b]
    if stype is ShardingType.COLUMN_WISE:
        # CW: one column shard per device, each with separate momentum
        n_dev = jax.device_count()
        parts = []
        for gs, ws in zip(np.split(g, n_dev, axis=1), np.split(w, n_dev, axis=1)):
            m = (gs**2).mean(axis=1)
            parts.append(ws - LR * gs / (np.sqrt(m)[:, None] + EPS))
        ref_w = np.concatenate(parts, axis=1)
    else:
        m = (g**2).mean(axis=1)
        ref_w = w - LR * g / (np.sqrt(m)[:, None] + EPS)
    np.testing.assert_allclose(got, ref_w, rtol=1e-4, atol=1e-5)
