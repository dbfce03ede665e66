"""TWRW/TWCW hierarchical-sharding parity tests.

ref: torchrec/distributed/tests/test_model_parallel_hierarchical.py —
multi-node simulated via LOCAL_WORLD_SIZE on one host; here local_size
partitions the flat 8-device mesh into hosts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagConfig, PoolingType
from torchrec_tpu.parallel import (
    ParameterSharding,
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
B = 16
L = 2
D = 16
LR = 0.1
EPS = 1e-8


def _tables():
    return (
        EmbeddingBagConfig(num_embeddings=100, embedding_dim=D, name="t0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=37, embedding_dim=D, name="t1",
                           feature_names=["f1", "f2"]),
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=D, name="t2",
                           feature_names=["f3"], pooling=PoolingType.MEAN),
    )


def _dense_weights(tables, seed=0):
    rng = np.random.RandomState(seed)
    return {t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(
        np.float32) for t in tables}


def _batch(tables, seed=1):
    rng = np.random.RandomState(seed)
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    vals = np.concatenate(
        [rng.randint(0, rows[feats[i // B]], size=(lengths[i],))
         for i in range(len(lengths))] + [np.zeros((0,))]
    ).astype(np.int32)
    return KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)


def _reference_forward(tables, dense, sb):
    ids = np.asarray(sb.ids); lengths = np.asarray(sb.lengths)
    outs = []
    fi = 0
    for t in tables:
        for _ in t.feature_names:
            pooled = np.zeros((B, t.embedding_dim), np.float32)
            for b in range(B):
                for l in range(lengths[fi, b]):
                    pooled[b] += dense[t.name][ids[fi, b, l]]
                if t.pooling == PoolingType.MEAN and lengths[fi, b] > 0:
                    pooled[b] /= lengths[fi, b]
            outs.append(pooled)
            fi += 1
    return np.concatenate(outs, axis=1)


def _reference_update(tables, dense, sb, d_values, col_shards=1):
    ids = np.asarray(sb.ids); lengths = np.asarray(sb.lengths)
    grads = {k: np.zeros_like(v) for k, v in dense.items()}
    off = 0; fi = 0
    for t in tables:
        Dt = t.embedding_dim
        for _ in t.feature_names:
            dp = d_values[:, off:off + Dt]
            for b in range(B):
                for l in range(lengths[fi, b]):
                    c = (1.0 / lengths[fi, b]
                         if t.pooling == PoolingType.MEAN else 1.0)
                    grads[t.name][ids[fi, b, l]] += c * dp[b]
            off += Dt; fi += 1
    new = {}
    for t in tables:
        parts = []
        for gs, ws in zip(np.split(grads[t.name], col_shards, axis=1),
                          np.split(dense[t.name].copy(), col_shards, axis=1)):
            m = (gs**2).mean(axis=1)
            parts.append(ws - LR * gs / (np.sqrt(m)[:, None] + EPS))
        new[t.name] = np.concatenate(parts, axis=1)
    return new


@pytest.fixture(scope="module", params=[2, 4], ids=["local2", "local4"])
def env(request):
    assert jax.device_count() == N_DEV
    return ShardingEnv.from_devices(local_size=request.param)


def _plan(env, stype):
    H = env.num_hosts
    return {
        t: ParameterSharding(stype, host=i % H)
        for i, t in enumerate(["t0", "t1", "t2"])
    }


@pytest.mark.parametrize(
    "stype", [ShardingType.TABLE_ROW_WISE, ShardingType.TABLE_COLUMN_WISE],
    ids=lambda s: s.value,
)
def test_hierarchical_forward_parity(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sebc = ShardedEmbeddingBagCollection(env, tables, _plan(env, stype))
    states = sebc.shard_from_dense(dense)
    kt = jax.jit(sebc.forward)(states, sb)
    ref = _reference_forward(tables, dense, sb)
    np.testing.assert_allclose(np.asarray(kt.values), ref, rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize(
    "stype", [ShardingType.TABLE_ROW_WISE, ShardingType.TABLE_COLUMN_WISE],
    ids=lambda s: s.value,
)
def test_hierarchical_shard_roundtrip(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sebc = ShardedEmbeddingBagCollection(env, tables, _plan(env, stype))
    states = sebc.shard_from_dense(dense)
    back = sebc.unshard_to_dense(states)
    for name, w in dense.items():
        np.testing.assert_allclose(back[name], w, rtol=1e-6, err_msg=name)


@pytest.mark.parametrize(
    "stype", [ShardingType.TABLE_ROW_WISE, ShardingType.TABLE_COLUMN_WISE],
    ids=lambda s: s.value,
)
def test_hierarchical_update_parity(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(env, stype), optim_kwargs={"eps": EPS}
    )
    states = sebc.shard_from_dense(dense)
    total_d = sum(t.embedding_dim * len(t.feature_names) for t in tables)
    d_values = np.random.RandomState(3).randn(B, total_d).astype(np.float32)
    new_states = jax.jit(sebc.update)(states, sb, jnp.asarray(d_values), LR)
    got = sebc.unshard_to_dense(new_states)
    col_shards = (
        env.local_size if stype is ShardingType.TABLE_COLUMN_WISE else 1
    )
    ref = _reference_update(tables, dense, sb, d_values, col_shards)
    for name in dense:
        np.testing.assert_allclose(
            got[name], ref[name], rtol=1e-4, atol=1e-5, err_msg=name
        )
