"""Golden-parity tests for ShardedEmbeddingBagCollection.

ref test idea: torchrec/distributed/test_utils/test_model_parallel_base.py
:189-283 — build a global unsharded model and a sharded copy, copy state,
run one optimizer step on each, gather sharded outputs, assert allclose.
Here the "multi-process + NCCL/Gloo" harness is a virtual 8-device CPU
mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagConfig, PoolingType
from torchrec_tpu.ops.fused_update import EmbOptimType
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
LR = 0.1
EPS = 1e-8


def _tables(dim=16):
    return (
        EmbeddingBagConfig(num_embeddings=100, embedding_dim=dim, name="t0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=37, embedding_dim=dim, name="t1",
                           feature_names=["f1", "f2"]),
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=dim, name="t2",
                           feature_names=["f3"], pooling=PoolingType.MEAN),
    )


def _dense_weights(tables, seed=0):
    rng = np.random.RandomState(seed)
    return {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(np.float32)
        for t in tables
    }


def _batch(tables, seed=1, weighted=False):
    rng = np.random.RandomState(seed)
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    values = []
    for fi, f in enumerate(feats):
        for b in range(B):
            n = lengths[fi * B + b]
            values.extend(rng.randint(0, rows[f], size=(n,)).tolist())
    weights = rng.rand(len(values)).astype(np.float32) if weighted else None
    kjt = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(np.asarray(values, np.int32)), jnp.asarray(lengths),
        weights=None if weights is None else jnp.asarray(weights),
    )
    return kjt.to_padded(L)


def _reference_forward(tables, dense, sb):
    """Eager numpy pooled lookup [B, sum(D)] in canonical feature order."""
    ids = np.asarray(sb.ids)
    lengths = np.asarray(sb.lengths)
    psw = None if sb.weights is None else np.asarray(sb.weights)
    outs = []
    fi = 0
    for t in tables:
        w = dense[t.name]
        for _ in t.feature_names:
            pooled = np.zeros((B, t.embedding_dim), np.float32)
            for b in range(B):
                for l in range(lengths[fi, b]):
                    c = 1.0 if psw is None else psw[fi, b, l]
                    pooled[b] += c * w[ids[fi, b, l]]
                if t.pooling == PoolingType.MEAN and lengths[fi, b] > 0:
                    pooled[b] /= lengths[fi, b]
            outs.append(pooled)
            fi += 1
    return np.concatenate(outs, axis=1)


def _reference_update(tables, dense, sb, d_values, col_shards=1):
    """Eager rowwise-adagrad with fresh state; col_shards>1 emulates the
    CW-shards-as-virtual-tables momentum semantics."""
    ids = np.asarray(sb.ids)
    lengths = np.asarray(sb.lengths)
    psw = None if sb.weights is None else np.asarray(sb.weights)
    new = {k: v.copy() for k, v in dense.items()}
    off = 0
    fi = 0
    grads = {k: np.zeros_like(v) for k, v in dense.items()}
    for t in tables:
        D = t.embedding_dim
        for _ in t.feature_names:
            dp = d_values[:, off : off + D]
            for b in range(B):
                for l in range(lengths[fi, b]):
                    c = 1.0 if psw is None else psw[fi, b, l]
                    if t.pooling == PoolingType.MEAN:
                        c = c / lengths[fi, b]
                    grads[t.name][ids[fi, b, l]] += c * dp[b]
            off += D
            fi += 1
    for t in tables:
        g = grads[t.name]
        for gs, ws in zip(
            np.split(g, col_shards, axis=1),
            np.split(new[t.name], col_shards, axis=1),
        ):
            m = (gs**2).mean(axis=1)
            ws -= LR * gs / (np.sqrt(m)[:, None] + EPS)
    return new


def _plan(tables, sharding_type):
    if sharding_type is ShardingType.TABLE_WISE:
        return {
            t.name: ParameterSharding(sharding_type, ranks=[i % N_DEV])
            for i, t in enumerate(tables)
        }
    return {t.name: ParameterSharding(sharding_type) for t in tables}


ALL_TYPES = [
    ShardingType.DATA_PARALLEL,
    ShardingType.ROW_WISE,
    ShardingType.TABLE_WISE,
    ShardingType.COLUMN_WISE,
]


@pytest.fixture(scope="module")
def env():
    assert jax.device_count() == N_DEV, jax.devices()
    return ShardingEnv.from_devices()


@pytest.mark.parametrize("stype", ALL_TYPES, ids=lambda s: s.value)
def test_forward_parity(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, stype), optim=EmbOptimType.ROWWISE_ADAGRAD
    )
    states = sebc.shard_from_dense(dense)
    kt = jax.jit(sebc.forward)(states, sb)
    ref = _reference_forward(tables, dense, sb)
    np.testing.assert_allclose(np.asarray(kt.values), ref, rtol=1e-4, atol=1e-5)
    assert kt.keys == ("f0", "f1", "f2", "f3")


@pytest.mark.parametrize("stype", ALL_TYPES, ids=lambda s: s.value)
def test_shard_unshard_roundtrip(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sebc = ShardedEmbeddingBagCollection(env, tables, _plan(tables, stype))
    states = sebc.shard_from_dense(dense)
    back = sebc.unshard_to_dense(states)
    for name, w in dense.items():
        np.testing.assert_allclose(back[name], w, rtol=1e-6)


@pytest.mark.parametrize("stype", ALL_TYPES, ids=lambda s: s.value)
def test_update_parity(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, stype),
        optim=EmbOptimType.ROWWISE_ADAGRAD, optim_kwargs={"eps": EPS},
    )
    states = sebc.shard_from_dense(dense)
    total_d = sum(t.embedding_dim * len(t.feature_names) for t in tables)
    d_values = np.random.RandomState(3).randn(B, total_d).astype(np.float32)
    new_states = jax.jit(sebc.update)(
        states, sb, jnp.asarray(d_values), LR
    )
    got = sebc.unshard_to_dense(new_states)
    col_shards = N_DEV if stype is ShardingType.COLUMN_WISE else 1
    ref = _reference_update(tables, dense, sb, d_values, col_shards)
    for name in dense:
        np.testing.assert_allclose(
            got[name], ref[name], rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_mixed_plan_forward_and_update(env):
    tables = _tables()
    plan = {
        "t0": ParameterSharding(ShardingType.ROW_WISE),
        "t1": ParameterSharding(ShardingType.TABLE_WISE, ranks=[3]),
        "t2": ParameterSharding(ShardingType.DATA_PARALLEL),
    }
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, plan, optim_kwargs={"eps": EPS}
    )
    states = sebc.shard_from_dense(dense)
    kt = jax.jit(sebc.forward)(states, sb)
    ref = _reference_forward(tables, dense, sb)
    np.testing.assert_allclose(np.asarray(kt.values), ref, rtol=1e-4, atol=1e-5)
    # output order must follow canonical declaration order despite grouping
    assert kt.keys == ("f0", "f1", "f2", "f3")

    total_d = kt.values.shape[1]
    d_values = np.random.RandomState(5).randn(B, total_d).astype(np.float32)
    new_states = jax.jit(sebc.update)(states, sb, jnp.asarray(d_values), LR)
    got = sebc.unshard_to_dense(new_states)
    ref_w = _reference_update(tables, dense, sb, d_values)
    for name in dense:
        np.testing.assert_allclose(
            got[name], ref_w[name], rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_weighted_forward_parity(env):
    tables = (
        EmbeddingBagConfig(num_embeddings=50, embedding_dim=8, name="w0",
                           feature_names=["wf0"]),
        EmbeddingBagConfig(num_embeddings=30, embedding_dim=8, name="w1",
                           feature_names=["wf1"]),
    )
    dense = _dense_weights(tables)
    sb = _batch(tables, weighted=True)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, ShardingType.ROW_WISE), is_weighted=True
    )
    states = sebc.shard_from_dense(dense)
    kt = jax.jit(sebc.forward)(states, sb)
    ref = _reference_forward(tables, dense, sb)
    np.testing.assert_allclose(np.asarray(kt.values), ref, rtol=1e-4, atol=1e-5)


def test_sgd_update_parity(env):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, ShardingType.ROW_WISE),
        optim=EmbOptimType.SGD,
    )
    states = sebc.shard_from_dense(dense)
    total_d = sum(t.embedding_dim * len(t.feature_names) for t in tables)
    d_values = np.random.RandomState(7).randn(B, total_d).astype(np.float32)
    new_states = jax.jit(sebc.update)(states, sb, jnp.asarray(d_values), LR)
    got = sebc.unshard_to_dense(new_states)
    # SGD reference: w -= lr * dense_grad
    ids = np.asarray(sb.ids); lengths = np.asarray(sb.lengths)
    ref = {k: v.copy() for k, v in dense.items()}
    off = 0; fi = 0
    for t in tables:
        D = t.embedding_dim
        for _ in t.feature_names:
            dp = d_values[:, off:off + D]
            for b in range(B):
                for l in range(lengths[fi, b]):
                    c = 1.0 / lengths[fi, b] if t.pooling == PoolingType.MEAN else 1.0
                    ref[t.name][ids[fi, b, l]] -= LR * c * dp[b]
            off += D; fi += 1
    for name in dense:
        np.testing.assert_allclose(got[name], ref[name], rtol=1e-4, atol=1e-5,
                                   err_msg=name)


def test_weighted_update_parity(env):
    """Per-sample-weighted pooling chains through the fused update: the
    row gradient is psw * d_pooled (ref: weighted TBE backward)."""
    tables = (
        EmbeddingBagConfig(num_embeddings=50, embedding_dim=8, name="w0",
                           feature_names=["wf0"]),
        EmbeddingBagConfig(num_embeddings=30, embedding_dim=8, name="w1",
                           feature_names=["wf1"]),
    )
    dense = _dense_weights(tables)
    sb = _batch(tables, weighted=True)
    sebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, ShardingType.ROW_WISE), is_weighted=True,
        optim=EmbOptimType.ROWWISE_ADAGRAD, optim_kwargs={"eps": EPS},
    )
    states = sebc.shard_from_dense(dense)
    rng = np.random.RandomState(9)
    d_vals = rng.randn(B, 16).astype(np.float32)
    new_states = jax.jit(sebc.update)(states, sb, jnp.asarray(d_vals), LR)
    got = sebc.unshard_to_dense(new_states)

    ids = np.asarray(sb.ids)
    lengths = np.asarray(sb.lengths)
    psw = np.asarray(sb.weights)
    off = 0
    for fi, t in enumerate(tables):
        D = t.embedding_dim
        g = np.zeros_like(dense[t.name])
        for b in range(B):
            for l in range(lengths[fi, b]):
                g[ids[fi, b, l]] += psw[fi, b, l] * d_vals[b, off:off + D]
        m = (g**2).mean(axis=1)
        ref_w = dense[t.name] - LR * g / (np.sqrt(m)[:, None] + EPS)
        np.testing.assert_allclose(got[t.name], ref_w, rtol=1e-4, atol=1e-5)
        off += D
