"""Reduced-precision (bf16/fp16) embedding tables.

ref: fbgemm weights_precision / torchrec DataType.FP16
(modules/embedding_configs.py:26, data_type_to_sparse_type :77) — tables
store in half precision, pooling accumulates fp32, optimizer state stays
fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_configs import DataType
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    ParameterSharding,
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
B, L, D, R = 16, 2, 16, 64
LR = 0.1


def _tables(dt):
    return (
        EmbeddingBagConfig(num_embeddings=R, embedding_dim=D, name="t0",
                           feature_names=["f0"], data_type=dt),
        EmbeddingBagConfig(num_embeddings=40, embedding_dim=D, name="t1",
                           feature_names=["f1"], data_type=dt),
    )


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    feats = ["f0", "f1"]
    rows = {"f0": R, "f1": 40}
    lengths = rng.randint(0, L + 1, size=(2 * B,)).astype(np.int32)
    vals = []
    for fi, f in enumerate(feats):
        for b in range(B):
            vals.extend(
                rng.randint(0, rows[f], size=(lengths[fi * B + b],)).tolist()
            )
    return KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(np.asarray(vals, np.int32)), jnp.asarray(lengths)
    ).to_padded(L)


@pytest.fixture(scope="module")
def env():
    return ShardingEnv.from_devices()


@pytest.mark.parametrize("dt", [DataType.BF16, DataType.FP16],
                         ids=lambda d: d.value)
@pytest.mark.parametrize("stype", [ShardingType.ROW_WISE,
                                   ShardingType.TABLE_WISE],
                         ids=lambda s: s.value)
def test_low_precision_matches_fp32_loosely(env, dt, stype):
    rng = np.random.RandomState(0)
    dense = {
        "t0": rng.randn(R, D).astype(np.float32),
        "t1": rng.randn(40, D).astype(np.float32),
    }
    sb = _batch()
    plan = {
        "t0": ParameterSharding(stype, ranks=[1] if stype is ShardingType.TABLE_WISE else None),
        "t1": ParameterSharding(stype, ranks=[4] if stype is ShardingType.TABLE_WISE else None),
    }

    outs = {}
    states_by_dt = {}
    ebcs = {}
    for cur in (DataType.FP32, dt):
        ebc = ShardedEmbeddingBagCollection(
            env, _tables(cur), plan, optim=EmbOptimType.ROWWISE_ADAGRAD
        )
        states = ebc.shard_from_dense(dense)
        # storage dtype actually honored
        want = {DataType.FP32: jnp.float32, DataType.BF16: jnp.bfloat16,
                DataType.FP16: jnp.float16}[cur]
        assert states[0].weights.dtype == want
        kt = jax.jit(ebc.forward)(states, sb)
        assert kt.values.dtype == jnp.float32  # fp32 accumulation contract
        outs[cur] = np.asarray(kt.values)
        states_by_dt[cur] = states
        ebcs[cur] = ebc

    np.testing.assert_allclose(
        outs[dt], outs[DataType.FP32], rtol=2e-2, atol=2e-2
    )

    # one update step stays close to the fp32 path
    d_vals = rng.randn(*outs[DataType.FP32].shape).astype(np.float32)
    got = {}
    for cur in (DataType.FP32, dt):
        new_states = jax.jit(ebcs[cur].update)(
            states_by_dt[cur], sb, jnp.asarray(d_vals), LR
        )
        got[cur] = {
            k: np.asarray(v, dtype=np.float32)
            for k, v in ebcs[cur].unshard_to_dense(new_states).items()
        }
    for name in dense:
        np.testing.assert_allclose(
            got[dt][name], got[DataType.FP32][name], rtol=3e-2, atol=3e-2
        )


def test_stochastic_rounding_preserves_tiny_updates():
    """SGD with updates far below bf16 ulp: stochastic rounding moves the
    weight in expectation; deterministic rounding loses it entirely
    (ref: fbgemm stochastic_rounding fused_param, the mechanism that
    makes half-precision embedding training converge)."""
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    R2, D2, steps = 8, 8, 300
    lr, gval = 0.01, 0.01  # per-step delta 1e-4 << bf16 ulp at 1.0 (~0.0078)
    ids = jnp.arange(R2, dtype=jnp.int32)
    grads = jnp.full((R2, D2), gval, jnp.float32)
    valid = jnp.ones((R2,), bool)

    def run(sr):
        w = jnp.ones((R2, D2), jnp.bfloat16)
        opt = init_fused_optimizer_state(R2, D2, EmbOptimType.SGD)
        for _ in range(steps):
            w, opt = apply_fused_update(
                w, opt, ids, grads, valid, lr, stochastic_rounding=sr
            )
        return np.asarray(w, dtype=np.float32)

    drift_det = 1.0 - run(False).mean()
    drift_sr = 1.0 - run(True).mean()
    expected = steps * lr * gval  # 0.03
    assert abs(drift_det) < 1e-6  # deterministic add loses every update
    assert 0.5 * expected < drift_sr < 1.5 * expected


def test_stochastic_round_primitive_unbiased():
    from torchrec_tpu.ops.fused_update import stochastic_round

    x = jnp.full((200, 128), 1.0 + 1e-3, jnp.float32)  # between bf16 grid pts
    out = stochastic_round(x, jnp.bfloat16, jax.random.PRNGKey(0))
    m = np.asarray(out, np.float32).mean()
    assert abs(m - (1.0 + 1e-3)) < 5e-4  # unbiased within sampling noise
    vals = np.unique(np.asarray(out, np.float32))
    assert len(vals) == 2  # rounds to the two neighbours only


def test_sequence_collection_bf16(env):
    """ShardedEmbeddingCollection with bf16 tables: per-token rows come
    back finite and close to the fp32 path."""
    from torchrec_tpu.modules import EmbeddingConfig
    from torchrec_tpu.parallel.sharded_ec import ShardedEmbeddingCollection

    rng = np.random.RandomState(0)
    dense = {"s0": rng.randn(50, D).astype(np.float32)}

    def build(dt):
        tabs = (EmbeddingConfig(num_embeddings=50, embedding_dim=D,
                                name="s0", feature_names=["f0"],
                                data_type=dt),)
        return ShardedEmbeddingCollection(
            env, tabs, {"s0": ParameterSharding(ShardingType.ROW_WISE)},
        )

    sb = _batch(2).select_features([0])
    outs = {}
    for dt in (DataType.FP32, DataType.BF16):
        ec = build(dt)
        states = ec.shard_from_dense(dense)
        rows = jax.jit(ec.forward)(states, sb)["f0"]
        outs[dt] = np.asarray(rows, np.float32)
        assert np.isfinite(outs[dt]).all()
    np.testing.assert_allclose(
        outs[DataType.BF16], outs[DataType.FP32], rtol=2e-2, atol=2e-2
    )
