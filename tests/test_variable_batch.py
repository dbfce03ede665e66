"""Variable-batch (per-device batch size) parity tests.

ref: torchrec/distributed/sharding/vb_sharding.py,
vb_tw_sharding.py, vb_cw_sharding.py and the variable-batch KJT A2A
(dist_data.py:301-347). Here per-device ragged batches are padded to a
static budget with zero-length pad rows; parity is checked against an
eager unpadded reference over the union of real examples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagConfig
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    ParameterSharding,
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    ShardingType,
)
from torchrec_tpu.parallel.variable_batch import (
    VariableBatch,
    masked_bce_with_logits,
    masked_mean,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
SIZES = [3, 1, 4, 2, 5, 2, 3, 1]
L = 2
LR = 0.1
EPS = 1e-8


def _tables(dim=16):
    return (
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=dim, name="t0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=40, embedding_dim=dim, name="t1",
                           feature_names=["f1"]),
    )


def _ragged_parts(tables, seed=3):
    rng = np.random.RandomState(seed)
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    parts = []
    for b in SIZES:
        lengths = rng.randint(0, L + 1, size=(len(feats) * b,)).astype(np.int32)
        values = []
        for fi, f in enumerate(feats):
            for i in range(b):
                n = lengths[fi * b + i]
                values.extend(rng.randint(0, rows[f], size=(n,)).tolist())
        kjt = KeyedJaggedTensor.from_lengths(
            feats,
            jnp.asarray(np.asarray(values, np.int32)),
            jnp.asarray(lengths),
        )
        parts.append(kjt.to_padded(L))
    return parts


def _ref_pooled(tables, dense, part):
    ids = np.asarray(part.ids)
    lengths = np.asarray(part.lengths)
    b = part.batch_size
    outs = []
    fi = 0
    for t in tables:
        w = dense[t.name]
        for _ in t.feature_names:
            pooled = np.zeros((b, t.embedding_dim), np.float32)
            for i in range(b):
                for l in range(lengths[fi, i]):
                    pooled[i] += w[ids[fi, i, l]]
            outs.append(pooled)
            fi += 1
    return np.concatenate(outs, axis=1)


@pytest.fixture(scope="module")
def env():
    assert jax.device_count() == N_DEV
    return ShardingEnv.from_devices()


@pytest.mark.parametrize(
    "stype",
    [ShardingType.ROW_WISE, ShardingType.TABLE_WISE, ShardingType.COLUMN_WISE],
    ids=lambda s: s.value,
)
def test_variable_batch_forward_parity(env, stype):
    tables = _tables()
    rng = np.random.RandomState(0)
    dense = {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(np.float32)
        for t in tables
    }
    parts = _ragged_parts(tables)
    vb = VariableBatch.from_ragged(parts)
    assert vb.padded_batch_per_device == max(SIZES)
    np.testing.assert_array_equal(vb.batch_size_per_device, SIZES)

    plan = {
        t.name: ParameterSharding(
            stype,
            ranks=[i % N_DEV] if stype is ShardingType.TABLE_WISE else None,
        )
        for i, t in enumerate(tables)
    }
    sebc = ShardedEmbeddingBagCollection(
        env, tables, plan, optim=EmbOptimType.ROWWISE_ADAGRAD
    )
    states = sebc.shard_from_dense(dense)
    kt = jax.jit(sebc.forward)(states, vb.sparse)
    out = np.asarray(kt.values)

    B_pad = vb.padded_batch_per_device
    for d, part in enumerate(parts):
        ref = _ref_pooled(tables, dense, part)
        got = out[d * B_pad : d * B_pad + part.batch_size]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        pad = out[d * B_pad + part.batch_size : (d + 1) * B_pad]
        np.testing.assert_allclose(pad, 0.0, atol=1e-6)


def test_variable_batch_update_parity(env):
    tables = _tables()
    rng = np.random.RandomState(1)
    dense = {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(np.float32)
        for t in tables
    }
    parts = _ragged_parts(tables)
    vb = VariableBatch.from_ragged(parts)
    B_pad = vb.padded_batch_per_device
    total_dim = sum(t.embedding_dim for t in tables)

    # upstream cotangent: random on real rows, zero on pad rows (what any
    # example_mask-ed loss produces)
    d_vals = rng.randn(N_DEV * B_pad, total_dim).astype(np.float32)
    d_vals *= np.asarray(vb.example_mask)[:, None]

    plan = {t.name: ParameterSharding(ShardingType.ROW_WISE) for t in tables}
    sebc = ShardedEmbeddingBagCollection(
        env, tables, plan, optim=EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs={"eps": EPS},
    )
    states = sebc.shard_from_dense(dense)
    new_states = jax.jit(sebc.update)(
        states, vb.sparse, jnp.asarray(d_vals), LR
    )
    got = sebc.unshard_to_dense(new_states)

    # eager reference over the union of real examples
    grads = {k: np.zeros_like(v) for k, v in dense.items()}
    off = 0
    fi = 0
    for t in tables:
        D = t.embedding_dim
        for _ in t.feature_names:
            for d, part in enumerate(parts):
                ids = np.asarray(part.ids)
                lengths = np.asarray(part.lengths)
                for i in range(part.batch_size):
                    row = d * B_pad + i
                    for l in range(lengths[fi, i]):
                        grads[t.name][ids[fi, i, l]] += d_vals[row, off:off + D]
            off += D
            fi += 1
    for t in tables:
        g = grads[t.name]
        m = (g**2).mean(axis=1)
        ref = dense[t.name] - LR * g / (np.sqrt(m)[:, None] + EPS)
        np.testing.assert_allclose(got[t.name], ref, rtol=1e-4, atol=1e-5)


def test_masked_loss_helpers():
    logits = jnp.asarray([0.5, -1.0, 2.0, 3.0])
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    loss = masked_bce_with_logits(logits, labels, mask)
    z, y = np.asarray(logits[:3]), np.asarray(labels[:3])
    per = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
    np.testing.assert_allclose(loss, per.mean(), rtol=1e-6)
    np.testing.assert_allclose(
        masked_mean(jnp.asarray([1.0, 2.0, 3.0, 100.0]), mask), 2.0
    )
    # pad rows must produce zero gradient
    g = jax.grad(lambda z: masked_bce_with_logits(z, labels, mask))(logits)
    assert float(g[3]) == 0.0


def test_variable_batch_through_dmp(env):
    """VariableBatch composes with DistributedModelParallel: a masked-loss
    model trains on ragged per-device batches end-to-end."""
    import flax.linen as nn
    import optax

    from torchrec_tpu.modules import EmbeddingBagCollection
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ShardingPlan,
    )

    tables = _tables()

    class VbModel(nn.Module):
        """EBC + linear head with example-mask-aware BCE."""

        ebc: EmbeddingBagCollection

        @nn.compact
        def __call__(self, sb, labels, example_mask):
            kt = self.ebc(sb)
            logits = nn.Dense(1)(kt.values)[:, 0]
            loss = masked_bce_with_logits(logits, labels, example_mask)
            return loss, (loss, logits)

    model = VbModel(ebc=EmbeddingBagCollection(
        tables=tables, max_feature_length=L))
    parts = _ragged_parts(tables)
    rng = np.random.RandomState(5)
    labels = [
        (rng.rand(p.batch_size) > 0.5).astype(np.float32) for p in parts
    ]
    vb = VariableBatch.from_ragged(parts, label_parts=labels)
    plan = ShardingPlan({"ebc": {
        t.name: ParameterSharding(ShardingType.ROW_WISE) for t in tables}})
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_params={"learning_rate": 0.2},
        dense_optimizer=optax.adam(5e-2),
    )
    state = dmp.init(
        jax.random.PRNGKey(0), vb.sparse, vb.labels, vb.example_mask
    )
    step = dmp.make_train_step(donate=False)
    losses = []
    for _ in range(15):
        state, loss, _ = step(state, vb.sparse, vb.labels, vb.example_mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # learns through the padded vb batch
    # pad rows never leak gradients: logits on pads don't affect loss
    _, (_, logits) = dmp.forward(
        state, vb.sparse, vb.labels, vb.example_mask
    )
    assert np.isfinite(np.asarray(logits)).all()
