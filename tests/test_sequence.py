"""Sequence-sharding + BERT4Rec tests (ref:
torchrec/distributed/tests/test_sequence_model_parallel.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.modules import EmbeddingConfig
from torchrec_tpu.models.bert4rec import BERT4Rec, BERT4RecTrain
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.parallel.sharded_ec import ShardedEmbeddingCollection
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
B = 16
L = 4
D = 16
LR = 0.1
EPS = 1e-8

SEQ_TYPES = [
    ShardingType.DATA_PARALLEL,
    ShardingType.ROW_WISE,
    ShardingType.TABLE_WISE,
]


def _tables():
    return (
        EmbeddingConfig(num_embeddings=50, embedding_dim=D, name="items",
                        feature_names=["item"]),
        EmbeddingConfig(num_embeddings=30, embedding_dim=D, name="cats",
                        feature_names=["cat"]),
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


def _plan(stype):
    if stype is ShardingType.TABLE_WISE:
        return {"items": ParameterSharding(stype, ranks=[1]),
                "cats": ParameterSharding(stype, ranks=[6])}
    return {t: ParameterSharding(stype) for t in ("items", "cats")}


def _reference_tokens(tables, dense, sb):
    ids = np.asarray(sb.ids)
    lengths = np.asarray(sb.lengths)
    out = {}
    fi = 0
    for t in tables:
        for f in t.feature_names:
            rows = np.zeros((B, L, t.embedding_dim), np.float32)
            for b in range(B):
                for l in range(lengths[fi, b]):
                    rows[b, l] = dense[t.name][ids[fi, b, l]]
            out[f] = rows
            fi += 1
    return out


@pytest.fixture(scope="module")
def env():
    assert jax.device_count() == N_DEV
    return ShardingEnv.from_devices()


@pytest.mark.parametrize("stype", SEQ_TYPES, ids=lambda s: s.value)
def test_sequence_forward_parity(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sec = ShardedEmbeddingCollection(env, tables, _plan(stype))
    states = sec.shard_from_dense(dense)
    out = jax.jit(sec.forward)(states, sb)
    ref = _reference_tokens(tables, dense, sb)
    for f in ("item", "cat"):
        np.testing.assert_allclose(
            np.asarray(out[f]), ref[f], rtol=1e-4, atol=1e-5, err_msg=f
        )


@pytest.mark.parametrize("stype", SEQ_TYPES, ids=lambda s: s.value)
def test_sequence_update_parity(env, stype):
    tables = _tables()
    dense = _dense_weights(tables)
    sb = _batch(tables)
    sec = ShardedEmbeddingCollection(
        env, tables, _plan(stype), optim_kwargs={"eps": EPS}
    )
    states = sec.shard_from_dense(dense)
    rng = np.random.RandomState(3)
    d_tokens = {
        f: jnp.asarray(rng.randn(B, L, D).astype(np.float32))
        for f in ("item", "cat")
    }
    new_states = jax.jit(sec.update)(states, sb, d_tokens, LR)
    got = sec.unshard_to_dense(new_states)

    # eager reference: accumulate per-row grads (masked), rowwise adagrad
    ids = np.asarray(sb.ids); lengths = np.asarray(sb.lengths)
    fi = 0
    ref = {k: v.copy() for k, v in dense.items()}
    for t in tables:
        for f in t.feature_names:
            g = np.zeros_like(dense[t.name])
            for b in range(B):
                for l in range(lengths[fi, b]):
                    g[ids[fi, b, l]] += np.asarray(d_tokens[f][b, l])
            m = (g**2).mean(axis=1)
            ref[t.name] -= LR * g / (np.sqrt(m)[:, None] + EPS)
            fi += 1
    for name in ref:
        np.testing.assert_allclose(
            got[name], ref[name], rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_bert4rec_forward_shape():
    model = BERT4Rec(vocab_size=60, max_len=L, emb_dim=D, nhead=4,
                     num_layers=2)
    sb = _batch(_tables()[:1]).select_features([0])
    params = model.init(jax.random.PRNGKey(0), sb)
    logits = model.apply(params, sb)
    assert logits.shape == (B, L, 60)
    assert np.isfinite(np.asarray(logits)).all()


def test_bert4rec_dmp_trains(env):
    """BERT4Rec with its item table RW-sharded through DMP learns."""
    from torchrec_tpu.models.bert4rec import make_item_embedding_collection

    model = BERT4RecTrain(
        model=BERT4Rec(vocab_size=60, max_len=L, emb_dim=D, nhead=4,
                       num_layers=1, dropout=0.0,
                       ec=make_item_embedding_collection(60, D, L))
    )
    rng = np.random.RandomState(0)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        lengths = np.full((B,), L, np.int32)
        vals = r.randint(1, 60, size=(B * L,)).astype(np.int32)
        sb = KeyedJaggedTensor.from_lengths(
            ["item"], jnp.asarray(vals), jnp.asarray(lengths)
        ).to_padded(L)
        labels = np.asarray(sb.ids[0, :, :])  # predict input (toy task)
        return sb, jnp.asarray(labels)

    sb, labels = make_batch(0)
    plan = ShardingPlan({"model/ec": {
        "item_embedding": ParameterSharding(ShardingType.ROW_WISE)}})
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_params={"learning_rate": 0.5},
        dense_optimizer=optax.adam(1e-2),
    )
    state = dmp.init(jax.random.PRNGKey(0), sb, labels)
    step = dmp.make_train_step(donate=False)
    losses = []
    for i in range(30):
        s, lab = make_batch(i % 4)
        state, loss, _ = step(state, s, lab)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, (losses[0], losses[-1])


def test_ec_state_dict_roundtrip(env):
    """DMP state_dict/load_tables covers EmbeddingCollection modules too
    (ref: model_parallel.py:392-456 flat original-FQN state dicts)."""
    import optax

    from torchrec_tpu.models.bert4rec import make_item_embedding_collection
    from torchrec_tpu.parallel import DistributedModelParallel, ShardingPlan

    model = BERT4RecTrain(
        model=BERT4Rec(vocab_size=40, max_len=L, emb_dim=D, nhead=2,
                       num_layers=1, dropout=0.0,
                       ec=make_item_embedding_collection(40, D, L))
    )
    rng = np.random.RandomState(0)
    lengths = np.full((B,), L, np.int32)
    vals = rng.randint(1, 40, size=(B * L,)).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        ["item"], jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)
    labels = jnp.asarray(np.asarray(sb.ids[0]))
    plan = ShardingPlan({"model/ec": {
        "item_embedding": ParameterSharding(ShardingType.ROW_WISE)}})
    dmp = DistributedModelParallel(
        model, env=env, plan=plan, dense_optimizer=optax.adam(1e-3))
    state = dmp.init(jax.random.PRNGKey(0), sb, labels)
    sd = dmp.state_dict(state)
    assert "embeddings/model/ec" in sd
    w = sd["embeddings/model/ec"]["item_embedding"]
    assert w.shape[0] >= 40  # positional rows may extend the table

    # perturb + reload by key
    w2 = {"item_embedding": np.asarray(w) + 1.0}
    state2 = dmp.load_tables(state, {"model/ec": w2})
    back = dmp.state_dict(state2)["embeddings/model/ec"]["item_embedding"]
    np.testing.assert_allclose(np.asarray(back), w2["item_embedding"],
                               rtol=1e-6)


@pytest.mark.parametrize("routing", ["allgather", "a2a"])
def test_sequence_twrw_parity(routing):
    """Hierarchical (TWRW) sequence sharding: per-token rows match the
    unsharded reference, and the fused update matches eager rowwise
    adagrad (ref: test_sequence_model_parallel_hierarchical.py).
    Absolute reference under BOTH routing modes — the from_dist parity
    tests compare direct-vs-dist with the SAME routing, so a routing bug
    shared by both paths would slip through them."""
    env4 = ShardingEnv.from_devices(local_size=4)  # 2 hosts x 4
    tables = _tables()
    sec = ShardedEmbeddingCollection(
        env4, tables,
        {t.name: ParameterSharding(ShardingType.TABLE_ROW_WISE,
                                   host=i % 2)
         for i, t in enumerate(tables)},
        optim_kwargs={"eps": 1e-8, "input_routing": routing},
    )
    rng = np.random.RandomState(0)
    dense = {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(
            np.float32)
        for t in tables
    }
    states = sec.shard_from_dense(dense)
    sb = _batch(tables)
    rows = jax.jit(sec.forward)(states, sb)

    ids = np.asarray(sb.ids)
    lengths = np.asarray(sb.lengths)
    feats = [f for t in tables for f in t.feature_names]
    f2t = {f: t for t in tables for f in t.feature_names}
    # NOTE: jit sorts dict output keys; index by feature name, not order
    for fi, f in enumerate(feats):
        t = f2t[f]
        got = np.asarray(rows[f])
        ref = np.zeros_like(got)
        for b in range(got.shape[0]):
            for l in range(lengths[fi, b]):
                ref[b, l] = dense[t.name][ids[fi, b, l]]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # one update step vs eager rowwise adagrad
    d_tokens = {
        f: jnp.asarray(rng.randn(*rows[f].shape).astype(np.float32))
        for f in feats
    }
    new_states = jax.jit(sec.update)(states, sb, d_tokens, 0.1)
    got_w = {}
    for s, st in zip(sec.strategies, new_states):
        got_w.update(s.unshard_to_dense(st.weights))
    for fi, f in enumerate(feats):
        t = f2t[f]
        g = np.zeros_like(dense[t.name])
        d = np.asarray(d_tokens[f])
        for b in range(d.shape[0]):
            for l in range(lengths[fi, b]):
                g[ids[fi, b, l]] += d[b, l]
        m = (g**2).mean(axis=1)
        ref_w = dense[t.name] - 0.1 * g / (np.sqrt(m)[:, None] + 1e-8)
        np.testing.assert_allclose(
            np.asarray(got_w[t.name], np.float32), ref_w,
            rtol=1e-4, atol=1e-5,
        )
