"""Cross-batch input-dist prefetch tests.

ref: torchrec/distributed/train_pipeline.py:422-536
(TrainPipelineSparseDist) — the reference pre-issues batch i+1's sparse
input dist on a side stream while batch i computes. Here the pre-gathered
ids are an extra output/input of one jitted step; these tests pin the
invariant that makes the redesign safe: *_from_dist and the prefetched
step are NUMERICALLY IDENTICAL to the direct paths (same collectives, one
batch earlier).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.models import DLRM, DLRMTrain
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    PoolingType,
)
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.parallel.train_pipeline import (
    SparseDistPipeline,
    TrainPipeline,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
B = 16
L = 2
D = 16
DENSE_IN = 8
LR = 0.1


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
    return {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(
            np.float32
        )
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
        feats, jnp.asarray(np.asarray(values, np.int32)),
        jnp.asarray(lengths),
        weights=None if weights is None else jnp.asarray(weights),
    )
    return kjt.to_padded(L)


def _plan(tables, sharding_type):
    if sharding_type is ShardingType.TABLE_WISE:
        return {
            t.name: ParameterSharding(sharding_type, ranks=[i % N_DEV])
            for i, t in enumerate(tables)
        }
    return {t.name: ParameterSharding(sharding_type) for t in tables}


@pytest.fixture(scope="module")
def env():
    return ShardingEnv.from_local(N_DEV)


MP_TYPES = [
    ShardingType.ROW_WISE,
    ShardingType.TABLE_WISE,
    ShardingType.COLUMN_WISE,
]


@pytest.mark.parametrize("stype", MP_TYPES, ids=lambda s: s.value)
@pytest.mark.parametrize("weighted", [False, True], ids=["plain", "psw"])
def test_forward_from_dist_matches_forward(env, stype, weighted):
    tables = _tables()
    ebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, stype), is_weighted=weighted,
        optim=EmbOptimType.ROWWISE_ADAGRAD,
    )
    states = ebc.shard_from_dense(_dense_weights(tables))
    sb = _batch(tables, weighted=weighted)
    direct = jax.jit(ebc.forward)(states, sb)
    dist = jax.jit(ebc.input_dist)(sb)
    assert all(d is not None for d in dist)  # flat MP groups all prefetch
    pre = jax.jit(lambda st, s, di: ebc.forward(st, s, dist=di))(
        states, sb, dist
    )
    np.testing.assert_array_equal(
        np.asarray(direct.values), np.asarray(pre.values)
    )


@pytest.mark.parametrize("stype", MP_TYPES, ids=lambda s: s.value)
@pytest.mark.parametrize("weighted", [False, True], ids=["plain", "psw"])
def test_update_from_dist_matches_update(env, stype, weighted):
    tables = _tables()
    ebc = ShardedEmbeddingBagCollection(
        env, tables, _plan(tables, stype), is_weighted=weighted,
        optim=EmbOptimType.ROWWISE_ADAGRAD,
    )
    states = ebc.shard_from_dense(_dense_weights(tables))
    sb = _batch(tables, weighted=weighted)
    d_values = jnp.asarray(
        np.random.RandomState(7).randn(
            B, sum(t.embedding_dim * len(t.feature_names) for t in tables)
        ).astype(np.float32)
    )
    direct = jax.jit(lambda st, s, d: ebc.update(st, s, d, LR))(
        states, sb, d_values
    )
    dist = jax.jit(ebc.input_dist)(sb)
    pre = jax.jit(lambda st, s, d, di: ebc.update(st, s, d, LR, dist=di))(
        states, sb, d_values, dist
    )
    for a, b in zip(
        jax.tree.leaves(direct), jax.tree.leaves(pre)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- hierarchical strategies (TWRW/TWCW), both routing modes ----------------


HIER_TYPES = [
    ShardingType.TABLE_ROW_WISE,
    ShardingType.TABLE_COLUMN_WISE,
]


@pytest.fixture(scope="module")
def henv():
    return ShardingEnv.from_devices(local_size=4)


def _hplan(henv, stype, tables):
    H = henv.num_hosts
    return {
        t.name: ParameterSharding(stype, host=i % H)
        for i, t in enumerate(tables)
    }


@pytest.mark.parametrize("stype", HIER_TYPES, ids=lambda s: s.value)
@pytest.mark.parametrize("routing", ["allgather", "a2a"])
@pytest.mark.parametrize("weighted", [False, True], ids=["plain", "psw"])
def test_hierarchical_from_dist_matches_direct(henv, stype, routing,
                                               weighted):
    tables = _tables()
    ebc = ShardedEmbeddingBagCollection(
        henv, tables, _hplan(henv, stype, tables), is_weighted=weighted,
        optim=EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs={"input_routing": routing},
    )
    states = ebc.shard_from_dense(_dense_weights(tables))
    sb = _batch(tables, weighted=weighted)
    dist = jax.jit(ebc.input_dist)(sb)
    assert all(d is not None for d in dist)

    direct_f = jax.jit(ebc.forward)(states, sb)
    pre_f = jax.jit(lambda st, s, di: ebc.forward(st, s, dist=di))(
        states, sb, dist
    )
    np.testing.assert_array_equal(
        np.asarray(direct_f.values), np.asarray(pre_f.values)
    )

    d_values = jnp.asarray(
        np.random.RandomState(3).randn(
            B, sum(t.embedding_dim * len(t.feature_names) for t in tables)
        ).astype(np.float32)
    )
    direct_u = jax.jit(lambda st, s, d: ebc.update(st, s, d, LR))(
        states, sb, d_values
    )
    pre_u = jax.jit(lambda st, s, d, di: ebc.update(st, s, d, LR, dist=di))(
        states, sb, d_values, dist
    )
    for a, b in zip(jax.tree.leaves(direct_u), jax.tree.leaves(pre_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- DMP-level: prefetched step == direct step over a mixed plan ------------


def _dmp_tables():
    return tuple(
        EmbeddingBagConfig(
            num_embeddings=rows, embedding_dim=D, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i, rows in enumerate([120, 50, 64, 33])
    )


def _dmp_model():
    return DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=_dmp_tables(), max_feature_length=L
            ),
            dense_in_features=DENSE_IN,
            dense_arch_layer_sizes=(16, D),
            over_arch_layer_sizes=(16, 1),
        )
    )


def _dmp_batch(seed=0):
    rng = np.random.RandomState(seed)
    tables = _dmp_tables()
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    values = np.concatenate(
        [
            rng.randint(0, rows[feats[i // B]], size=(lengths[i],))
            for i in range(len(lengths))
        ]
        + [np.zeros((0,), np.int64)]
    ).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(values), jnp.asarray(lengths)
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    return dense, sb, labels


def _mixed_plan():
    # t3 on DP exercises the in-step fallback inside a prefetched step
    stypes = [
        ShardingType.ROW_WISE,
        ShardingType.TABLE_WISE,
        ShardingType.COLUMN_WISE,
        ShardingType.DATA_PARALLEL,
    ]
    shards = {
        f"t{i}": (
            ParameterSharding(st, ranks=[2 * i % N_DEV])
            if st is ShardingType.TABLE_WISE
            else ParameterSharding(st)
        )
        for i, (st) in enumerate(stypes)
    }
    return ShardingPlan({"dlrm/embedding_bag_collection": shards})


def _make_dmp(env):
    import optax

    return DistributedModelParallel(
        module=_dmp_model(),
        env=env,
        plan=_mixed_plan(),
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": LR},
        dense_optimizer=optax.sgd(0.05),
    )


def test_prefetched_step_matches_direct(env):
    dmp = _make_dmp(env)
    state_a = dmp.init(jax.random.PRNGKey(0), *_dmp_batch(0))
    state_b = jax.tree.map(lambda x: x, state_a)

    step = dmp.make_train_step(donate=False)
    pstep = dmp.make_prefetched_train_step(donate=False)

    batches = [_dmp_batch(s) for s in range(4)]
    dists = jax.jit(dmp.input_dist)(batches[0][1])
    assert dists, "mixed plan must expose a prefetchable EBC module"
    losses_a, losses_b = [], []
    for i, args in enumerate(batches):
        state_a, loss_a, _ = step(state_a, *args)
        losses_a.append(float(loss_a))
        next_sb = batches[min(i + 1, len(batches) - 1)][1]
        state_b, loss_b, _, dists = pstep(state_b, dists, next_sb, *args)
        losses_b.append(float(loss_b))
    np.testing.assert_allclose(losses_a, losses_b, rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sparse_dist_pipeline_matches_train_pipeline(env):
    dmp = _make_dmp(env)
    # two independent inits from the same key: the donating steps delete
    # their input buffers, so the states must not share them
    state0 = dmp.init(jax.random.PRNGKey(0), *_dmp_batch(0))
    state_copy = dmp.init(jax.random.PRNGKey(0), *_dmp_batch(0))

    batches = [_dmp_batch(s) for s in range(5)]

    step_fn = dmp.make_train_step()
    direct = TrainPipeline(lambda s, b: step_fn(s, *b), state0)
    pipe = SparseDistPipeline(dmp, state_copy)

    it_a, it_b = iter(list(batches)), iter(list(batches))
    losses_a, losses_b = [], []
    while True:
        try:
            loss, _ = direct.progress(it_a)
        except StopIteration:
            break
        losses_a.append(float(loss))
    while True:
        try:
            loss, _ = pipe.progress(it_b)
        except StopIteration:
            break
        losses_b.append(float(loss))
    assert len(losses_a) == len(batches) == len(losses_b)
    np.testing.assert_allclose(losses_a, losses_b, rtol=0, atol=0)
    sd_a = dmp.state_dict(direct.state)
    sd_b = dmp.state_dict(pipe.state)
    flat_a = jax.tree.leaves(sd_a)
    flat_b = jax.tree.leaves(sd_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sparse_dist_pipeline_reusable_across_epochs(env):
    """Epoch boundary: a reused pipeline must re-prime from the NEW
    iterator's first batch, not consume the previous epoch's last-batch
    dist (regression: the primed dist was never invalidated)."""
    dmp = _make_dmp(env)
    state0 = dmp.init(jax.random.PRNGKey(0), *_dmp_batch(0))
    state_copy = dmp.init(jax.random.PRNGKey(0), *_dmp_batch(0))

    epoch1 = [_dmp_batch(s) for s in range(3)]
    epoch2 = [_dmp_batch(s) for s in range(10, 13)]

    step_fn = dmp.make_train_step()
    direct = TrainPipeline(lambda s, b: step_fn(s, *b), state0)
    pipe = SparseDistPipeline(dmp, state_copy)

    losses_a, losses_b = [], []
    for epoch in (epoch1, epoch2):
        it_a, it_b = iter(list(epoch)), iter(list(epoch))
        while True:
            try:
                losses_a.append(float(direct.progress(it_a)[0]))
            except StopIteration:
                break
        while True:
            try:
                losses_b.append(float(pipe.progress(it_b)[0]))
            except StopIteration:
                break
    assert len(losses_a) == 6 == len(losses_b)
    np.testing.assert_allclose(losses_a, losses_b, rtol=0, atol=0)


def _run_sequence_ec_parity(env, plan, optim_kwargs=None):
    from torchrec_tpu.modules import EmbeddingConfig
    from torchrec_tpu.parallel.sharded_ec import ShardedEmbeddingCollection

    SL = 4
    tables = (
        EmbeddingConfig(num_embeddings=50, embedding_dim=D, name="items",
                        feature_names=["item"]),
        EmbeddingConfig(num_embeddings=30, embedding_dim=D, name="cats",
                        feature_names=["cat"]),
    )
    plan = plan(tables)
    ec = ShardedEmbeddingCollection(
        env, tables, plan, optim=EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs=optim_kwargs,
    )
    rng = np.random.RandomState(5)
    states = ec.shard_from_dense({
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(
            np.float32
        )
        for t in tables
    })
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, SL + 1, size=(len(feats) * B,)).astype(np.int32)
    vals = np.concatenate(
        [rng.randint(0, rows[feats[i // B]], size=(lengths[i],))
         for i in range(len(lengths))] + [np.zeros((0,))]
    ).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(SL)

    dist = jax.jit(ec.input_dist)(sb)
    assert all(d is not None for d in dist)
    direct_f = jax.jit(ec.forward_stacked)(states, sb)
    pre_f = jax.jit(lambda st, s, di: ec.forward_stacked(st, s, dist=di))(
        states, sb, dist
    )
    np.testing.assert_array_equal(np.asarray(direct_f), np.asarray(pre_f))

    d_tokens = jnp.asarray(
        rng.randn(len(feats), B, SL, D).astype(np.float32)
    )
    direct_u = jax.jit(
        lambda st, s, d: ec.update_stacked(st, s, d, LR)
    )(states, sb, d_tokens)
    pre_u = jax.jit(
        lambda st, s, d, di: ec.update_stacked(st, s, d, LR, dist=di)
    )(states, sb, d_tokens, dist)
    for a, b in zip(jax.tree.leaves(direct_u), jax.tree.leaves(pre_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "stype",
    [ShardingType.ROW_WISE, ShardingType.TABLE_WISE],
    ids=lambda s: s.value,
)
def test_sequence_ec_from_dist_matches_direct(env, stype):
    """Token-level from_dist parity on the sharded EmbeddingCollection."""
    def plan(tables):
        if stype is ShardingType.TABLE_WISE:
            return {"items": ParameterSharding(stype, ranks=[1]),
                    "cats": ParameterSharding(stype, ranks=[6])}
        return {t.name: ParameterSharding(stype) for t in tables}

    _run_sequence_ec_parity(env, plan)


@pytest.mark.parametrize("routing", ["allgather", "a2a"])
def test_sequence_hierarchical_from_dist_matches_direct(henv, routing):
    """Hierarchical sequence (host-pinned TWRW tokens), both routing
    modes — the routed a2a dist now works through the sequence path."""
    def plan(tables):
        H = henv.num_hosts
        return {
            t.name: ParameterSharding(
                ShardingType.TABLE_ROW_WISE, host=i % H
            )
            for i, t in enumerate(tables)
        }

    _run_sequence_ec_parity(henv, plan,
                            optim_kwargs={"input_routing": routing})


def test_dmp_ec_prefetched_step_matches_direct(env):
    """DMP-level EC prefetch: an EmbeddingCollection model's dist must
    flow through make_prefetched_train_step bit-exactly (pins
    dmp._dist_keys including kind 'ec' and the dist= pass-through in the
    EC forward/update dispatch — the EC parity tests above call the
    sharded module directly and never exercise the DMP plumbing)."""
    import optax

    from torchrec_tpu.models.bert4rec import (
        BERT4Rec,
        BERT4RecTrain,
        make_item_embedding_collection,
    )

    SL = 4
    model = BERT4RecTrain(
        model=BERT4Rec(vocab_size=60, max_len=SL, emb_dim=D, nhead=4,
                       num_layers=1, dropout=0.0,
                       ec=make_item_embedding_collection(60, D, SL))
    )

    def make_batch(seed):
        r = np.random.RandomState(seed)
        lengths = np.full((B,), SL, np.int32)
        vals = r.randint(1, 60, size=(B * SL,)).astype(np.int32)
        sb = KeyedJaggedTensor.from_lengths(
            ["item"], jnp.asarray(vals), jnp.asarray(lengths)
        ).to_padded(SL)
        return sb, jnp.asarray(np.asarray(sb.ids[0, :, :]))

    plan = ShardingPlan({"model/ec": {
        "item_embedding": ParameterSharding(ShardingType.ROW_WISE)}})
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_params={"learning_rate": LR},
        dense_optimizer=optax.adam(1e-2),
    )
    assert dmp._dist_keys(), "EC module must be prefetchable through DMP"

    sb0, lab0 = make_batch(0)
    state_a = dmp.init(jax.random.PRNGKey(0), sb0, lab0)
    state_b = jax.tree.map(lambda x: x, state_a)

    step = dmp.make_train_step(donate=False)
    pstep = dmp.make_prefetched_train_step(donate=False)
    batches = [make_batch(s) for s in range(4)]
    dists = jax.jit(dmp.input_dist)(batches[0][0])
    assert any(
        d is not None for groups in dists.values() for d in groups
    ), "EC dist must contain a prefetched group batch"
    losses_a, losses_b = [], []
    for i, args in enumerate(batches):
        state_a, loss_a, _ = step(state_a, *args)
        losses_a.append(float(loss_a))
        next_sb = batches[min(i + 1, len(batches) - 1)][0]
        state_b, loss_b, _, dists = pstep(state_b, dists, next_sb, *args)
        losses_b.append(float(loss_b))
    np.testing.assert_allclose(losses_a, losses_b, rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sequence_strategy_input_dist_flags(env, henv):
    """A sequence strategy may only advertise input_dist support when it
    defines its OWN token-level *_from_dist bodies below every POOLED
    strategy class in its MRO (the inherited pooled bodies would be
    silently wrong from the prefetch path). Structural over the factory
    REGISTRY and over live instances, so dynamically-created classes
    (the TwRw sequence __new__ _Impl) and future registry entries are
    covered, not just a hand-picked class list."""
    from torchrec_tpu.modules import EmbeddingConfig
    from torchrec_tpu.parallel.hierarchical_strategies import (
        TwCwEmbeddingSharding,
        TwRwEmbeddingSharding,
    )
    from torchrec_tpu.parallel.sequence_strategies import (
        SEQUENCE_STRATEGY_REGISTRY,
    )
    from torchrec_tpu.parallel.sharded_ec import ShardedEmbeddingCollection
    from torchrec_tpu.parallel.strategies import (
        BaseEmbeddingShardingStrategy,
        CwEmbeddingSharding,
        DpEmbeddingSharding,
        RwEmbeddingSharding,
        TwEmbeddingSharding,
    )

    POOLED = (
        BaseEmbeddingShardingStrategy,
        DpEmbeddingSharding,
        RwEmbeddingSharding,
        TwEmbeddingSharding,
        CwEmbeddingSharding,
        TwRwEmbeddingSharding,
        TwCwEmbeddingSharding,
    )
    tables = (
        EmbeddingConfig(num_embeddings=32, embedding_dim=D, name="t",
                        feature_names=["f"]),
    )
    supported = 0
    for stype in SEQUENCE_STRATEGY_REGISTRY:
        hier = stype in (ShardingType.TABLE_ROW_WISE,
                         ShardingType.TABLE_COLUMN_WISE)
        e = henv if hier else env
        if hier:
            ps = ParameterSharding(stype, host=0)
        elif stype is ShardingType.TABLE_WISE:
            ps = ParameterSharding(stype, ranks=[1])
        else:
            ps = ParameterSharding(stype)
        ec = ShardedEmbeddingCollection(e, tables, {"t": ps})
        (strat,) = ec.strategies
        if not strat.supports_input_dist:
            continue
        supported += 1
        for name in ("forward_from_dist", "update_from_dist"):
            defining = next(
                c for c in type(strat).__mro__ if name in vars(c)
            )
            assert defining not in POOLED, (
                f"{type(strat).__name__} ({stype.value}) advertises "
                f"input_dist but inherits the POOLED {name} from "
                f"{defining.__name__}"
            )
    assert supported >= 3  # RW, TW and the hierarchical wrapper
