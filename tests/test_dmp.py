"""DistributedModelParallel golden-parity tests.

ref test idea: torchrec/distributed/test_utils/test_model_parallel_base.py
:189-283 — sharded DMP model vs global unsharded model, state copied
shard-by-shard, one optimizer step each, predictions compared."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.models import DLRM, DLRMTrain
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
B = 16
L = 2
D = 16
DENSE_IN = 8
LR_EMB = 0.1
LR_DENSE = 0.05
EPS = 1e-8


def _tables():
    return tuple(
        EmbeddingBagConfig(
            num_embeddings=rows, embedding_dim=D, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i, rows in enumerate([120, 50, 64, 33])
    )


def _model():
    return DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=_tables(), max_feature_length=L
            ),
            dense_in_features=DENSE_IN,
            dense_arch_layer_sizes=(16, D),
            over_arch_layer_sizes=(16, 1),
        )
    )


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    tables = _tables()
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


def _plan(stype):
    if stype is ShardingType.TABLE_WISE:
        shards = {
            f"t{i}": ParameterSharding(stype, ranks=[(3 * i) % N_DEV])
            for i in range(4)
        }
    else:
        shards = {f"t{i}": ParameterSharding(stype) for i in range(4)}
    return ShardingPlan({"dlrm/embedding_bag_collection": shards})


def _prune_tables(params):
    """Remove EBC table leaves from an unsharded param tree."""
    import copy

    p = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    p = jax.tree_util.tree_map(lambda x: x, p)
    d = {k: dict(v) if isinstance(v, dict) else v for k, v in p.items()}
    d["dlrm"] = dict(d["dlrm"])
    d["dlrm"].pop("embedding_bag_collection")
    return d


def _rowwise_adagrad(w, g, col_shards=1):
    """Fresh-state rowwise adagrad; col_shards>1 emulates CW's independent
    per-column-shard momentum (virtual tables)."""
    w = np.asarray(w).copy()
    g = np.asarray(g)
    outs = []
    for gs, ws in zip(
        np.split(g, col_shards, axis=1), np.split(w, col_shards, axis=1)
    ):
        m = (gs**2).mean(axis=1)
        outs.append(ws - LR_EMB * gs / (np.sqrt(m)[:, None] + EPS))
    return np.concatenate(outs, axis=1)


def _reference_step(model, params, dense, sb, labels, col_shards=1):
    """One combined step on the unsharded model: SGD on dense params,
    rowwise-adagrad (fresh state) on embedding tables."""
    def loss_of(p):
        return model.apply({"params": p}, dense, sb, labels)

    (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(params)

    def upd(path, p, g):
        names = [getattr(k, "key", str(k)) for k in path]
        if "embedding_bag_collection" in names:
            return _rowwise_adagrad(p, g, col_shards)
        return p - LR_DENSE * g

    new_params = jax.tree_util.tree_map_with_path(upd, params, grads)
    return new_params, float(loss)


ALL_TYPES = [
    ShardingType.DATA_PARALLEL,
    ShardingType.ROW_WISE,
    ShardingType.TABLE_WISE,
    ShardingType.COLUMN_WISE,
]


@pytest.fixture(scope="module")
def env():
    assert jax.device_count() == N_DEV
    return ShardingEnv.from_devices()


@pytest.mark.parametrize("stype", ALL_TYPES, ids=lambda s: s.value)
def test_dmp_golden_parity_one_step(env, stype):
    model = _model()
    dense, sb, labels = _batch(0)

    # global unsharded golden model
    params = model.init(jax.random.PRNGKey(0), dense, sb, labels)["params"]

    dmp = DistributedModelParallel(
        model,
        env=env,
        plan=_plan(stype),
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": LR_EMB, "eps": EPS},
        dense_optimizer=optax.sgd(LR_DENSE),
    )
    state = dmp.init(jax.random.PRNGKey(1), dense, sb, labels)
    # copy golden state into the sharded model, shard by shard
    state = state.replace(dense_params=_prune_tables(params))
    tables = params["dlrm"]["embedding_bag_collection"]
    state = dmp.load_tables(
        state, {"dlrm/embedding_bag_collection": {
            k: np.asarray(v) for k, v in tables.items()
        }}
    )

    # parity BEFORE any step: forward must match the unsharded model
    loss0, (_, logits0, _) = dmp.forward(state, dense, sb, labels)
    ref_loss0, (_, ref_logits0, _) = model.apply(
        {"params": params}, dense, sb, labels
    )
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(ref_logits0), rtol=1e-4, atol=1e-5
    )

    # one training step each
    train_step = dmp.make_train_step(donate=False)
    new_state, loss, _ = train_step(state, dense, sb, labels)
    col_shards = N_DEV if stype is ShardingType.COLUMN_WISE else 1
    ref_params, ref_loss = _reference_step(
        model, params, dense, sb, labels, col_shards
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)

    # sharded table weights must match the golden update
    got_tables = dmp.state_dict(new_state)[
        "embeddings/dlrm/embedding_bag_collection"
    ]
    ref_tables = ref_params["dlrm"]["embedding_bag_collection"]
    for name in got_tables:
        np.testing.assert_allclose(
            got_tables[name], np.asarray(ref_tables[name]),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )

    # predictions after the step must match
    loss1, (_, logits1, _) = dmp.forward(new_state, dense, sb, labels)
    ref_loss1, (_, ref_logits1, _) = model.apply(
        {"params": ref_params}, dense, sb, labels
    )
    np.testing.assert_allclose(
        np.asarray(logits1), np.asarray(ref_logits1), rtol=1e-3, atol=1e-4
    )


def test_dmp_trains_loss_decreases(env):
    model = _model()
    dense, sb, labels = _batch(3)
    dmp = DistributedModelParallel(
        model,
        env=env,
        plan=_plan(ShardingType.ROW_WISE),
        fused_params={"learning_rate": 0.2},
        dense_optimizer=optax.sgd(0.1),
    )
    state = dmp.init(jax.random.PRNGKey(2), dense, sb, labels)
    train_step = dmp.make_train_step()
    losses = []
    for _ in range(40):
        state, loss, _ = train_step(state, dense, sb, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, (losses[0], losses[-1])


def test_dmp_default_plan(env):
    """No plan given: DMP falls back to RW-big / DP-small heuristic."""
    model = _model()
    dense, sb, labels = _batch(4)
    dmp = DistributedModelParallel(model, env=env)
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    loss, _ = dmp.forward(state, dense, sb, labels)[0], None
    assert np.isfinite(float(loss))


def test_dmp_plans_via_planner_when_no_plan_given():
    """ref: model_parallel.py:200-212 — DMP without an explicit plan runs
    the cost-model planner constrained by the module's sharder."""
    model = _model()
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        dense_optimizer=optax.sgd(0.1),
    )
    key = "dlrm/embedding_bag_collection"
    assert key in dmp.sharded_ebcs
    # planner assigned a concrete strategy per group and it runs
    rng = np.random.RandomState(0)
    tables = _tables()
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    vals = []
    for fi, f in enumerate(feats):
        for b in range(B):
            vals.extend(rng.randint(0, rows[f],
                                    size=(lengths[fi * B + b],)).tolist())
    from torchrec_tpu.sparse import KeyedJaggedTensor as KJT
    sb = KJT.from_lengths(
        feats, jnp.asarray(np.asarray(vals, np.int32)), jnp.asarray(lengths)
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray(np.zeros(B, np.float32))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    _, loss, _ = dmp.make_train_step(donate=False)(state, dense, sb, labels)
    assert np.isfinite(float(loss))


def test_fused_lr_schedule():
    """In-graph lr schedule for the fused optimizer (ref: TBE lr sync,
    batched_embedding_kernel.py:250-257 + the DLRM lr-change schedule)."""
    model = _model()
    calls = []

    def sched(step):
        calls.append(True)
        return jnp.where(step < 1, 1.0, 0.0)  # lr 1.0 on step 0, then 0

    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            t.name: ParameterSharding(ShardingType.ROW_WISE)
            for t in _tables()}}),
        fused_optim=EmbOptimType.SGD,
        fused_params={"learning_rate": 1.0, "lr_schedule": sched},
        dense_optimizer=optax.sgd(0.0),
    )
    rng = np.random.RandomState(0)
    tables = _tables()
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = np.ones((len(feats) * B,), np.int32)
    vals = []
    for fi, f in enumerate(feats):
        vals.extend(rng.randint(0, rows[f], size=(B,)).tolist())
    from torchrec_tpu.sparse import KeyedJaggedTensor as KJT
    sb = KJT.from_lengths(
        feats, jnp.asarray(np.asarray(vals, np.int32)), jnp.asarray(lengths)
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray(np.zeros(B, np.float32))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    step = dmp.make_train_step(donate=False)
    w0 = dmp.state_dict(state)["embeddings/dlrm/embedding_bag_collection"]

    state, _, _ = step(state, dense, sb, labels)  # step 0: lr 1.0
    w1 = dmp.state_dict(state)["embeddings/dlrm/embedding_bag_collection"]
    state, _, _ = step(state, dense, sb, labels)  # step 1: lr 0.0
    w2 = dmp.state_dict(state)["embeddings/dlrm/embedding_bag_collection"]

    moved = any(
        not np.array_equal(np.asarray(w1[k]), np.asarray(w0[k]))
        for k in w0
    )
    frozen = all(
        np.array_equal(np.asarray(w2[k]), np.asarray(w1[k])) for k in w1
    )
    assert calls, "schedule never evaluated"
    assert moved and frozen


def test_warmup_schedule_as_fused_lr_schedule():
    """optim.warmup schedules plug directly into the fused lr_schedule
    hook (the WarmupOptimizer-over-fused composition, ref warmup.py:78)."""
    from torchrec_tpu.optim.warmup import (
        WarmupPolicy,
        WarmupStage,
        make_warmup_schedule,
    )

    sched = make_warmup_schedule(
        # LINEAR ramps value -> 1.0 over the stage
        [WarmupStage(policy=WarmupPolicy.LINEAR, max_iters=4, value=0.1),
         WarmupStage(policy=WarmupPolicy.CONSTANT, max_iters=100, value=0.5)],
        base_lr=1.0,
    )
    model = _model()
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            t.name: ParameterSharding(ShardingType.ROW_WISE)
            for t in _tables()}}),
        fused_optim=EmbOptimType.SGD,
        fused_params={"learning_rate": 1.0, "lr_schedule": sched},
        dense_optimizer=optax.sgd(0.0),
    )
    # the schedule itself behaves (linear ramp then constant 0.5)
    assert float(sched(0)) < float(sched(3)) <= 1.0
    np.testing.assert_allclose(float(sched(50)), 0.5, rtol=1e-6)
    assert dmp.fused_lr_schedule is sched


def test_dmp_sharders_carry_fused_params():
    """ref: DMP(sharders=[EBCSharder(fused_params={lr})]) — the reference
    wires lr through the sharder (dlrm_main.py:524-535)."""
    from torchrec_tpu.parallel.sharders import EmbeddingBagCollectionSharder

    model = _model()
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            t.name: ParameterSharding(ShardingType.ROW_WISE)
            for t in _tables()}}),
        sharders=[EmbeddingBagCollectionSharder(
            fused_params={"learning_rate": 0.123})],
        dense_optimizer=optax.sgd(0.1),
    )
    assert dmp.learning_rate == 0.123
    # explicit fused_params win over sharder-provided
    dmp2 = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            t.name: ParameterSharding(ShardingType.ROW_WISE)
            for t in _tables()}}),
        sharders=[EmbeddingBagCollectionSharder(
            fused_params={"learning_rate": 0.123})],
        fused_params={"learning_rate": 0.5},
        dense_optimizer=optax.sgd(0.1),
    )
    assert dmp2.learning_rate == 0.5
