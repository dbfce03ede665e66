"""Optimizer stack + checkpoint tests (ref: torchrec/optim/tests/*)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.optim import (
    GradientClipping,
    KeyedOptimizer,
    WarmupPolicy,
    WarmupStage,
    gradient_clipping,
    make_warmup_schedule,
    warmup_optimizer,
)
from torchrec_tpu.optim.keyed import flatten_with_fqns, unflatten_from_fqns


def _params():
    return {"mlp": {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}}


def test_flatten_fqns_roundtrip():
    p = _params()
    flat = flatten_with_fqns(p)
    assert set(flat) == {"mlp/w", "mlp/b"}
    back = unflatten_from_fqns(p, flat)
    np.testing.assert_array_equal(np.asarray(back["mlp"]["w"]), 1.0)


def test_unflatten_strict_errors():
    p = _params()
    flat = flatten_with_fqns(p)
    del flat["mlp/b"]
    with pytest.raises(KeyError, match="missing"):
        unflatten_from_fqns(p, flat)
    flat = flatten_with_fqns(p)
    flat["mlp/extra"] = jnp.zeros(())
    with pytest.raises(KeyError, match="unexpected"):
        unflatten_from_fqns(p, flat)


def test_keyed_optimizer_state_dict_roundtrip():
    p = _params()
    ko = KeyedOptimizer(optax.adagrad(0.1))
    state = ko.init(p)
    grads = jax.tree.map(jnp.ones_like, p)
    p2, state2 = ko.update(grads, state, p)
    sd = ko.state_dict(state2)
    assert any("mlp/w" in k for k in sd)
    restored = ko.load_state_dict(state2, sd)
    r_flat = flatten_with_fqns(restored)
    for k, v in flatten_with_fqns(state2).items():
        if hasattr(v, "shape"):
            np.testing.assert_allclose(np.asarray(r_flat[k]), np.asarray(v))


def test_warmup_schedule_linear_then_constant():
    sched = make_warmup_schedule(
        [
            WarmupStage(WarmupPolicy.LINEAR, max_iters=10, value=0.0),
            WarmupStage(WarmupPolicy.CONSTANT, max_iters=20, value=0.5),
        ],
        base_lr=1.0,
    )
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(0.5)
    # iter 10 still belongs to the LINEAR stage (transition on iter >
    # max_iters, ref warmup.py:131-135): multiplier 10/10 = 1.0
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(15)) == pytest.approx(0.5)
    assert float(sched(25)) == pytest.approx(1.0)  # past all stages


def test_warmup_invsqrt():
    sched = make_warmup_schedule(
        [WarmupStage(WarmupPolicy.INVSQRT, max_iters=100, value=1.0)],
        base_lr=2.0,
    )
    # reference semantics: 1/sqrt(GLOBAL iter) -> 2.0/sqrt(25) = 0.4
    assert float(sched(25)) == pytest.approx(0.4)


def test_warmup_optimizer_applies_schedule():
    p = {"w": jnp.ones((2,))}
    tx = warmup_optimizer(
        optax.sgd(1.0),
        [WarmupStage(WarmupPolicy.CONSTANT, max_iters=100, value=0.1)],
    )
    state = tx.init(p)
    grads = {"w": jnp.ones((2,))}
    updates, state = tx.update(grads, state, p)
    # sgd(1.0) gives -1 update, scaled by 0.1
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)


def test_gradient_clipping_norm():
    tx = gradient_clipping(optax.sgd(1.0), GradientClipping.NORM, 1.0)
    p = {"w": jnp.zeros((2,))}
    state = tx.init(p)
    grads = {"w": jnp.asarray([3.0, 4.0])}  # norm 5
    updates, _ = tx.update(grads, state, p)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), [-0.6, -0.8], rtol=1e-5
    )


def test_gradient_clipping_value():
    tx = gradient_clipping(optax.sgd(1.0), GradientClipping.VALUE, 0.5)
    p = {"w": jnp.zeros((2,))}
    state = tx.init(p)
    updates, _ = tx.update({"w": jnp.asarray([3.0, -4.0])}, state, p)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.5, 0.5])


def test_checkpoint_reshardable_roundtrip(tmp_path):
    import optax

    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor
    from torchrec_tpu.utils.checkpoint import load_reshardable, save_reshardable

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=16, name=f"t{i}",
                           feature_names=[f"f{i}"]) for i in range(2)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables=tables,
                                                        max_feature_length=1),
        dense_in_features=4, dense_arch_layer_sizes=(8, 16),
        over_arch_layer_sizes=(8, 1)))
    rng = np.random.RandomState(0)
    B = 16
    sb = KeyedJaggedTensor.from_lengths(
        ["f0", "f1"],
        jnp.asarray(rng.randint(0, 64, 2 * B), jnp.int32),
        jnp.asarray(np.ones(2 * B, np.int32)),
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 4).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))

    def make_dmp(stype):
        return DistributedModelParallel(
            model, env=ShardingEnv.from_devices(),
            plan=ShardingPlan({"dlrm/embedding_bag_collection": {
                "t0": ParameterSharding(stype),
                "t1": ParameterSharding(stype)}}),
            dense_optimizer=optax.sgd(0.1),
        )

    dmp = make_dmp(ShardingType.ROW_WISE)
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    state, loss, _ = dmp.make_train_step(donate=False)(state, dense, sb, labels)
    path = str(tmp_path / "ckpt.npz")
    save_reshardable(path, dmp, state)

    # reload under a DIFFERENT sharding plan (reshard by key)
    from torchrec_tpu.parallel import ShardingType as ST
    dmp2 = make_dmp(ST.COLUMN_WISE)
    state2 = dmp2.init(jax.random.PRNGKey(9), dense, sb, labels)
    state2 = load_reshardable(path, dmp2, state2)
    l1 = dmp.forward(state, dense, sb, labels)[0]
    l2 = dmp2.forward(state2, dense, sb, labels)[0]
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    assert int(state2.step) == 1


def test_reshardable_checkpoint_same_plan_restores_momentum(tmp_path):
    """Same-plan reload restores fused momenta exactly: continuing
    training matches an uninterrupted run bit-for-bit (ref: resume =
    same plan + load_state_dict, SURVEY §5.4)."""
    import optax

    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor
    from torchrec_tpu.utils.checkpoint import load_reshardable, save_reshardable

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=16, name=f"t{i}",
                           feature_names=[f"f{i}"]) for i in range(2)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables=tables,
                                                        max_feature_length=1),
        dense_in_features=4, dense_arch_layer_sizes=(8, 16),
        over_arch_layer_sizes=(8, 1)))
    rng = np.random.RandomState(0)
    B = 16
    sb = KeyedJaggedTensor.from_lengths(
        ["f0", "f1"],
        jnp.asarray(rng.randint(0, 64, 2 * B), jnp.int32),
        jnp.asarray(np.ones(2 * B, np.int32)),
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 4).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))

    def make_dmp():
        return DistributedModelParallel(
            model, env=ShardingEnv.from_devices(),
            plan=ShardingPlan({"dlrm/embedding_bag_collection": {
                "t0": ParameterSharding(ShardingType.ROW_WISE),
                "t1": ParameterSharding(ShardingType.ROW_WISE)}}),
            dense_optimizer=optax.sgd(0.1),
        )

    dmp = make_dmp()
    step = dmp.make_train_step(donate=False)
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    state, _, _ = step(state, dense, sb, labels)
    state, _, _ = step(state, dense, sb, labels)
    path = str(tmp_path / "ckpt.npz")
    save_reshardable(path, dmp, state)

    # uninterrupted continuation
    cont, loss_ref, _ = step(state, dense, sb, labels)

    # resumed continuation on a fresh DMP with the SAME plan
    dmp2 = make_dmp()
    state2 = dmp2.init(jax.random.PRNGKey(7), dense, sb, labels)
    state2 = load_reshardable(path, dmp2, state2)
    for gs_a, gs_b in zip(
        state.emb_states["dlrm/embedding_bag_collection"],
        state2.emb_states["dlrm/embedding_bag_collection"],
    ):
        np.testing.assert_array_equal(
            np.asarray(gs_a.opt.momentum1), np.asarray(gs_b.opt.momentum1)
        )
    _, loss_resumed, _ = dmp2.make_train_step(donate=False)(
        state2, dense, sb, labels
    )
    np.testing.assert_allclose(
        float(loss_resumed), float(loss_ref), rtol=1e-6
    )


def test_train_pipeline_matches_direct_loop():
    """Pipelined and direct training produce identical losses over 5
    iterations (ref: distributed/tests/test_train_pipeline.py compares
    pipelined vs non-pipelined)."""
    import optax

    from torchrec_tpu.datasets.random import RandomRecDataset
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.parallel.train_pipeline import TrainPipeline

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=16, name=f"t{i}",
                           feature_names=[f"f{i}"]) for i in range(2)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1),
        dense_in_features=4, dense_arch_layer_sizes=(8, 16),
        over_arch_layer_sizes=(8, 1)))

    def make_dmp():
        return DistributedModelParallel(
            model, env=ShardingEnv.from_devices(),
            plan=ShardingPlan({"dlrm/embedding_bag_collection": {
                "t0": ParameterSharding(ShardingType.ROW_WISE),
                "t1": ParameterSharding(ShardingType.ROW_WISE)}}),
            dense_optimizer=optax.sgd(0.1),
        )

    def loader():
        return RandomRecDataset(
            keys=["f0", "f1"], batch_size=16, hash_sizes=[64, 64],
            ids_per_feature=1, num_dense=4, num_batches=5, manual_seed=3,
        )

    def args_of(b):
        return (b.dense_features, b.sparse_features, b.labels)

    # direct loop
    dmp1 = make_dmp()
    first = next(iter(loader()))
    state1 = dmp1.init(jax.random.PRNGKey(0), *args_of(first))
    step1 = dmp1.make_train_step(donate=False)
    direct_losses = []
    for b in loader():
        state1, loss, _ = step1(state1, *args_of(b))
        direct_losses.append(float(loss))

    # pipelined loop
    dmp2 = make_dmp()
    state2 = dmp2.init(jax.random.PRNGKey(0), *args_of(first))
    jit_step = dmp2.make_train_step(donate=False)
    pipe = TrainPipeline(
        lambda st, b: jit_step(st, *args_of(b)), state2
    )
    it = iter(loader())
    piped_losses = []
    while True:
        try:
            loss, _ = pipe.progress(it)
        except StopIteration:
            break
        piped_losses.append(float(loss))

    np.testing.assert_allclose(piped_losses, direct_losses, rtol=1e-6)
