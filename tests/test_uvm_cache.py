"""UVM-equivalent software row cache: parity vs an uncached table.

ref: FBGEMM EmbeddingLocation.MANAGED_CACHING consumed at
torchrec/distributed/embedding_types.py:57-76 — training through the
cache must produce the same table as training directly.
"""

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.ops.embedding import PoolingMode, embedding_bag_lookup
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    FusedOptimizerState,
    apply_fused_update,
)
from torchrec_tpu.ops.uvm_cache import UvmCachedEmbedding

R, D, B, L, C = 500, 16, 32, 2, 96
LR = 0.1


def _run_cached(table, batches):
    uvm = UvmCachedEmbedding(table.copy(), cache_rows=C)
    for ids, lengths, d_pooled in batches:
        slots = uvm.prepare(ids)
        slots_j = jnp.asarray(slots)
        lengths_j = jnp.asarray(lengths)
        out = uvm.lookup_pooled(slots_j, lengths_j)
        mask = (np.arange(L)[None, :] < lengths[:, None])
        row_grads = np.repeat(d_pooled[:, None, :], L, axis=1)
        uvm.update(
            slots_j.reshape(-1),
            jnp.asarray(row_grads.reshape(-1, D)),
            jnp.asarray(mask.reshape(-1)),
            LR,
        )
    uvm.flush()
    return uvm, np.asarray(out)


def _run_uncached(table, batches):
    w = jnp.asarray(table)
    opt = FusedOptimizerState(
        momentum1=jnp.zeros((R,), jnp.float32), momentum2=None,
        step=jnp.zeros((), jnp.int32), optim=EmbOptimType.ROWWISE_ADAGRAD,
    )
    for ids, lengths, d_pooled in batches:
        out = embedding_bag_lookup(
            w, jnp.asarray(ids), jnp.asarray(lengths), PoolingMode.SUM
        )
        mask = (np.arange(L)[None, :] < lengths[:, None])
        row_grads = np.repeat(d_pooled[:, None, :], L, axis=1)
        w, opt = apply_fused_update(
            w, opt, jnp.asarray(ids.reshape(-1)),
            jnp.asarray(row_grads.reshape(-1, D)),
            jnp.asarray(mask.reshape(-1)), LR,
        )
    return np.asarray(w), np.asarray(out)


def _batches(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ids = rng.randint(0, R, size=(B, L)).astype(np.int32)
        lengths = rng.randint(0, L + 1, size=(B,)).astype(np.int32)
        d_pooled = rng.randn(B, D).astype(np.float32)
        out.append((ids, lengths, d_pooled))
    return out


def test_uvm_cache_training_parity():
    rng = np.random.RandomState(42)
    table = rng.randn(R, D).astype(np.float32)
    batches = _batches(6)
    uvm, out_c = _run_cached(table, batches)
    ref_w, out_u = _run_uncached(table, batches)
    np.testing.assert_allclose(out_c, out_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(uvm.table, ref_w, rtol=1e-5, atol=1e-6)
    assert uvm.misses > 0 and uvm.hits > 0  # cache actually exercised


def _run_cached_optim(table, batches, optim):
    uvm = UvmCachedEmbedding(table.copy(), cache_rows=C, optim=optim)
    for ids, lengths, d_pooled in batches:
        slots = uvm.prepare(ids)
        mask = (np.arange(L)[None, :] < lengths[:, None])
        row_grads = np.repeat(d_pooled[:, None, :], L, axis=1)
        uvm.update(
            jnp.asarray(slots).reshape(-1),
            jnp.asarray(row_grads.reshape(-1, D)),
            jnp.asarray(mask.reshape(-1)),
            LR,
        )
    uvm.flush()
    return uvm


def _run_uncached_optim(table, batches, optim):
    from torchrec_tpu.ops.fused_update import init_fused_optimizer_state

    w = jnp.asarray(table)
    opt = init_fused_optimizer_state(R, D, optim)
    for ids, lengths, d_pooled in batches:
        mask = (np.arange(L)[None, :] < lengths[:, None])
        row_grads = np.repeat(d_pooled[:, None, :], L, axis=1)
        w, opt = apply_fused_update(
            w, opt, jnp.asarray(ids.reshape(-1)),
            jnp.asarray(row_grads.reshape(-1, D)),
            jnp.asarray(mask.reshape(-1)), LR,
        )
    return np.asarray(w), opt


def test_uvm_cache_all_optimizers_golden_parity():
    """VERDICT r4 item 9: fbgemm's UVM locations take the FULL optimizer
    set (ref torchrec/distributed/embedding_types.py:57-76). Training
    through the cache under eviction pressure must reproduce the
    uncached fused update exactly for every optimizer — weights AND both
    momentum slots."""
    import pytest  # noqa: F401

    rng = np.random.RandomState(7)
    table = rng.randn(R, D).astype(np.float32)
    batches = _batches(6, seed=3)
    for optim in EmbOptimType:
        uvm = _run_cached_optim(table, batches, optim)
        ref_w, ref_opt = _run_uncached_optim(table, batches, optim)
        np.testing.assert_allclose(
            uvm.table, ref_w, rtol=1e-5, atol=1e-6, err_msg=str(optim)
        )
        for host_m, ref_m in (
            (uvm.host_momentum1, ref_opt.momentum1),
            (uvm.host_momentum2, ref_opt.momentum2),
        ):
            assert (host_m is None) == (ref_m is None), optim
            if host_m is not None:
                np.testing.assert_allclose(
                    host_m, np.asarray(ref_m), rtol=1e-5, atol=1e-6,
                    err_msg=str(optim),
                )
        assert int(uvm.step) == int(ref_opt.step)
        assert uvm.misses > 0  # eviction/staging actually exercised


def test_uvm_ebc_rejects_reserved_table_name_suffixes():
    """momentum_dict suffix-encodes '.m2'/'.step'; colliding table
    names must be rejected at construction, not misrouted on load."""
    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.parallel.uvm_ebc import UvmEmbeddingBagCollection

    t = EmbeddingBagConfig(num_embeddings=10, embedding_dim=8,
                           name="clicks.step", feature_names=["f0"])
    try:
        UvmEmbeddingBagCollection((t,), {"clicks.step":
                                         np.zeros((10, 8), np.float32)})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "reserved" in str(e)


def test_uvm_cache_eviction_pressure():
    """Working set far larger than the cache: every row still correct."""
    rng = np.random.RandomState(1)
    table = rng.randn(R, D).astype(np.float32)
    batches = _batches(10, seed=9)
    uvm, _ = _run_cached(table, batches)
    ref_w, _ = _run_uncached(table, batches)
    np.testing.assert_allclose(uvm.table, ref_w, rtol=1e-5, atol=1e-6)


def test_uvm_cache_overflow_raises():
    table = np.zeros((R, D), np.float32)
    uvm = UvmCachedEmbedding(table, cache_rows=4)
    try:
        uvm.prepare(np.arange(10, dtype=np.int32))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_uvm_ebc_matches_plain_ebc_training():
    """UvmEmbeddingBagCollection (host table + HBM cache) trains to the
    same weights as the plain in-HBM EBC path."""
    import jax

    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.modules.embedding_configs import PoolingType
    from torchrec_tpu.parallel import (
        ParameterSharding,
        ShardedEmbeddingBagCollection,
        ShardingEnv,
        ShardingType,
    )
    from torchrec_tpu.parallel.uvm_ebc import UvmEmbeddingBagCollection
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rng = np.random.RandomState(0)
    B2, L2 = 16, 2
    tables = (
        EmbeddingBagConfig(num_embeddings=300, embedding_dim=16, name="u0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=120, embedding_dim=16, name="u1",
                           feature_names=["f1"], pooling=PoolingType.MEAN),
    )
    weights = {
        t.name: rng.randn(t.num_embeddings, t.embedding_dim).astype(np.float32)
        for t in tables
    }

    def make_batch(seed):
        r2 = np.random.RandomState(seed)
        feats = ["f0", "f1"]
        rows = {"f0": 300, "f1": 120}
        lengths = r2.randint(0, L2 + 1, size=(2 * B2,)).astype(np.int32)
        vals = []
        for fi, f in enumerate(feats):
            for b in range(B2):
                vals.extend(r2.randint(0, rows[f],
                                       size=(lengths[fi * B2 + b],)).tolist())
        return KeyedJaggedTensor.from_lengths(
            feats, jnp.asarray(np.asarray(vals, np.int32)),
            jnp.asarray(lengths),
        ).to_padded(L2)

    uvm = UvmEmbeddingBagCollection(
        tables, weights, cache_load_factor=0.3, min_cache_rows=64
    )
    env = ShardingEnv.from_devices()
    ebc = ShardedEmbeddingBagCollection(
        env, tables,
        {t.name: ParameterSharding(ShardingType.DATA_PARALLEL)
         for t in tables},
    )
    states = ebc.shard_from_dense(weights)

    for i in range(5):
        sb = make_batch(i)
        kt_uvm = uvm.forward(sb)
        kt_ref = ebc.forward(states, sb)
        np.testing.assert_allclose(
            np.asarray(kt_uvm.values), np.asarray(kt_ref.values),
            rtol=1e-4, atol=1e-5,
        )
        d_vals = np.random.RandomState(100 + i).randn(
            *kt_ref.values.shape
        ).astype(np.float32)
        uvm.update(sb, jnp.asarray(d_vals), 0.1)
        states = ebc.update(states, sb, jnp.asarray(d_vals), 0.1)

    got = uvm.state_dict()
    want = ebc.unshard_to_dense(states)
    for name in weights:
        np.testing.assert_allclose(
            got[name], want[name], rtol=1e-4, atol=1e-5
        )
    stats = uvm.cache_stats()
    assert stats["u0"]["misses"] > 0  # cache actually exercised


def test_dmp_mixed_uvm_plan_golden_parity():
    """A plan mixing a device table with a FUSED_UVM_CACHING table trains
    through DistributedModelParallel: one EXACT_SGD step matches the
    unsharded autodiff golden step for BOTH tables (ref: per-table
    MANAGED_CACHING inside one TBE, batched_embedding_kernel.py:410-421)."""
    import flax.linen as nn
    import jax
    import optax

    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.parallel.types import ComputeKernel
    from torchrec_tpu.sparse import KeyedJaggedTensor

    B, L, D = 16, 2, 16
    LR_EMB, LR_DENSE = 0.1, 0.05
    tables = (
        EmbeddingBagConfig(
            num_embeddings=96, embedding_dim=D, name="t0",
            feature_names=["f0"],
        ),
        EmbeddingBagConfig(
            num_embeddings=200, embedding_dim=D, name="t1",
            feature_names=["f1"],
        ),
    )

    class M(nn.Module):
        ebc: nn.Module

        @nn.compact
        def __call__(self, sb, labels):
            """Call Args: sb padded sparse batch; labels [B]. Returns
            (loss, (loss, logits))."""
            logits = nn.Dense(1)(self.ebc(sb).values)[:, 0]
            y = labels.astype(logits.dtype)
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * y
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return loss, (loss, logits)

    def batch(seed):
        r = np.random.RandomState(seed)
        lengths = r.randint(0, L + 1, size=(2 * B,)).astype(np.int32)
        rows = [96, 200]
        vals = np.concatenate(
            [
                r.randint(0, rows[i // B], size=(lengths[i],))
                for i in range(len(lengths))
            ]
            + [np.zeros((0,), np.int64)]
        ).astype(np.int32)
        sb = KeyedJaggedTensor.from_lengths(
            ["f0", "f1"], jnp.asarray(vals), jnp.asarray(lengths)
        ).to_padded(L)
        labels = jnp.asarray((r.rand(B) > 0.5).astype(np.float32))
        return sb, labels

    model = M(ebc=EmbeddingBagCollection(tables=tables, max_feature_length=L))
    sb, labels = batch(0)
    params = model.init(jax.random.PRNGKey(0), sb, labels)["params"]
    (g_loss, (_, g_logits)), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, sb, labels), has_aux=True
    )(params)

    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"ebc": {
            "t0": ParameterSharding(ShardingType.ROW_WISE),
            "t1": ParameterSharding(
                ShardingType.TABLE_WISE,
                compute_kernel=ComputeKernel.FUSED_UVM_CACHING,
                ranks=[0],
            ),
        }}),
        fused_optim=EmbOptimType.EXACT_SGD,
        fused_params={"learning_rate": LR_EMB},
        dense_optimizer=optax.sgd(LR_DENSE),
    )
    state = dmp.init(jax.random.PRNGKey(1), sb, labels)
    new_dense = dict(state.dense_params)
    new_dense["Dense_0"] = jax.tree.map(jnp.asarray, dict(params["Dense_0"]))
    state = state.replace(
        dense_params=new_dense,
        dense_opt=dmp.dense_optimizer.init(new_dense),
    )
    state = dmp.load_tables(
        state,
        {"ebc": {k: np.asarray(params["ebc"][k]) for k in ("t0", "t1")}},
    )

    # forward parity (host-staged UVM lookup + jitted device lookup)
    loss0, (_, logits0) = dmp.forward(state, sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(g_logits), rtol=1e-4, atol=1e-5
    )

    # one train step: both tables must match the golden SGD update
    step = dmp.make_train_step(donate=False)
    new_state, loss, _ = step(state, sb, labels)
    np.testing.assert_allclose(float(loss), float(g_loss), rtol=1e-5)
    got = dmp.state_dict(new_state)["embeddings/ebc"]
    for name in ("t0", "t1"):
        np.testing.assert_allclose(
            got[name],
            np.asarray(params["ebc"][name] - LR_EMB * grads["ebc"][name]),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )

    # keeps training: a few more steps decrease the loss, cache gets hits
    losses = [float(loss)]
    for i in range(12):
        s2, l2 = batch(i % 3)
        new_state, ls, _ = step(new_state, s2, l2)
        losses.append(float(ls))
    assert losses[-1] < losses[0], losses
    stats = dmp._uvm_mods["ebc"].cache_stats()["t1"]
    assert stats["hits"] > 0


def test_dmp_uvm_through_train_pipeline():
    """The host-orchestrated UVM step composes with the prefetching
    TrainPipeline: pipelined losses == direct-loop losses (ref: UVM
    tables trained through TrainPipelineSparseDist the same way)."""
    import jax
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
    from torchrec_tpu.parallel.types import ComputeKernel

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=128, embedding_dim=16, name=f"t{i}",
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
                "t1": ParameterSharding(
                    ShardingType.TABLE_WISE,
                    compute_kernel=ComputeKernel.FUSED_UVM_CACHING,
                    ranks=[0],
                )}}),
            dense_optimizer=optax.sgd(0.1),
        )

    def loader():
        return RandomRecDataset(
            keys=["f0", "f1"], batch_size=16, hash_sizes=[128, 128],
            ids_per_feature=1, num_dense=4, num_batches=5, manual_seed=7,
        )

    def args_of(b):
        return (b.dense_features, b.sparse_features, b.labels)

    first = next(iter(loader()))
    dmp1 = make_dmp()
    state1 = dmp1.init(jax.random.PRNGKey(0), *args_of(first))
    step1 = dmp1.make_train_step(donate=False)
    direct = []
    for b in loader():
        state1, loss, _ = step1(state1, *args_of(b))
        direct.append(float(loss))

    dmp2 = make_dmp()
    state2 = dmp2.init(jax.random.PRNGKey(0), *args_of(first))
    step2 = dmp2.make_train_step(donate=False)
    pipe = TrainPipeline(lambda st, b: step2(st, *args_of(b)), state2)
    it = iter(loader())
    piped = []
    while True:
        try:
            loss, _ = pipe.progress(it)
        except StopIteration:
            break
        piped.append(float(loss))

    np.testing.assert_allclose(piped, direct, rtol=1e-6)
    assert dmp2._uvm_mods["dlrm/embedding_bag_collection"].cache_stats()


import pytest


@pytest.mark.parametrize(
    "optim", ["rowwise_adagrad", "adam"]
)
def test_dmp_all_uvm_module_exact_momentum_resume(optim):
    """A module whose EVERY table is FUSED_UVM_CACHING (no device shard at
    all) trains through DMP, and optimizer resume through
    state_dict -> load_tables(uvm_momentum=...) is EXACT: the restored
    run produces bit-identical tables to the uninterrupted run.
    Parametrized over rowwise-Adagrad (momentum1 only) and Adam
    (momentum1 + momentum2 + bias-correction step — the r5 UVM
    full-optimizer surface, VERDICT r4 item 9)."""
    import flax.linen as nn
    import jax
    import optax

    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.parallel.types import ComputeKernel
    from torchrec_tpu.sparse import KeyedJaggedTensor

    B, L, D = 16, 2, 16
    tables = (
        EmbeddingBagConfig(
            num_embeddings=150, embedding_dim=D, name="t0",
            feature_names=["f0"],
        ),
    )

    class M(nn.Module):
        ebc: nn.Module

        @nn.compact
        def __call__(self, sb, labels):
            """Call Args: sb padded sparse batch; labels [B]. Returns
            (loss, (loss, logits))."""
            logits = nn.Dense(1)(self.ebc(sb).values)[:, 0]
            y = labels.astype(logits.dtype)
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * y
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return loss, (loss, logits)

    def batch(seed):
        r = np.random.RandomState(seed)
        vals = r.randint(0, 150, size=(B * L,)).astype(np.int32)
        sb = KeyedJaggedTensor.from_lengths(
            ["f0"], jnp.asarray(vals),
            jnp.asarray(np.full((B,), L, np.int32)),
        ).to_padded(L)
        return sb, jnp.asarray((vals[:B] % 2).astype(np.float32))

    def make_dmp():
        return DistributedModelParallel(
            M(ebc=EmbeddingBagCollection(tables=tables, max_feature_length=L)),
            env=ShardingEnv.from_devices(),
            plan=ShardingPlan({"ebc": {"t0": ParameterSharding(
                ShardingType.TABLE_WISE,
                compute_kernel=ComputeKernel.FUSED_UVM_CACHING,
                ranks=[0],
            )}}),
            fused_optim={
                "rowwise_adagrad": EmbOptimType.ROWWISE_ADAGRAD,
                "adam": EmbOptimType.ADAM,
            }[optim],
            fused_params={"learning_rate": 0.1},
            dense_optimizer=optax.sgd(0.05),  # stateless: exact resume
        )

    sb0, lab0 = batch(0)
    dmp1 = make_dmp()
    state1 = dmp1.init(jax.random.PRNGKey(0), sb0, lab0)
    step1 = dmp1.make_train_step(donate=False)
    for i in range(3):
        state1, _, _ = step1(state1, *batch(i))
    snap = dmp1.state_dict(state1)
    assert "uvm_momentum/ebc" in snap
    assert float(np.abs(snap["uvm_momentum/ebc"]["t0"]).max()) > 0
    # uninterrupted continuation -> golden
    for i in range(3, 5):
        state1, _, _ = step1(state1, *batch(i))
    golden = dmp1.state_dict(state1)["embeddings/ebc"]["t0"]

    # fresh DMP, restore, continue the same schedule
    dmp2 = make_dmp()
    state2 = dmp2.init(jax.random.PRNGKey(5), sb0, lab0)
    nd = dict(state2.dense_params)
    nd["Dense_0"] = jax.tree.map(jnp.asarray, dict(snap["dense"]["Dense_0"]))
    state2 = state2.replace(
        dense_params=nd, dense_opt=dmp2.dense_optimizer.init(nd)
    )
    state2 = dmp2.load_tables(
        state2,
        {"ebc": dict(snap["embeddings/ebc"])},
        uvm_momentum={"ebc": snap["uvm_momentum/ebc"]},
    )
    step2 = dmp2.make_train_step(donate=False)
    for i in range(3, 5):
        state2, _, _ = step2(state2, *batch(i))
    got = dmp2.state_dict(state2)["embeddings/ebc"]["t0"]
    np.testing.assert_array_equal(got, golden)


def test_uvm_adam_npz_checkpoint_exact_resume(tmp_path):
    """save_reshardable/load_reshardable roundtrip of an all-UVM Adam
    module: the new `<name>.m2` / `<name>.step` uvmopt entries survive
    the npz key format (`uvmopt/{key}/{entry}` parse) and restore
    training bit-exactly."""
    import flax.linen as nn
    import jax
    import optax

    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.parallel.types import ComputeKernel
    from torchrec_tpu.sparse import KeyedJaggedTensor
    from torchrec_tpu.utils.checkpoint import (
        load_reshardable,
        save_reshardable,
    )

    B2, L2, D2 = 16, 2, 16
    tables = (
        EmbeddingBagConfig(
            num_embeddings=150, embedding_dim=D2, name="t0",
            feature_names=["f0"],
        ),
    )

    class M(nn.Module):
        ebc: nn.Module

        @nn.compact
        def __call__(self, sb, labels):
            logits = nn.Dense(1)(self.ebc(sb).values)[:, 0]
            y = labels.astype(logits.dtype)
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * y
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return loss, (loss, logits)

    def batch(seed):
        r = np.random.RandomState(seed)
        vals = r.randint(0, 150, size=(B2 * L2,)).astype(np.int32)
        sb = KeyedJaggedTensor.from_lengths(
            ["f0"], jnp.asarray(vals),
            jnp.asarray(np.full((B2,), L2, np.int32)),
        ).to_padded(L2)
        return sb, jnp.asarray((vals[:B2] % 2).astype(np.float32))

    def make_dmp():
        return DistributedModelParallel(
            M(ebc=EmbeddingBagCollection(tables=tables,
                                         max_feature_length=L2)),
            env=ShardingEnv.from_devices(),
            plan=ShardingPlan({"ebc": {"t0": ParameterSharding(
                ShardingType.TABLE_WISE,
                compute_kernel=ComputeKernel.FUSED_UVM_CACHING,
                ranks=[0],
            )}}),
            fused_optim=EmbOptimType.ADAM,
            fused_params={"learning_rate": 0.1},
            dense_optimizer=optax.sgd(0.05),
        )

    sb0, lab0 = batch(0)
    dmp1 = make_dmp()
    state1 = dmp1.init(jax.random.PRNGKey(0), sb0, lab0)
    step1 = dmp1.make_train_step(donate=False)
    for i in range(3):
        state1, _, _ = step1(state1, *batch(i))
    path = str(tmp_path / "uvm_adam.npz")
    save_reshardable(path, dmp1, state1)
    # npz must carry both momentum slots + the bias-correction step
    import numpy as _np
    data = _np.load(path)
    keys = set(data.files)
    assert "uvmopt/ebc/t0" in keys and "uvmopt/ebc/t0.m2" in keys
    assert "uvmopt/ebc/t0.step" in keys
    # the step counter must keep an integer dtype: a float32 cast
    # rounds step > 2^24 and breaks exact bias-correction resume
    assert _np.issubdtype(data["uvmopt/ebc/t0.step"].dtype, _np.integer)
    # golden: uninterrupted continuation
    for i in range(3, 5):
        state1, _, _ = step1(state1, *batch(i))
    golden = dmp1.state_dict(state1)["embeddings/ebc"]["t0"]

    dmp2 = make_dmp()
    state2 = dmp2.init(jax.random.PRNGKey(7), sb0, lab0)
    state2 = load_reshardable(path, dmp2, state2)
    step2 = dmp2.make_train_step(donate=False)
    for i in range(3, 5):
        state2, _, _ = step2(state2, *batch(i))
    got = dmp2.state_dict(state2)["embeddings/ebc"]["t0"]
    np.testing.assert_array_equal(got, golden)
