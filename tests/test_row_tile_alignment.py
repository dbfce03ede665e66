"""Packed group operands must keep their row axis ROW_TILE-aligned.

WHY (r4, measured on v5e): XLA gives large [n, rows, D] entry params the
row-granular {..,T(1,128)} layout while in-step gather/scatter run in
T(8,128). The layouts are byte-identical only when rows is a multiple of
the sublane tile; at the pod-shard config (3,190,449 rows = 1 mod 8) XLA
materialized TWO whole-operand layout copies per step (~10 ms of the
22.9 ms step, tools/trace_pod_r4.py + tools/hlo_step_r4.py). Padding to
ROW_TILE (128) makes the conversions free bitcasts.

ref sizes: the MLPerf cardinalities (examples/dlrm/README.MD:45) RW/64.
"""

import jax
import numpy as np
import pytest

from torchrec_tpu.parallel.strategies import (
    ROW_TILE,
    CwEmbeddingSharding,
    DpEmbeddingSharding,
    RwEmbeddingSharding,
    TwEmbeddingSharding,
    _pad_rows_tile,
)
from torchrec_tpu.parallel.types import (
    ParameterSharding,
    ShardingEnv,
    ShardingType,
)

# deliberately ragged: sums and maxes hit every residue class mod 8
RAGGED_ROWS = [37, 333, 1021, 8, 625_001, 13]


def _env():
    return ShardingEnv.from_devices(jax.devices("cpu")[:4])


def _tables(rows):
    from torchrec_tpu.modules import EmbeddingBagConfig

    return tuple(
        EmbeddingBagConfig(
            num_embeddings=r, embedding_dim=128, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i, r in enumerate(rows)
    )


def _meta(cls, sharding_type, rows=RAGGED_ROWS, env=None, **ps_kw):
    from torchrec_tpu.parallel.sharded_ebc import ShardedEmbeddingBagCollection

    plan = {
        f"t{i}": ParameterSharding(sharding_type, **ps_kw)
        for i in range(len(rows))
    }
    sebc = ShardedEmbeddingBagCollection(env or _env(), _tables(rows), plan)
    # one group per sharding type in this plan
    [strat] = sebc.strategies
    assert isinstance(strat, cls)
    return strat


def test_pad_rows_tile_helper():
    assert _pad_rows_tile(1) == ROW_TILE
    assert _pad_rows_tile(ROW_TILE) == ROW_TILE
    assert _pad_rows_tile(ROW_TILE + 1) == 2 * ROW_TILE
    assert ROW_TILE % 32 == 0  # covers f32/bf16/int8 sublane tiles


@pytest.mark.parametrize(
    "cls,stype,kw",
    [
        (RwEmbeddingSharding, ShardingType.ROW_WISE, {}),
        (DpEmbeddingSharding, ShardingType.DATA_PARALLEL, {}),
        (TwEmbeddingSharding, ShardingType.TABLE_WISE, {}),
        (CwEmbeddingSharding, ShardingType.COLUMN_WISE, {}),
    ],
)
def test_row_axis_is_tile_aligned(cls, stype, kw):
    strat = _meta(cls, stype, **kw)
    shape = strat.weights_shape()
    row_axis = shape[0] if len(shape) == 2 else shape[1]
    assert row_axis % ROW_TILE == 0, (cls.__name__, shape)
    # pack -> unshard round-trips exactly (slack rows are invisible)
    rng = np.random.RandomState(0)
    dense = {
        f"t{i}": rng.randn(r, 128).astype(np.float32)
        for i, r in enumerate(RAGGED_ROWS)
    }
    w = strat._pack_dense(dense)
    assert tuple(w.shape) == tuple(shape)
    back = strat.unshard_to_dense(np.asarray(w))
    for name, arr in dense.items():
        np.testing.assert_array_equal(back[name], arr)


def test_rowwise_shard_roundtrip_padded():
    strat = _meta(RwEmbeddingSharding, ShardingType.ROW_WISE)
    rng = np.random.RandomState(1)
    per_table = {
        f"t{i}": rng.rand(r).astype(np.float32)
        for i, r in enumerate(RAGGED_ROWS)
    }
    m = strat.shard_rowwise(per_table)
    assert m.shape == strat.weights_shape()[:-1]
    back = strat.unshard_rowwise(np.asarray(m))
    for name, arr in per_table.items():
        np.testing.assert_array_equal(back[name], arr)


def test_hierarchical_rows_loc_aligned():
    from torchrec_tpu.parallel.hierarchical_strategies import (
        TwCwEmbeddingSharding,
        TwRwEmbeddingSharding,
    )

    env = ShardingEnv.from_devices(jax.devices("cpu")[:4], local_size=2)
    for stype, cls in [
        (ShardingType.TABLE_ROW_WISE, TwRwEmbeddingSharding),
        (ShardingType.TABLE_COLUMN_WISE, TwCwEmbeddingSharding),
    ]:
        strat = _meta(cls, stype, env=env, host=0)
        assert strat.weights_shape()[1] % ROW_TILE == 0


def test_tower_rows_max_tile_aligned():
    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.modules.mlp import MLP
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel.tower_sharding import (
        ShardedEmbeddingTowerCollection,
        TowerSpec,
    )

    towers = [
        TowerSpec(
            tables=(
                EmbeddingBagConfig(num_embeddings=r, embedding_dim=8,
                                   name=f"t{i}", feature_names=[f"f{i}"]),
            ),
            interaction=MLP(layer_sizes=(4,)),
            device=i % 4,
            d_out=4,
        )
        for i, r in enumerate(RAGGED_ROWS)  # per-device sums hit odd residues
    ]
    tc = ShardedEmbeddingTowerCollection(
        _env(), towers, optim=EmbOptimType.EXACT_SGD
    )
    assert tc.rows_max % ROW_TILE == 0, tc.rows_max


def test_quant_rows_max_tile_aligned():
    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.parallel.quant_sharded import (
        ShardedQuantEmbeddingBagCollection,
    )

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=r, embedding_dim=128,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i, r in enumerate(RAGGED_ROWS)
    )
    from torchrec_tpu.ops.quant import quantize_rowwise

    rng = np.random.RandomState(0)
    quantized = {
        f"t{i}": quantize_rowwise(
            rng.randn(r, 128).astype(np.float32), bits=8
        )
        for i, r in enumerate(RAGGED_ROWS)
    }
    sq = ShardedQuantEmbeddingBagCollection(_env(), tables, quantized)
    assert sq.rows_max % ROW_TILE == 0, sq.rows_max
