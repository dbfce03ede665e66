"""Cross-product smoke grid: every sharding type x storage dtype x
fused optimizer runs a forward + update with finite results and changed
weights.

ref test idea: the reference's hypothesis grids over (sharder x
sharding_type x kernel), distributed/tests/test_model_parallel.py:61-90.
Exact-value parity is covered by the dedicated suites; this grid guards
the combinations in between.
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

B, L, D = 16, 2, 16

ALL_STYPES = [
    ShardingType.DATA_PARALLEL,
    ShardingType.TABLE_WISE,
    ShardingType.ROW_WISE,
    ShardingType.COLUMN_WISE,
    ShardingType.TABLE_ROW_WISE,
    ShardingType.TABLE_COLUMN_WISE,
]
COMBOS = [(DataType.BF16, EmbOptimType.ROWWISE_ADAGRAD),
          (DataType.FP32, EmbOptimType.ADAM)]


def _setup(stype, dt, optim):
    env = ShardingEnv.from_devices()
    tables = (
        EmbeddingBagConfig(num_embeddings=100, embedding_dim=D, name="g0",
                           feature_names=["f0"], data_type=dt),
        EmbeddingBagConfig(num_embeddings=48, embedding_dim=D, name="g1",
                           feature_names=["f1"], data_type=dt),
    )
    plan = {
        t.name: ParameterSharding(
            stype,
            ranks=[i % env.world_size]
            if stype is ShardingType.TABLE_WISE else None,
            host=0 if stype in (ShardingType.TABLE_ROW_WISE,
                                ShardingType.TABLE_COLUMN_WISE) else None,
        )
        for i, t in enumerate(tables)
    }
    ebc = ShardedEmbeddingBagCollection(env, tables, plan, optim=optim)
    rng = np.random.RandomState(0)
    feats = ["f0", "f1"]
    rows = {"f0": 100, "f1": 48}
    lengths = rng.randint(0, L + 1, size=(2 * B,)).astype(np.int32)
    vals = []
    for fi, f in enumerate(feats):
        for b in range(B):
            vals.extend(
                rng.randint(0, rows[f], size=(lengths[fi * B + b],)).tolist()
            )
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(np.asarray(vals, np.int32)), jnp.asarray(lengths)
    ).to_padded(L)
    return ebc, sb


@pytest.mark.parametrize("stype", ALL_STYPES, ids=lambda s: s.value)
@pytest.mark.parametrize(
    "combo", COMBOS, ids=lambda c: f"{c[0].value}-{c[1].value}"
)
def test_grid_forward_update(stype, combo):
    dt, optim = combo
    ebc, sb = _setup(stype, dt, optim)
    states = ebc.init(jax.random.PRNGKey(0))
    kt = jax.jit(ebc.forward)(states, sb)
    out = np.asarray(kt.values, dtype=np.float32)
    assert out.shape == (B, 2 * D)
    assert np.isfinite(out).all()

    d_vals = jnp.asarray(
        np.random.RandomState(1).randn(B, 2 * D).astype(np.float32)
    )
    new_states = jax.jit(ebc.update)(states, sb, d_vals, 0.1)
    before = ebc.unshard_to_dense(states)
    after = ebc.unshard_to_dense(new_states)
    for name in before:
        a = np.asarray(after[name], np.float32)
        b = np.asarray(before[name], np.float32)
        assert np.isfinite(a).all()
        assert not np.array_equal(a, b), f"{name} never updated"
