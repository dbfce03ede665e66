"""ShardedEmbeddingTowerCollection golden-parity tests.

ref test idea: torchrec/distributed/tests/test_tower_sharding via
test_model_parallel harness — sharded tower collection must match an
unsharded (single-program) tower computation after one optimizer step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagConfig
from torchrec_tpu.modules.mlp import MLP
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import ShardingEnv
from torchrec_tpu.parallel.tower_sharding import (
    ShardedEmbeddingTowerCollection,
    TowerSpec,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

N_DEV = 8
B = 16
L = 2
DIM = 8
LR = 0.1
EPS = 1e-8


def _towers():
    return [
        TowerSpec(
            tables=(
                EmbeddingBagConfig(num_embeddings=50, embedding_dim=DIM,
                                   name="a0", feature_names=["fa0"]),
                EmbeddingBagConfig(num_embeddings=30, embedding_dim=DIM,
                                   name="a1", feature_names=["fa1", "fa2"]),
            ),
            interaction=MLP(layer_sizes=(12, 6)),
            device=0,
            d_out=6,
        ),
        TowerSpec(
            tables=(
                EmbeddingBagConfig(num_embeddings=40, embedding_dim=DIM,
                                   name="b0", feature_names=["fb0"]),
            ),
            interaction=MLP(layer_sizes=(10,)),
            device=3,
            d_out=10,
        ),
        TowerSpec(
            tables=(
                EmbeddingBagConfig(num_embeddings=25, embedding_dim=DIM,
                                   name="c0", feature_names=["fc0"]),
            ),
            interaction=MLP(layer_sizes=(4,)),
            device=3,  # second tower on the same device
            d_out=4,
        ),
    ]


def _batch(towers, seed=7):
    rng = np.random.RandomState(seed)
    feats = [f for tw in towers for t in tw.tables for f in t.feature_names]
    rows = {
        f: t.num_embeddings
        for tw in towers for t in tw.tables for f in t.feature_names
    }
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    values = []
    for fi, f in enumerate(feats):
        for b in range(B):
            n = lengths[fi * B + b]
            values.extend(rng.randint(0, rows[f], size=(n,)).tolist())
    kjt = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(np.asarray(values, np.int32)), jnp.asarray(lengths)
    )
    return kjt.to_padded(L)


def _ref_pooled_per_tower(towers, dense, sb):
    """numpy pooled [B, F_t*DIM] per tower (SUM pooling)."""
    ids = np.asarray(sb.ids)
    lengths = np.asarray(sb.lengths)
    outs = []
    fi = 0
    for tw in towers:
        parts = []
        for t in tw.tables:
            for _ in t.feature_names:
                pooled = np.zeros((B, DIM), np.float32)
                for b in range(B):
                    for l in range(lengths[fi, b]):
                        pooled[b] += dense[t.name][ids[fi, b, l]]
                parts.append(pooled)
                fi += 1
        outs.append(np.concatenate(parts, axis=1))
    return outs


@pytest.fixture(scope="module")
def env():
    assert jax.device_count() == N_DEV
    return ShardingEnv.from_devices()


@pytest.fixture(scope="module")
def setup(env):
    towers = _towers()
    tc = ShardedEmbeddingTowerCollection(
        env, towers, optim=EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs={"eps": EPS},
    )
    state = tc.init(jax.random.PRNGKey(0), batch_size=B)
    sb = _batch(towers)
    return towers, tc, state, sb


def test_tower_forward_parity(setup):
    towers, tc, state, sb = setup
    out = np.asarray(jax.jit(tc.forward)(state, sb))
    assert out.shape == (B, sum(tw.d_out for tw in towers))
    dense = tc.unshard_tables_to_dense(state.emb.weights)
    pooled = _ref_pooled_per_tower(towers, dense, sb)
    off = 0
    for ti, tw in enumerate(towers):
        ref = tw.interaction.apply(
            {"params": jax.tree.map(np.asarray, state.interaction_params[ti])},
            jnp.asarray(pooled[ti]),
        )
        np.testing.assert_allclose(
            out[:, off : off + tw.d_out], np.asarray(ref),
            rtol=1e-4, atol=1e-5,
        )
        off += tw.d_out


def test_tower_update_parity(setup):
    towers, tc, state, sb = setup
    rng = np.random.RandomState(3)
    d_out = jnp.asarray(
        rng.randn(B, sum(tw.d_out for tw in towers)).astype(np.float32)
    )
    new_state = jax.jit(tc.update)(state, sb, d_out, LR)

    # ---- reference: autodiff the same computation on one device ----
    dense = tc.unshard_tables_to_dense(state.emb.weights)
    pooled_np = _ref_pooled_per_tower(towers, dense, sb)

    off = 0
    for ti, tw in enumerate(towers):
        cot = np.asarray(d_out)[:, off : off + tw.d_out]
        off += tw.d_out

        def f(params, pooled):
            out = tw.interaction.apply({"params": params}, pooled)
            return jnp.sum(out * cot)

        gp, gpool = jax.grad(f, argnums=(0, 1))(
            state.interaction_params[ti], jnp.asarray(pooled_np[ti])
        )
        # interaction params: plain SGD
        ref_params = jax.tree.map(
            lambda p, gq: np.asarray(p) - LR * np.asarray(gq),
            state.interaction_params[ti], gp,
        )
        got_params = jax.tree.map(np.asarray, new_state.interaction_params[ti])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
            got_params, ref_params,
        )

        # tables: rowwise adagrad on scatter-accumulated row grads
        gpool = np.asarray(gpool)
        ids = np.asarray(sb.ids)
        lengths = np.asarray(sb.lengths)
        fi_global = sum(
            len(t.feature_names) for tw2 in towers[:ti] for t in tw2.tables
        )
        col = 0
        got_tables = tc.unshard_tables_to_dense(new_state.emb.weights)
        for t in tw.tables:
            g_tab = np.zeros_like(dense[t.name])
            for _ in t.feature_names:
                dp = gpool[:, col : col + DIM]
                for b in range(B):
                    for l in range(lengths[fi_global, b]):
                        g_tab[ids[fi_global, b, l]] += dp[b]
                col += DIM
                fi_global += 1
            m = (g_tab**2).mean(axis=1)
            ref_w = dense[t.name] - LR * g_tab / (np.sqrt(m)[:, None] + EPS)
            np.testing.assert_allclose(
                got_tables[t.name], ref_w, rtol=1e-4, atol=1e-5
            )


def test_tower_roundtrip(setup):
    towers, tc, state, _ = setup
    dense = tc.unshard_tables_to_dense(state.emb.weights)
    w2 = tc.shard_tables_from_dense(dense)
    back = tc.unshard_tables_to_dense(w2)
    for k, v in dense.items():
        np.testing.assert_allclose(back[k], v, rtol=1e-6)
