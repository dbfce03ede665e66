"""Compaction pre-pass tests (VERDICT r4 item 2 — the feature landed
in round 4 with zero tests, which is exactly how its missing import
survived to the snapshot).

Covers, mirroring the reference's fused-optimizer parity discipline
(ref: /root/reference/torchrec/distributed/tests/test_fused_optim.py):

* `compact_row_grads` unit semantics: sorted unique ids, exact combined
  totals, sentinel-padded tail, for cap == and cap > the true unique
  count (cap-binding);
* `unique_slot_cap` is a HARD bound under randomized layouts (the
  guarantee that makes the no-overflow-branch design sound);
* `use_compact_prepass` engages only when the slot saving clearly beats
  the pre-pass overhead;
* full `apply_fused_update` bit-parity compacted-vs-uncompacted for
  EVERY EmbOptimType on duplicate-heavy streams, driven through the
  `TORCHREC_TPU_COMPACT` never/always override and `unique_entries`;
* the never/auto/always override actually controls engagement
  (observed by wrapping compact_row_grads, not inferred from outputs).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import torchrec_tpu.ops.fused_update as fu
from torchrec_tpu.ops.cost_model import (
    SCATTER_NS_PER_ROW,
    unique_slot_cap,
    use_compact_prepass,
)
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    apply_fused_update,
    compact_row_grads,
    init_fused_optimizer_state,
)

# engage conditions in apply_fused_update: N % 512 == 0, N >= 2048,
# D % 128 == 0
N, D, R = 2048, 128, 96


def _dup_heavy(seed=0, r=R, n=N, d=D, invalid_frac=0.15):
    """Duplicate-heavy stream: ~n/r duplicates per row (the pod MLPerf
    shard's tiny-table regime, NOTES_r4.md: a 3-row table takes 8192
    ids)."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, r, n).astype(np.int32)
    grads = rng.randn(n, d).astype(np.float32)
    valid = rng.rand(n) > invalid_frac
    return ids, grads, valid


def _combined(ids, grads, valid):
    out = {}
    for i in range(len(ids)):
        if valid[i]:
            out.setdefault(int(ids[i]), np.zeros(grads.shape[1], np.float64))
            out[int(ids[i])] += grads[i]
    return out


# ---------------------------------------------------------------- unit ---


@pytest.mark.parametrize("cap_slack", [0, 7, 64])
def test_compact_row_grads_exact(cap_slack):
    ids, grads, valid = _dup_heavy()
    true_unique = len({int(i) for i, v in zip(ids, valid) if v})
    cap = true_unique + cap_slack
    ids_c, g_c, valid_c = compact_row_grads(
        jnp.asarray(ids), jnp.asarray(grads), jnp.asarray(valid), R, cap
    )
    ids_c, g_c, valid_c = map(np.asarray, (ids_c, g_c, valid_c))
    assert ids_c.shape == (cap,) and g_c.shape == (cap, D)
    # leading slots: unique real ids ascending; tail: sentinel R
    real = ids_c[:true_unique]
    assert (np.diff(real) > 0).all() and (real < R).all()
    assert (ids_c[true_unique:] == R).all()
    assert (valid_c == (ids_c < R)).all()
    ref = _combined(ids, grads, valid)
    assert set(real.tolist()) == set(ref)
    for k, i in enumerate(real):
        np.testing.assert_allclose(
            g_c[k], ref[int(i)], rtol=1e-5, atol=1e-5
        )
    # tail grads don't matter for correctness (sentinel rows drop), but
    # they must be finite so downstream math can't poison anything
    assert np.isfinite(g_c).all()


def test_unique_slot_cap_hard_bound_randomized():
    """The cap must bound the true unique count for ANY id realization —
    that is the guarantee that lets compact_row_grads skip an overflow
    branch. Randomized packed layouts: tables of random size take random
    slot shares; ids drawn within each table's rows."""
    rng = np.random.RandomState(42)
    for trial in range(25):
        n_slots = 512 * rng.randint(1, 5)
        n_tables = rng.randint(1, 8)
        # random slot split
        cuts = np.sort(rng.choice(n_slots, n_tables - 1, replace=False)) \
            if n_tables > 1 else np.array([], np.int64)
        bounds = np.concatenate([[0], cuts, [n_slots]])
        rows = rng.randint(1, 5000, n_tables)
        ids = np.empty(n_slots, np.int32)
        dev = []
        for t in range(n_tables):
            lo, hi = bounds[t], bounds[t + 1]
            ids[lo:hi] = rng.randint(0, rows[t], hi - lo)
            dev.append((int(rows[t]), (hi - lo) / n_slots))
        true_unique = sum(
            len(np.unique(ids[bounds[t]:bounds[t + 1]]))
            for t in range(n_tables)
        )
        cap = unique_slot_cap((tuple(dev),), n_slots)
        assert cap >= true_unique, (trial, cap, true_unique)
        assert cap <= n_slots


def test_unique_slot_cap_worst_device_gates():
    # SPMD compiles one program: the max over devices is the cap
    dev_small = ((4, 1.0),)     # 4 unique rows max
    dev_big = ((10_000, 1.0),)  # slot-bound
    assert unique_slot_cap((dev_small, dev_big), 1024) == 1024
    assert unique_slot_cap((dev_small,), 1024) == 4
    # empty-device tuples are layout placeholders, not caps
    assert unique_slot_cap((dev_small, ()), 1024) == 4
    assert unique_slot_cap((), 1024) == 1024


def test_use_compact_prepass_decision():
    n = 8192
    # cap ~= N: nothing saved, must not engage
    assert not use_compact_prepass(n, n - 64)
    # cap << N: saving (N-cap)*26ns dwarfs N*5ns + cap*8.6ns, must engage
    assert use_compact_prepass(n, n // 8)
    # exact threshold sanity: monotone in cap
    engaged = [use_compact_prepass(n, c) for c in range(128, n, 128)]
    assert engaged == sorted(engaged, reverse=True)
    # the saving really is priced in scatter-dispatch ns
    assert SCATTER_NS_PER_ROW > 0


# ------------------------------------------------------------- dispatch ---


def _run_update(optim, ids, grads, valid, unique_entries, monkeypatch,
                mode, wd=0.0):
    monkeypatch.setenv("TORCHREC_TPU_COMPACT", mode)
    opt = init_fused_optimizer_state(R, D, optim)
    rng = np.random.RandomState(9)
    w = jnp.asarray(rng.randn(R, D).astype(np.float32))
    return apply_fused_update(
        w, opt, jnp.asarray(ids), jnp.asarray(grads), jnp.asarray(valid),
        jnp.float32(0.05), weight_decay=wd, unique_entries=unique_entries,
    )


@pytest.mark.parametrize("optim", list(EmbOptimType))
def test_compact_parity_all_optimizers(optim, monkeypatch):
    """Parity compacted vs uncompacted on a duplicate-heavy stream.

    For every optimizer that combines duplicates before the state math,
    both paths use the same `_run_totals` chunked one-hot matmul over
    the same sorted order, so weights and momentum must agree
    BIT-EXACTLY. (Exception: plain SGD's fast path scatter-adds the
    per-token `-lr*g_i` WITHOUT combining — linear, exact in exact
    arithmetic, but scale-then-sum rounds differently from the compacted
    sum-then-scale, so SGD is allclose rather than bit-equal.)"""
    ids, grads, valid = _dup_heavy(seed=3)
    ue = (((R, 1.0),),)
    w_n, opt_n = _run_update(
        optim, ids, grads, valid, ue, monkeypatch, "never"
    )
    w_a, opt_a = _run_update(
        optim, ids, grads, valid, ue, monkeypatch, "always"
    )
    if optim in (EmbOptimType.SGD, EmbOptimType.EXACT_SGD):
        np.testing.assert_allclose(
            np.asarray(w_n), np.asarray(w_a), rtol=1e-6, atol=1e-6
        )
    else:
        assert (np.asarray(w_n) == np.asarray(w_a)).all(), optim
    for field in ("momentum1", "momentum2"):
        m_n, m_a = getattr(opt_n, field), getattr(opt_a, field)
        assert (m_n is None) == (m_a is None)
        if m_n is not None:
            assert (np.asarray(m_n) == np.asarray(m_a)).all(), (
                optim, field
            )


def test_compact_parity_with_weight_decay(monkeypatch):
    ids, grads, valid = _dup_heavy(seed=5)
    ue = (((R, 1.0),),)
    w_n, _ = _run_update(
        EmbOptimType.ADAGRAD, ids, grads, valid, ue, monkeypatch,
        "never", wd=0.01,
    )
    w_a, _ = _run_update(
        EmbOptimType.ADAGRAD, ids, grads, valid, ue, monkeypatch,
        "always", wd=0.01,
    )
    assert (np.asarray(w_n) == np.asarray(w_a)).all()


def _spy(monkeypatch):
    calls = []
    orig = fu.compact_row_grads

    def wrapper(*a, **k):
        calls.append(a[-1])  # cap
        return orig(*a, **k)

    monkeypatch.setattr(fu, "compact_row_grads", wrapper)
    return calls


def test_override_controls_engagement(monkeypatch):
    ids, grads, valid = _dup_heavy(seed=7)
    ue = (((R, 1.0),),)  # cap 96 -> rounds to 512 < 2048: engageable

    calls = _spy(monkeypatch)
    _run_update(EmbOptimType.EXACT_SGD, ids, grads, valid, ue,
                monkeypatch, "never")
    assert calls == []

    _run_update(EmbOptimType.EXACT_SGD, ids, grads, valid, ue,
                monkeypatch, "always")
    assert calls == [512]  # 96 rounded up to the 512-chunk multiple

    # auto consults the cost model: cap 512 vs N 2048 -> saving
    # (2048-512)*26 = 39936 ns vs cost 2048*5 + 512*8.6 ~ 14643 ns
    # -> 1.5x margin met, engages
    calls.clear()
    _run_update(EmbOptimType.EXACT_SGD, ids, grads, valid, ue,
                monkeypatch, "auto")
    assert calls == [512]
    assert use_compact_prepass(N, 512)


def test_no_engage_when_cap_not_binding(monkeypatch):
    """unique_entries that can't shrink the slot list (cap >= N) must
    leave the stream untouched in every mode."""
    ids, grads, valid = _dup_heavy(seed=8, r=50_000)
    ue = (((50_000, 1.0),),)  # cap = min(2048, 50000) = N -> not binding
    calls = _spy(monkeypatch)
    for mode in ("never", "auto", "always"):
        _run_update(EmbOptimType.EXACT_SGD, ids, grads, valid, ue,
                    monkeypatch, mode)
    assert calls == []


def test_no_engage_on_unaligned_shapes(monkeypatch):
    """N not a 512-multiple / too small / D not 128-aligned: the
    pre-pass must stay out (the chunked matmul needs the alignment)."""
    calls = _spy(monkeypatch)
    rng = np.random.RandomState(11)
    for n, d in ((2000, 128), (1024, 128), (2048, 64)):
        ids = rng.randint(0, 8, n).astype(np.int32)
        grads = rng.randn(n, d).astype(np.float32)
        w = jnp.asarray(rng.randn(R, d).astype(np.float32))
        opt = init_fused_optimizer_state(R, d, EmbOptimType.EXACT_SGD)
        monkeypatch.setenv("TORCHREC_TPU_COMPACT", "always")
        apply_fused_update(
            w, opt, jnp.asarray(ids), jnp.asarray(grads),
            jnp.ones((n,), bool), jnp.float32(0.05),
            unique_entries=(((8, 1.0),),),
        )
    assert calls == []


def test_cap_rounds_to_chunk_multiple():
    """The engage site rounds the cap up to a 512 multiple so the
    downstream _run_totals matmul keeps its chunked form."""
    cap = unique_slot_cap((((R, 1.0),),), N)
    assert cap == R
    rounded = min(N, -(-cap // 512) * 512)
    assert rounded == 512 and rounded % 512 == 0


# ------------------------------------------------------- through DMP ---


def test_compact_engages_and_matches_through_dmp(monkeypatch):
    """Pod-mix regime through the FULL sharded train step: tiny tables
    (the MLPerf shard's 3-row-table case) make the layout cap bind, the
    pre-pass engages inside the RW strategy's shard_map program, and
    3 training steps match the uncompacted run on every table."""
    import flax.linen as nn
    import jax
    import optax

    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    B, L, D_ = 512, 1, 128
    rows = (8, 8, 8, 8)  # tiny: unique rows << slots, cap binds hard
    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=rows[i], embedding_dim=D_, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i in range(4)
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
        vals = np.concatenate(
            [r.randint(0, rows[i], B).astype(np.int32) for i in range(4)]
        )
        sb = KeyedJaggedTensor.from_lengths(
            [f"f{i}" for i in range(4)], jnp.asarray(vals),
            jnp.asarray(np.ones((4 * B,), np.int32)),
        ).to_padded(L)
        return sb, jnp.asarray((vals[:B] % 2).astype(np.float32))

    def train(mode, spy_calls=None):
        monkeypatch.setenv("TORCHREC_TPU_COMPACT", mode)
        dmp = DistributedModelParallel(
            M(ebc=EmbeddingBagCollection(tables=tables,
                                         max_feature_length=L)),
            env=ShardingEnv.from_devices(),
            plan=ShardingPlan({"ebc": {
                f"t{i}": ParameterSharding(ShardingType.ROW_WISE)
                for i in range(4)
            }}),
            fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
            fused_params={"learning_rate": 0.1},
            dense_optimizer=optax.sgd(0.05),
        )
        sb0, lab0 = batch(0)
        state = dmp.init(jax.random.PRNGKey(0), sb0, lab0)
        step = dmp.make_train_step(donate=False)
        for i in range(3):
            state, _, _ = step(state, *batch(i))
        return dmp.state_dict(state)["embeddings/ebc"]

    base = train("never")
    calls = _spy(monkeypatch)
    got = train("always")
    assert calls, "compaction pre-pass never engaged through DMP"
    for name in base:
        np.testing.assert_allclose(
            got[name], base[name], rtol=1e-6, atol=1e-7, err_msg=name
        )


def test_compact_engages_through_twrw(monkeypatch):
    """Hierarchical (TWRW) wiring: tiny tables on one host make the
    per-device cap bind; the pre-pass engages inside the TWRW shard_map
    update and matches the uncompacted result."""
    import jax

    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.parallel import (
        ParameterSharding,
        ShardedEmbeddingBagCollection,
        ShardingEnv,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    B2, L2, D2 = 512, 1, 128
    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=8, embedding_dim=D2, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i in range(4)
    )
    env = ShardingEnv.from_devices(local_size=4)
    plan = {
        f"t{i}": ParameterSharding(
            ShardingType.TABLE_ROW_WISE, host=0
        )
        for i in range(4)
    }
    rng = np.random.RandomState(0)
    dense = {
        t.name: rng.randn(8, D2).astype(np.float32) for t in tables
    }
    vals = np.concatenate(
        [rng.randint(0, 8, B2).astype(np.int32) for _ in range(4)]
    )
    sb = KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(4)], jnp.asarray(vals),
        jnp.asarray(np.ones((4 * B2,), np.int32)),
    ).to_padded(L2)
    d_values = jnp.asarray(
        rng.randn(B2, 4 * D2).astype(np.float32)
    )

    def run(mode):
        monkeypatch.setenv("TORCHREC_TPU_COMPACT", mode)
        sebc = ShardedEmbeddingBagCollection(env, tables, plan)
        states = sebc.shard_from_dense(dense)
        new_states = jax.jit(sebc.update)(
            states, sb, d_values, jnp.float32(0.1)
        )
        return sebc.unshard_to_dense(new_states)

    base = run("never")
    calls = _spy(monkeypatch)
    got = run("always")
    assert calls, "pre-pass never engaged through TWRW"
    for name in base:
        np.testing.assert_allclose(
            got[name], base[name], rtol=1e-6, atol=1e-7, err_msg=name
        )
