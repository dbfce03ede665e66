"""Extended fused-optimizer parity vs eager numpy references.

ref test idea: torchrec/distributed/tests/test_fused_optim.py — fused
(in-backward) optimizers vs eager equivalents; optimizer set from
torchrec OptimType (distributed/embedding_types.py:32-41): LAMB,
PARTIAL_ROWWISE_LAMB, PARTIAL_ROWWISE_ADAM, LARS_SGD.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    apply_fused_update,
    init_fused_optimizer_state,
)

R, D, N = 60, 8, 24
LR = 0.05
EPS = 1e-8
B1, B2 = 0.9, 0.999


def _setup(seed=0, dup=True):
    rng = np.random.RandomState(seed)
    w = rng.randn(R, D).astype(np.float32)
    ids = rng.randint(0, R // (2 if dup else 1), size=(N,)).astype(np.int32)
    grads = rng.randn(N, D).astype(np.float32)
    valid = rng.rand(N) > 0.2
    return w, ids, grads, valid


def _combined(ids, grads, valid):
    """Per-row total gradient over valid tokens (exact dedup semantics)."""
    g = {}
    for i in range(N):
        if valid[i]:
            g.setdefault(int(ids[i]), np.zeros(D, np.float32))
            g[int(ids[i])] += grads[i]
    return g


def _run(optim, w, ids, grads, valid, wd=0.0, **kw):
    opt = init_fused_optimizer_state(R, D, optim)
    new_w, new_opt = apply_fused_update(
        jnp.asarray(w), opt, jnp.asarray(ids), jnp.asarray(grads),
        jnp.asarray(valid), LR, weight_decay=wd, **kw,
    )
    return np.asarray(new_w), new_opt


def test_partial_rowwise_adam():
    w, ids, grads, valid = _setup()
    got_w, got_opt = _run(EmbOptimType.PARTIAL_ROWWISE_ADAM, w, ids, grads, valid)
    ref = w.copy()
    for r, g in _combined(ids, grads, valid).items():
        m1 = (1 - B1) * g
        m2 = (1 - B2) * (g**2).mean()
        m1h = m1 / (1 - B1)
        m2h = m2 / (1 - B2)
        ref[r] -= LR * m1h / (np.sqrt(m2h) + EPS)
    np.testing.assert_allclose(got_w, ref, rtol=1e-5, atol=1e-6)


def test_lamb():
    w, ids, grads, valid = _setup(1)
    got_w, _ = _run(EmbOptimType.LAMB, w, ids, grads, valid, wd=0.01)
    ref = w.copy()
    for r, g in _combined(ids, grads, valid).items():
        m1 = (1 - B1) * g
        m2 = (1 - B2) * g**2
        rt = (m1 / (1 - B1)) / (np.sqrt(m2 / (1 - B2)) + EPS) + 0.01 * w[r]
        wn, rn = np.linalg.norm(w[r]), np.linalg.norm(rt)
        trust = wn / (rn + EPS) if wn > 0 and rn > 0 else 1.0
        ref[r] -= LR * trust * rt
    np.testing.assert_allclose(got_w, ref, rtol=1e-4, atol=1e-5)


def test_partial_rowwise_lamb():
    w, ids, grads, valid = _setup(2)
    got_w, _ = _run(EmbOptimType.PARTIAL_ROWWISE_LAMB, w, ids, grads, valid)
    ref = w.copy()
    for r, g in _combined(ids, grads, valid).items():
        m1 = (1 - B1) * g
        m2 = (1 - B2) * (g**2).mean()
        rt = (m1 / (1 - B1)) / (np.sqrt(m2 / (1 - B2)) + EPS)
        wn, rn = np.linalg.norm(w[r]), np.linalg.norm(rt)
        trust = wn / (rn + EPS) if wn > 0 and rn > 0 else 1.0
        ref[r] -= LR * trust * rt
    np.testing.assert_allclose(got_w, ref, rtol=1e-4, atol=1e-5)


def test_lars_sgd():
    w, ids, grads, valid = _setup(3)
    eta, mom, wd = 0.01, 0.9, 0.05
    got_w, got_opt = _run(
        EmbOptimType.LARS_SGD, w, ids, grads, valid,
        wd=wd, eta=eta, momentum=mom,
    )
    ref = w.copy()
    for r, g in _combined(ids, grads, valid).items():
        wn = np.linalg.norm(w[r])
        gn = np.linalg.norm(g)
        denom = gn + wd * wn
        lr_adj = LR * eta * wn / (denom + EPS) if wn > 0 and denom > 0 else LR
        m = mom * 0.0 + lr_adj * (g + wd * w[r])
        ref[r] -= m
    np.testing.assert_allclose(got_w, ref, rtol=1e-4, atol=1e-5)


def test_lars_sgd_momentum_accumulates():
    w, ids, grads, valid = _setup(4)
    opt = init_fused_optimizer_state(R, D, EmbOptimType.LARS_SGD)
    w1, opt1 = apply_fused_update(
        jnp.asarray(w), opt, jnp.asarray(ids), jnp.asarray(grads),
        jnp.asarray(valid), LR, eta=0.01, momentum=0.9,
    )
    w2, opt2 = apply_fused_update(
        w1, opt1, jnp.asarray(ids), jnp.asarray(grads),
        jnp.asarray(valid), LR, eta=0.01, momentum=0.9,
    )
    # second step moves further than a fresh-momentum step would
    touched = sorted(_combined(ids, grads, valid).keys())
    step1 = np.abs(np.asarray(w1) - w)[touched].sum()
    step2 = np.abs(np.asarray(w2) - np.asarray(w1))[touched].sum()
    assert step2 > step1  # momentum accumulated


@pytest.mark.parametrize(
    "optim",
    [EmbOptimType.PARTIAL_ROWWISE_ADAM, EmbOptimType.LAMB,
     EmbOptimType.PARTIAL_ROWWISE_LAMB, EmbOptimType.LARS_SGD],
    ids=lambda o: o.value,
)
def test_untouched_rows_unchanged(optim):
    w, ids, grads, valid = _setup(5)
    got_w, _ = _run(optim, w, ids, grads, valid)
    touched = set(_combined(ids, grads, valid).keys())
    untouched = [r for r in range(R) if r not in touched]
    np.testing.assert_array_equal(got_w[untouched], w[untouched])


def test_run_totals_matmul_path_matches_segment_sum():
    """The chunked-MXU run-total computation (hit when N%512==0, D%128==0)
    must equal segment_sum exactly, incl. runs spanning chunk borders."""
    from torchrec_tpu.ops.fused_update import _RUN_TOTAL_CHUNK, _run_totals
    import jax

    rng = np.random.RandomState(0)
    N2, D2 = 8 * _RUN_TOTAL_CHUNK, 128
    g = jnp.asarray(rng.randn(N2, D2).astype(np.float32))
    # run starts with long runs crossing chunk boundaries
    starts = []
    i = 0
    while i < N2:
        run = int(rng.choice([1, 2, 3, 700, 1200]))
        starts.extend([i] * min(run, N2 - i))
        i += run
    rs = jnp.asarray(np.asarray(starts[:N2], np.int32))
    got = _run_totals(g, rs)
    want = jax.ops.segment_sum(g, rs, num_segments=N2, indices_are_sorted=True)
    # accumulation order differs (tree vs sequential) for long runs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4)


def test_rowwise_adagrad_large_aligned_batch():
    """Exercise apply_fused_update through the matmul run-total path."""
    from torchrec_tpu.ops.fused_update import _RUN_TOTAL_CHUNK

    rng = np.random.RandomState(1)
    N2 = 4 * _RUN_TOTAL_CHUNK
    R2, D2 = 300, 128
    w = rng.randn(R2, D2).astype(np.float32)
    ids = rng.randint(0, R2, size=(N2,)).astype(np.int32)
    grads = rng.randn(N2, D2).astype(np.float32)
    valid = rng.rand(N2) > 0.1
    opt = init_fused_optimizer_state(R2, D2, EmbOptimType.ROWWISE_ADAGRAD)
    new_w, new_opt = apply_fused_update(
        jnp.asarray(w), opt, jnp.asarray(ids), jnp.asarray(grads),
        jnp.asarray(valid), LR,
    )
    # eager exact reference
    totals = {}
    for i in range(N2):
        if valid[i]:
            totals.setdefault(int(ids[i]), np.zeros(D2, np.float32))
            totals[int(ids[i])] += grads[i]
    ref = w.copy()
    m_ref = np.zeros(R2, np.float32)
    for r, gt in totals.items():
        m_ref[r] = (gt**2).mean()
        ref[r] -= LR * gt / (np.sqrt(m_ref[r]) + EPS)
    np.testing.assert_allclose(np.asarray(new_w), ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(new_opt.momentum1), m_ref, rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize(
    "optim",
    [EmbOptimType.LAMB, EmbOptimType.PARTIAL_ROWWISE_ADAM,
     EmbOptimType.LARS_SGD, EmbOptimType.PARTIAL_ROWWISE_LAMB],
    ids=lambda o: o.value,
)
def test_new_optimizers_through_sharded_ebc(optim):
    """The extended optimizers run through the RW-sharded module and match
    a direct unsharded apply_fused_update."""
    import jax

    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.parallel import (
        ParameterSharding,
        ShardedEmbeddingBagCollection,
        ShardingEnv,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rng = np.random.RandomState(0)
    R2, D2, B2 = 64, 16, 16
    dense = {"t0": rng.randn(R2, D2).astype(np.float32)}
    tables = (EmbeddingBagConfig(num_embeddings=R2, embedding_dim=D2,
                                 name="t0", feature_names=["f0"]),)
    env = ShardingEnv.from_devices()
    ebc = ShardedEmbeddingBagCollection(
        env, tables, {"t0": ParameterSharding(ShardingType.ROW_WISE)},
        optim=optim,
    )
    states = ebc.shard_from_dense(dense)
    ids = rng.randint(0, R2, size=(B2,)).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.asarray(ids), jnp.asarray(np.ones(B2, np.int32))
    ).to_padded(1)
    d_vals = rng.randn(B2, D2).astype(np.float32)
    new_states = jax.jit(ebc.update)(states, sb, jnp.asarray(d_vals), LR)
    got = ebc.unshard_to_dense(new_states)["t0"]

    # unsharded reference: rows padded like RW (8 devices -> block 8)
    opt = init_fused_optimizer_state(R2, D2, optim)
    ref_w, _ = apply_fused_update(
        jnp.asarray(dense["t0"]), opt, jnp.asarray(ids),
        jnp.asarray(d_vals), jnp.ones((B2,), bool), LR,
    )
    np.testing.assert_allclose(got, np.asarray(ref_w), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_rowwise_adagrad_vs_numpy_oracle(seed):
    """Randomized property sweep: shapes, duplicate patterns, validity
    masks, weight decay — exact eager-numpy oracle parity."""
    rng = np.random.RandomState(1000 + seed)
    R2 = int(rng.randint(8, 120))
    D2 = int(rng.choice([4, 8, 16]))
    N2 = int(rng.randint(1, 80))
    wd = float(rng.choice([0.0, 0.05]))
    lr = 0.07
    eps = 1e-8
    w = rng.randn(R2, D2).astype(np.float32)
    ids = rng.randint(0, max(1, R2 // int(rng.choice([1, 3]))),
                      size=(N2,)).astype(np.int32)
    grads = rng.randn(N2, D2).astype(np.float32)
    valid = rng.rand(N2) > float(rng.choice([0.0, 0.4, 0.9]))
    m0 = np.abs(rng.randn(R2)).astype(np.float32)

    opt = init_fused_optimizer_state(R2, D2, EmbOptimType.ROWWISE_ADAGRAD)
    opt = opt.replace(momentum1=jnp.asarray(m0))
    new_w, new_opt = apply_fused_update(
        jnp.asarray(w), opt, jnp.asarray(ids), jnp.asarray(grads),
        jnp.asarray(valid), lr, eps=eps, weight_decay=wd,
    )

    # oracle
    totals = {}
    for i in range(N2):
        if valid[i]:
            totals.setdefault(int(ids[i]), np.zeros(D2, np.float32))
            totals[int(ids[i])] += grads[i]
    ref_w = w.copy()
    ref_m = m0.copy()
    for r, g in totals.items():
        if wd:
            g = g + wd * w[r]
        ref_m[r] += (g * g).mean()
        ref_w[r] -= lr * g / (np.sqrt(ref_m[r]) + eps)
    np.testing.assert_allclose(np.asarray(new_w), ref_w,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_opt.momentum1), ref_m,
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sgd_fast_path_vs_oracle(seed):
    """The no-dedup SGD fast path must stay exact under duplicates and
    invalid tokens."""
    rng = np.random.RandomState(2000 + seed)
    R2, D2 = int(rng.randint(8, 60)), 8
    N2 = int(rng.randint(1, 100))
    w = rng.randn(R2, D2).astype(np.float32)
    ids = rng.randint(0, max(1, R2 // 4), size=(N2,)).astype(np.int32)
    grads = rng.randn(N2, D2).astype(np.float32)
    valid = rng.rand(N2) > 0.3
    opt = init_fused_optimizer_state(R2, D2, EmbOptimType.SGD)
    new_w, _ = apply_fused_update(
        jnp.asarray(w), opt, jnp.asarray(ids), jnp.asarray(grads),
        jnp.asarray(valid), 0.1,
    )
    ref = w.copy()
    for i in range(N2):
        if valid[i]:
            ref[ids[i]] -= 0.1 * grads[i]
    np.testing.assert_allclose(np.asarray(new_w), ref, rtol=1e-5, atol=1e-5)
