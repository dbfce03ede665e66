"""Embedding kernel tests: lookup vs hand computation, fused optimizer vs
dense-gradient eager reference (ref test idea:
torchrec/distributed/tests/test_fused_optim.py — fused vs eager parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.ops import (
    EmbOptimType,
    PoolingMode,
    apply_fused_update,
    batched_embedding_lookup,
    dedup_row_grads,
    init_fused_optimizer_state,
    pooled_grad_to_row_grads,
)
from torchrec_tpu.ops.embedding import embedding_bag_lookup, make_row_offsets


def _manual_pooled(weights, ids, lengths, mean=False, psw=None):
    F, B, L = ids.shape
    out = np.zeros((F, B, weights.shape[1]), dtype=np.float32)
    for f in range(F):
        for b in range(B):
            for l in range(int(lengths[f, b])):
                w = 1.0 if psw is None else psw[f, b, l]
                out[f, b] += w * np.asarray(weights)[ids[f, b, l]]
            if mean and lengths[f, b] > 0:
                out[f, b] /= lengths[f, b]
    return out


def test_batched_lookup_sum():
    rng = np.random.RandomState(0)
    weights = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 5, size=(2, 3, 2)), dtype=jnp.int32)
    lengths = jnp.asarray([[2, 1, 0], [1, 2, 2]], dtype=jnp.int32)
    offs = make_row_offsets([5, 5])
    out = batched_embedding_lookup(weights, ids, lengths, offs)
    manual = _manual_pooled(
        np.asarray(weights), np.asarray(ids + offs[:, None, None]), np.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-6)


def test_batched_lookup_mean_and_none():
    rng = np.random.RandomState(1)
    weights = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 8, size=(1, 2, 3)), dtype=jnp.int32)
    lengths = jnp.asarray([[3, 2]], dtype=jnp.int32)
    offs = make_row_offsets([8])
    mean = batched_embedding_lookup(weights, ids, lengths, offs, PoolingMode.MEAN)
    manual = _manual_pooled(np.asarray(weights), np.asarray(ids), np.asarray(lengths), mean=True)
    np.testing.assert_allclose(np.asarray(mean), manual, rtol=1e-6)

    seq = batched_embedding_lookup(weights, ids, lengths, offs, PoolingMode.NONE)
    assert seq.shape == (1, 2, 3, 3)
    # pad token (b=1, l=2) must be zeroed
    np.testing.assert_allclose(np.asarray(seq[0, 1, 2]), np.zeros(3))


def test_weighted_lookup():
    weights = jnp.eye(4, dtype=jnp.float32)
    ids = jnp.asarray([[[0, 1]]], dtype=jnp.int32)
    lengths = jnp.asarray([[2]], dtype=jnp.int32)
    psw = jnp.asarray([[[0.5, 2.0]]], dtype=jnp.float32)
    out = batched_embedding_lookup(
        weights, ids, lengths, make_row_offsets([4]), per_sample_weights=psw
    )
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.5, 2.0, 0.0, 0.0])


def test_single_bag_matches_batched():
    rng = np.random.RandomState(2)
    weights = jnp.asarray(rng.randn(6, 2).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 6, size=(4, 3)), dtype=jnp.int32)
    lengths = jnp.asarray([3, 1, 0, 2], dtype=jnp.int32)
    a = embedding_bag_lookup(weights, ids, lengths)
    b = batched_embedding_lookup(
        weights, ids[None], lengths[None], make_row_offsets([6])
    )[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dedup_row_grads_combines_duplicates():
    ids = jnp.asarray([3, 1, 3, 3, 1, 0], dtype=jnp.int32)
    grads = jnp.ones((6, 2), dtype=jnp.float32)
    valid = jnp.asarray([True, True, True, True, True, False])
    uids, sums = dedup_row_grads(ids, grads, valid, num_rows=5)
    acc = {}
    for u, s in zip(np.asarray(uids), np.asarray(sums)):
        if u < 5:
            assert u not in acc
            acc[int(u)] = s
    np.testing.assert_allclose(acc[3], [3.0, 3.0])
    np.testing.assert_allclose(acc[1], [2.0, 2.0])
    assert 0 not in acc  # id 0's only occurrence was invalid (pad token)


def test_run_total_row_grads_matches_dedup():
    """run_total_row_grads (scatter-free combine for the per-slot Pallas
    kernels) must expose the same {real id: total grad} map as
    dedup_row_grads, with every dup/invalid slot on the skip sentinel."""
    from torchrec_tpu.ops.fused_update import run_total_row_grads

    rng = np.random.RandomState(3)
    N, D, R = 96, 4, 17
    ids = jnp.asarray(rng.randint(0, R, N), jnp.int32)
    grads = jnp.asarray(rng.randn(N, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(N) > 0.3)
    uids_d, sums_d = dedup_row_grads(ids, grads, valid, R)
    uids_r, sums_r = run_total_row_grads(ids, grads, valid, R)
    assert uids_r.shape == (N,) and sums_r.shape == (N, D)

    def as_map(uids, sums, cap):
        out = {}
        for u, s in zip(np.asarray(uids), np.asarray(sums)):
            if u < cap:
                assert u not in out
                out[int(u)] = s
        return out

    md = as_map(uids_d, sums_d, R)
    mr = as_map(uids_r, sums_r, R)
    assert set(md) == set(mr)
    for k in md:
        np.testing.assert_allclose(mr[k], md[k], rtol=1e-6, atol=1e-7)
    # non-real slots sit exactly on the pad sentinel the wave kernels skip
    sent = np.asarray(uids_r)[np.asarray(uids_r) >= R]
    assert (sent == 2**31 - 1).all()


def _dense_reference_step(weights, m_state, ids, lengths, d_pooled, lr, eps, optim):
    """Eager dense-grad reference: scatter full grads then apply optimizer
    row-wise over ALL rows (zero rows are no-ops for these optimizers)."""
    R, D = weights.shape
    F, B, L = ids.shape
    dense_grad = np.zeros((R, D), dtype=np.float32)
    for f in range(F):
        for b in range(B):
            for l in range(int(lengths[f, b])):
                dense_grad[ids[f, b, l]] += d_pooled[f, b]
    w = np.asarray(weights).copy()
    if optim is EmbOptimType.SGD:
        w -= lr * dense_grad
        return w, m_state
    if optim is EmbOptimType.ROWWISE_ADAGRAD:
        m = np.asarray(m_state).copy()
        touched = np.abs(dense_grad).sum(axis=1) > 0
        m[touched] += (dense_grad[touched] ** 2).mean(axis=1)
        w[touched] -= lr * dense_grad[touched] / (np.sqrt(m[touched])[:, None] + eps)
        return w, m
    if optim is EmbOptimType.ADAGRAD:
        m = np.asarray(m_state).copy()
        touched = np.abs(dense_grad).sum(axis=1) > 0
        m[touched] += dense_grad[touched] ** 2
        w[touched] -= lr * dense_grad[touched] / (np.sqrt(m[touched]) + eps)
        return w, m
    raise ValueError(optim)


@pytest.mark.parametrize(
    "optim", [EmbOptimType.SGD, EmbOptimType.ROWWISE_ADAGRAD, EmbOptimType.ADAGRAD]
)
def test_fused_update_matches_dense_reference(optim):
    rng = np.random.RandomState(3)
    R, D, F, B, L = 12, 4, 2, 3, 2
    weights = jnp.asarray(rng.randn(R, D).astype(np.float32))
    # deliberately include duplicate ids across the batch
    ids = jnp.asarray(
        [[[1, 1], [2, 1], [0, 0]], [[7, 8], [7, 7], [11, 0]]], dtype=jnp.int32
    )
    lengths = jnp.asarray([[2, 2, 1], [2, 2, 1]], dtype=jnp.int32)
    d_pooled = jnp.asarray(rng.randn(F, B, D).astype(np.float32))
    lr, eps = 0.1, 1e-8

    state = init_fused_optimizer_state(R, D, optim)
    row_grads = pooled_grad_to_row_grads(d_pooled, lengths, L)
    mask = np.arange(L)[None, None, :] < np.asarray(lengths)[:, :, None]
    new_w, new_state = apply_fused_update(
        weights,
        state,
        ids.reshape(-1),
        row_grads.reshape(-1, D),
        jnp.asarray(mask.reshape(-1)),
        lr,
        eps=eps,
    )

    ref_w, ref_m = _dense_reference_step(
        weights,
        state.momentum1 if state.momentum1 is not None else 0,
        np.asarray(ids),
        np.asarray(lengths),
        np.asarray(d_pooled),
        lr,
        eps,
        optim,
    )
    np.testing.assert_allclose(np.asarray(new_w), ref_w, rtol=1e-5, atol=1e-6)
    if optim is not EmbOptimType.SGD:
        np.testing.assert_allclose(
            np.asarray(new_state.momentum1), ref_m, rtol=1e-5, atol=1e-6
        )


def test_fused_update_adam_runs_and_touches_only_seen_rows():
    R, D = 6, 2
    weights = jnp.zeros((R, D), dtype=jnp.float32)
    state = init_fused_optimizer_state(R, D, EmbOptimType.ADAM)
    ids = jnp.asarray([0, 0, 3], dtype=jnp.int32)
    grads = jnp.ones((3, D), dtype=jnp.float32)
    valid = jnp.asarray([True, True, True])
    new_w, new_state = apply_fused_update(weights, state, ids, grads, valid, 0.01)
    w = np.asarray(new_w)
    assert np.abs(w[0]).sum() > 0 and np.abs(w[3]).sum() > 0
    np.testing.assert_allclose(w[[1, 2, 4, 5]], 0.0)
    assert int(new_state.step) == 1


def test_fused_update_under_jit_with_donation():
    R, D = 8, 2
    weights = jnp.ones((R, D), dtype=jnp.float32)
    state = init_fused_optimizer_state(R, D, EmbOptimType.ROWWISE_ADAGRAD)

    @jax.jit
    def step(w, s, ids, grads, valid):
        return apply_fused_update(w, s, ids, grads, valid, 0.1)

    ids = jnp.asarray([1, 2, 1], dtype=jnp.int32)
    grads = jnp.ones((3, D), dtype=jnp.float32)
    valid = jnp.asarray([True, True, False])
    new_w, _ = step(weights, state, ids, grads, valid)
    w = np.asarray(new_w)
    assert w[1, 0] < 1.0 and w[2, 0] < 1.0
    np.testing.assert_allclose(w[3], 1.0)
