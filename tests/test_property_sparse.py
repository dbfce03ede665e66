"""Property-based (hypothesis) differential tests for the sparse layer.

Every KJT/JT op is checked against a direct per-key numpy oracle on
randomly drawn jagged batches (ragged lengths incl. empty rows/keys,
optional weights). The reference pins these semantics with example-based
tests (torchrec/sparse/tests/test_jagged_tensor.py); random structure
additionally walks the padding/slack edge cases a fixed example set
misses (the r3 all-empty-batch to_padded crash was exactly such a case).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor

SET = settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# -- strategies -------------------------------------------------------------


@st.composite
def kjt_data(draw, max_keys=4, max_batch=5, max_len=4, weighted=None):
    """-> (keys, lengths [F, B] np, values [N] np, weights or None)."""
    F = draw(st.integers(1, max_keys))
    B = draw(st.integers(1, max_batch))
    lengths = np.asarray(
        draw(
            st.lists(
                st.lists(st.integers(0, max_len), min_size=B, max_size=B),
                min_size=F, max_size=F,
            )
        ),
        np.int32,
    )
    n = int(lengths.sum())
    values = np.asarray(
        draw(st.lists(st.integers(0, 999), min_size=n, max_size=n)),
        np.int32,
    )
    if weighted is None:
        weighted = draw(st.booleans())
    weights = None
    if weighted:
        weights = np.asarray(
            draw(
                st.lists(
                    st.floats(-2, 2, allow_nan=False, width=32),
                    min_size=n, max_size=n,
                )
            ),
            np.float32,
        )
    keys = tuple(f"k{i}" for i in range(F))
    return keys, lengths, values, weights


def build_kjt(keys, lengths, values, weights):
    return KeyedJaggedTensor.from_lengths(
        keys,
        jnp.asarray(values),
        jnp.asarray(lengths.reshape(-1)),
        weights=None if weights is None else jnp.asarray(weights),
    )


def oracle_rows(keys, lengths, values, weights):
    """{key: [per-example (vals, w)]} — the plain-python ground truth."""
    out = {}
    pos = 0
    for f, k in enumerate(keys):
        rows = []
        for b in range(lengths.shape[1]):
            ln = int(lengths[f, b])
            w = None if weights is None else weights[pos:pos + ln]
            rows.append((values[pos:pos + ln], w))
            pos += ln
        out[k] = rows
    return out


def assert_kjt_equals(kjt, keys, oracle):
    assert tuple(kjt.keys) == tuple(keys)
    d = kjt.to_dict()
    for k in keys:
        jt = d[k]
        rows = jt.to_dense()
        want = oracle[k]
        assert len(rows) == len(want)
        for got, (vals, w) in zip(rows, want):
            np.testing.assert_array_equal(np.asarray(got), vals)
        if want and want[0][1] is not None:
            wrows = JaggedTensor(
                jt.weights, jt.lengths
            ).to_dense()
            for got_w, (_, w) in zip(wrows, want):
                np.testing.assert_allclose(np.asarray(got_w), w, rtol=1e-6)


# -- properties -------------------------------------------------------------


@SET
@given(kjt_data())
def test_to_dict_matches_oracle(data):
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    assert_kjt_equals(kjt, keys, oracle_rows(keys, lengths, values, weights))


@SET
@given(kjt_data(), st.randoms(use_true_random=False))
def test_permute_matches_oracle(data, rnd):
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    perm = list(range(len(keys)))
    rnd.shuffle(perm)
    out = kjt.permute(perm)
    oracle = oracle_rows(keys, lengths, values, weights)
    assert_kjt_equals(out, [keys[i] for i in perm], oracle)


@SET
@given(kjt_data(), st.data())
def test_split_concat_round_trip(data, dd):
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    F = len(keys)
    # random composition of F into segments
    segs = []
    left = F
    while left > 0:
        s = dd.draw(st.integers(1, left))
        segs.append(s)
        left -= s
    parts = kjt.split(segs)
    assert [len(p.keys) for p in parts] == segs
    back = KeyedJaggedTensor.concat(parts)
    assert_kjt_equals(back, keys, oracle_rows(keys, lengths, values, weights))


@SET
@given(kjt_data())
def test_getitem_matches_oracle(data):
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    oracle = oracle_rows(keys, lengths, values, weights)
    for k in keys:
        rows = kjt[k].to_dense()
        for got, (vals, _) in zip(rows, oracle[k]):
            np.testing.assert_array_equal(np.asarray(got), vals)


@SET
@given(kjt_data(max_len=3), st.integers(3, 5))
def test_to_padded_round_trip(data, L):
    """to_padded clips at L; with L >= every length the padded form holds
    exactly the jagged content (ids beyond each length masked to 0)."""
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    sb = kjt.to_padded(L)
    assert sb.ids.shape == (len(keys), lengths.shape[1], L)
    oracle = oracle_rows(keys, lengths, values, weights)
    ids = np.asarray(sb.ids)
    lens = np.asarray(sb.lengths)
    for f, k in enumerate(keys):
        for b, (vals, w) in enumerate(oracle[k]):
            assert lens[f, b] == len(vals)
            np.testing.assert_array_equal(ids[f, b, : len(vals)], vals)
            # pad slots are zeroed, never leak neighbor ids
            np.testing.assert_array_equal(
                ids[f, b, len(vals):], np.zeros(L - len(vals), np.int32)
            )
            if w is not None:
                np.testing.assert_allclose(
                    np.asarray(sb.weights)[f, b, : len(vals)], w, rtol=1e-6
                )


@SET
@given(kjt_data(max_len=3))
def test_length_per_key_and_offsets(data):
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    np.testing.assert_array_equal(
        np.asarray(kjt.length_per_key()), lengths.sum(axis=1)
    )
    np.testing.assert_array_equal(
        np.asarray(kjt.offset_per_key()),
        np.concatenate([[0], np.cumsum(lengths.sum(axis=1))]),
    )


@SET
@given(kjt_data(max_len=3, weighted=False), st.integers(2, 4))
def test_padded_pooled_sum_matches_oracle(data, L):
    """End-to-end jagged semantics through the padded layout: a masked
    SUM pool over to_padded(L) == per-row sum of the jagged values."""
    keys, lengths, values, weights = data
    kjt = build_kjt(keys, lengths, values, weights)
    sb = kjt.to_padded(max(L, int(lengths.max()) if lengths.size else L))
    mask = np.asarray(sb.mask())  # [F, B, L]
    pooled = (np.asarray(sb.ids) * mask).sum(axis=-1)
    oracle = oracle_rows(keys, lengths, values, weights)
    for f, k in enumerate(keys):
        want = [v.sum() if len(v) else 0 for v, _ in oracle[k]]
        np.testing.assert_array_equal(pooled[f], want)


@SET
@given(
    st.lists(st.integers(0, 63), min_size=1, max_size=200),
    st.integers(1, 4),
)
def test_dedup_row_grads_sums_duplicates(flat_ids, d_pow):
    """ops.fused_update.dedup_row_grads: duplicate ids combine their
    gradient rows exactly; output stays sorted with sentinel tail."""
    from torchrec_tpu.ops.fused_update import dedup_row_grads

    R, D = 64, 4 * d_pow
    ids = np.asarray(flat_ids, np.int32)
    rng = np.random.RandomState(len(flat_ids))
    grads = rng.randn(len(ids), D).astype(np.float32)
    valid = jnp.ones((len(ids),), bool)
    uids, g = dedup_row_grads(
        jnp.asarray(ids), jnp.asarray(grads), valid, R
    )
    uids, g = np.asarray(uids), np.asarray(g)
    want = {}
    for i, r in enumerate(ids):
        want[int(r)] = want.get(int(r), 0) + grads[i]
    live = uids < R
    got = {int(r): g[i] for i, r in enumerate(uids) if live[i]}
    assert set(got) == set(want)
    for r in want:
        np.testing.assert_allclose(got[r], want[r], rtol=1e-5, atol=1e-5)
    # sorted: live ids ascending, sentinels at the tail
    assert np.all(np.diff(uids.astype(np.int64)) >= 0)
