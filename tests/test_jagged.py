"""Sparse-core tests, modeled on the reference's test strategy
(ref: torchrec/sparse/tests/test_jagged_tensor.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.sparse import (
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
    PaddedSparseBatch,
    lengths_to_offsets,
    offsets_to_lengths,
    jagged_segment_ids,
)
from torchrec_tpu.sparse.jagged import jagged_permute_indices


def test_lengths_offsets_roundtrip():
    lengths = jnp.array([2, 0, 3, 1], dtype=jnp.int32)
    offsets = lengths_to_offsets(lengths)
    np.testing.assert_array_equal(np.asarray(offsets), [0, 2, 2, 5, 6])
    np.testing.assert_array_equal(
        np.asarray(offsets_to_lengths(offsets)), np.asarray(lengths)
    )


def test_segment_ids():
    lengths = jnp.array([2, 0, 3], dtype=jnp.int32)
    seg = jagged_segment_ids(lengths, total=7)
    np.testing.assert_array_equal(np.asarray(seg), [0, 0, 2, 2, 2, 3, 3])


def test_jagged_tensor_to_padded_dense():
    jt = JaggedTensor(
        values=jnp.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        lengths=jnp.array([2, 0, 3], dtype=jnp.int32),
    )
    dense = jt.to_padded_dense(3, padding_value=-1.0)
    np.testing.assert_array_equal(
        np.asarray(dense),
        [[1.0, 2.0, -1.0], [-1.0, -1.0, -1.0], [3.0, 4.0, 5.0]],
    )


def test_jagged_from_dense_lengths_roundtrip():
    dense = jnp.arange(12.0).reshape(4, 3)
    lengths = jnp.array([1, 3, 0, 2], dtype=jnp.int32)
    jt = JaggedTensor.from_dense_lengths(dense, lengths)
    rows = jt.to_dense()
    np.testing.assert_array_equal(rows[0], [0.0])
    np.testing.assert_array_equal(rows[1], [3.0, 4.0, 5.0])
    np.testing.assert_array_equal(rows[2], [])
    np.testing.assert_array_equal(rows[3], [9.0, 10.0])


def _example_kjt():
    #       f1 row0: [1,2]   f1 row1: []     f1 row2: [3]
    #       f2 row0: [4]     f2 row1: [5,6]  f2 row2: [7,8,9]
    return KeyedJaggedTensor.from_lengths(
        keys=["f1", "f2"],
        values=jnp.array([1, 2, 3, 4, 5, 6, 7, 8, 9], dtype=jnp.int32),
        lengths=jnp.array([2, 0, 1, 1, 2, 3], dtype=jnp.int32),
    )


def test_kjt_basic_views():
    kjt = _example_kjt()
    assert kjt.stride == 3
    assert kjt.keys == ("f1", "f2")
    np.testing.assert_array_equal(np.asarray(kjt.length_per_key()), [3, 6])
    np.testing.assert_array_equal(np.asarray(kjt.offset_per_key()), [0, 3, 9])


def test_kjt_getitem_and_to_dict():
    kjt = _example_kjt()
    d = kjt.to_dict()
    np.testing.assert_array_equal(np.asarray(d["f1"].values), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(d["f1"].lengths), [2, 0, 1])
    np.testing.assert_array_equal(np.asarray(d["f2"].values), [4, 5, 6, 7, 8, 9])
    np.testing.assert_array_equal(np.asarray(d["f2"].lengths), [1, 2, 3])


def test_kjt_permute():
    kjt = _example_kjt()
    p = kjt.permute([1, 0])
    assert p.keys == ("f2", "f1")
    np.testing.assert_array_equal(
        np.asarray(p.values), [4, 5, 6, 7, 8, 9, 1, 2, 3]
    )
    np.testing.assert_array_equal(np.asarray(p.lengths), [1, 2, 3, 2, 0, 1])


def test_kjt_permute_jit_safe():
    kjt = _example_kjt()
    fn = jax.jit(lambda k: k.permute([1, 0]))
    p = fn(kjt)
    np.testing.assert_array_equal(
        np.asarray(p.values), [4, 5, 6, 7, 8, 9, 1, 2, 3]
    )


def test_kjt_split():
    kjt = _example_kjt()
    a, b = kjt.split([1, 1])
    assert a.keys == ("f1",)
    np.testing.assert_array_equal(np.asarray(a.values), [1, 2, 3])
    assert b.keys == ("f2",)
    np.testing.assert_array_equal(np.asarray(b.values), [4, 5, 6, 7, 8, 9])


def test_kjt_concat_roundtrip():
    kjt = _example_kjt()
    a, b = kjt.split([1, 1])
    back = KeyedJaggedTensor.concat([a, b])
    np.testing.assert_array_equal(np.asarray(back.values), np.asarray(kjt.values))
    np.testing.assert_array_equal(np.asarray(back.lengths), np.asarray(kjt.lengths))
    assert back.keys == kjt.keys


def test_kjt_to_padded_and_back():
    kjt = _example_kjt()
    p = kjt.to_padded(max_length=3, pad_id=0)
    assert p.ids.shape == (2, 3, 3)
    np.testing.assert_array_equal(
        np.asarray(p.ids[0]), [[1, 2, 0], [0, 0, 0], [3, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(p.ids[1]), [[4, 0, 0], [5, 6, 0], [7, 8, 9]]
    )
    np.testing.assert_array_equal(np.asarray(p.lengths), [[2, 0, 1], [1, 2, 3]])
    back = p.to_kjt()
    np.testing.assert_array_equal(
        np.asarray(back.values)[:9], np.asarray(kjt.values)
    )
    np.testing.assert_array_equal(np.asarray(back.lengths), np.asarray(kjt.lengths))


def test_kjt_to_padded_truncates():
    kjt = _example_kjt()
    p = kjt.to_padded(max_length=2)
    np.testing.assert_array_equal(np.asarray(p.ids[1]), [[4, 0], [5, 6], [7, 8]])
    np.testing.assert_array_equal(np.asarray(p.lengths[1]), [1, 2, 2])


def test_padded_select_features():
    kjt = _example_kjt()
    p = kjt.to_padded(3)
    sel = p.select_features([1])
    assert sel.keys == ("f2",)
    np.testing.assert_array_equal(np.asarray(sel.ids[0, 2]), [7, 8, 9])


def test_kjt_weighted():
    kjt = KeyedJaggedTensor.from_lengths(
        keys=["w"],
        values=jnp.array([10, 11, 12], dtype=jnp.int32),
        lengths=jnp.array([1, 2], dtype=jnp.int32),
        weights=jnp.array([0.5, 1.5, 2.5]),
    )
    p = kjt.to_padded(2)
    np.testing.assert_allclose(np.asarray(p.weights[0]), [[0.5, 0.0], [1.5, 2.5]])


def test_jagged_permute_indices_static_total():
    lengths = jnp.array([2, 1, 3], dtype=jnp.int32)
    perm = jnp.array([2, 0, 1])
    src = jagged_permute_indices(lengths, perm, total=8)
    values = jnp.array([10, 11, 20, 30, 31, 32, 0, 0])
    out = values[src]
    np.testing.assert_array_equal(np.asarray(out)[:6], [30, 31, 32, 10, 11, 20])


def test_keyed_tensor():
    kt = KeyedTensor.from_tensor_list(
        ["a", "b"], [jnp.ones((2, 3)), jnp.full((2, 2), 2.0)]
    )
    assert kt.values.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(kt["b"]), [[2.0, 2.0], [2.0, 2.0]])
    d = kt.to_dict()
    assert d["a"].shape == (2, 3)


def test_keyed_tensor_regroup():
    kt1 = KeyedTensor.from_tensor_list(["a", "b"], [jnp.ones((2, 1)), 2 * jnp.ones((2, 1))])
    kt2 = KeyedTensor.from_tensor_list(["c"], [3 * jnp.ones((2, 1))])
    groups = KeyedTensor.regroup([kt1, kt2], [["a", "c"], ["b"]])
    np.testing.assert_array_equal(np.asarray(groups[0]), [[1.0, 3.0], [1.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(groups[1]), [[2.0], [2.0]])


def test_kjt_is_pytree():
    kjt = _example_kjt()
    leaves, treedef = jax.tree_util.tree_flatten(kjt)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.keys == kjt.keys
    np.testing.assert_array_equal(np.asarray(rebuilt.values), np.asarray(kjt.values))
