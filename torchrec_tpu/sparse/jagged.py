"""Sparse batch data structures: JaggedTensor, KeyedJaggedTensor, KeyedTensor.

TPU-native re-design of the reference sparse types
(ref: torchrec/sparse/jagged_tensor.py:153,614,1101).

Design notes (this is NOT a port):

* The reference stores jagged data as (values, lengths/offsets) and calls
  FBGEMM CUDA ops (`asynchronous_complete_cumsum`, `permute_2D_sparse_data`)
  for lengths<->offsets and feature reordering. Here every structure is a
  JAX pytree with **static shapes**: `values` has a fixed size decided at
  construction (the dataset / batch config decides the token budget) and
  `lengths` varies in content, never in shape. cumsum/permutes are plain XLA.

* XLA cannot represent data-dependent output shapes, so ops whose result
  size depends on data (`split` by value counts, `to_dict`) are provided in
  two forms: a jit-safe variant where possible, and an eager/numpy variant
  for host-side dataset code.

* The jit compute path uses `PaddedSparseBatch` — a dense [F, B, L] id
  layout with a length mask. This is the single most important TPU design
  decision: it makes every downstream op (permute, split, all_to_all,
  lookup, pooling) a static-shape tensor op that XLA can tile onto the
  MXU/VPU and ship over ICI without host syncs. The jagged <-> padded
  conversion happens once at the data-loading boundary.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


# ---------------------------------------------------------------------------
# lengths <-> offsets (ref: fbgemm asynchronous_complete_cumsum,
# jagged_tensor.py:36 — here a one-line XLA cumsum, no host sync by design)
# ---------------------------------------------------------------------------


def lengths_to_offsets(lengths: Array) -> Array:
    """[N] lengths -> [N+1] complete-cumsum offsets."""
    lengths = jnp.asarray(lengths)
    return jnp.concatenate(
        [jnp.zeros((1,), dtype=lengths.dtype), jnp.cumsum(lengths)]
    )


def offsets_to_lengths(offsets: Array) -> Array:
    """[N+1] offsets -> [N] lengths."""
    return offsets[1:] - offsets[:-1]


def jagged_segment_ids(lengths: Array, total: int) -> Array:
    """Segment id for each of `total` value slots given segment `lengths`.

    Positions beyond sum(lengths) get segment id == len(lengths) (a
    dedicated padding segment). jit-safe: `total` is static.
    """
    offsets = lengths_to_offsets(lengths)
    pos = jnp.arange(total)
    # searchsorted(side='right') - 1 maps position -> owning segment.
    seg = jnp.searchsorted(offsets, pos, side="right") - 1
    return jnp.where(pos < offsets[-1], seg, lengths.shape[0]).astype(jnp.int32)


def _values_permute(
    values: Array,
    in_lengths: Array,
    out_lengths: Array,
    gather_src: Array,
) -> Array:
    del in_lengths, out_lengths
    return values[gather_src]


def jagged_permute_indices(in_lengths: Array, perm: Array, total: int) -> Array:
    """Gather indices realizing a segment-level permutation of jagged values.

    Segments (features x batch rows, or any grouping) of sizes `in_lengths`
    are reordered by `perm` (out segment s reads in segment perm[s]).
    Returns `src` with static shape [total] such that
    `out_values = values[src]`; slots past the real total read slot 0
    (callers keep the same lengths so padding is never consumed).

    ref behavior: fbgemm permute_2D_sparse_data / permute_1D_sparse_data
    (torchrec/sparse/jagged_tensor.py:946, distributed/dist_data.py:249-263)
    — re-designed as a static-shape gather-index computation.
    """
    in_offsets = lengths_to_offsets(in_lengths)
    out_lengths = in_lengths[perm]
    out_offsets = lengths_to_offsets(out_lengths)
    pos = jnp.arange(total)
    seg = jnp.clip(
        jnp.searchsorted(out_offsets, pos, side="right") - 1,
        0,
        perm.shape[0] - 1,
    )
    within = pos - out_offsets[seg]
    src = in_offsets[perm[seg]] + within
    valid = pos < out_offsets[-1]
    return jnp.where(valid, src, 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# JaggedTensor (ref: torchrec/sparse/jagged_tensor.py:153-435)
# ---------------------------------------------------------------------------


@struct.dataclass
class JaggedTensor:
    """Variable-length values with per-row lengths.

    values: [N] or [N, D]; lengths: [B] (row b owns lengths[b] values).
    `weights` is an optional parallel array to `values`.

    Unlike the reference (lazy lengths<->offsets conversion on CUDA), both
    views are cheap XLA ops; we store lengths and derive offsets.
    """

    values: Array
    lengths: Array
    weights: Optional[Array] = None

    @property
    def offsets(self) -> Array:
        return lengths_to_offsets(self.lengths)

    def lengths_or_none(self) -> Optional[Array]:
        return self.lengths

    def weights_or_none(self) -> Optional[Array]:
        return self.weights

    @staticmethod
    def empty(dtype=jnp.int32) -> "JaggedTensor":
        return JaggedTensor(
            values=jnp.zeros((0,), dtype=dtype),
            lengths=jnp.zeros((0,), dtype=jnp.int32),
        )

    @staticmethod
    def from_dense_lengths(
        values: Array, lengths: Array, weights: Optional[Array] = None
    ) -> "JaggedTensor":
        """Dense [B, L(, D)] + lengths [B] -> jagged with padded storage.

        ref: jagged_tensor.py:199. Keeps the dense storage flattened (static
        shape B*L) rather than compacting — compaction is data-dependent.
        Lengths select the valid prefix of each row.
        """
        B, L = values.shape[0], values.shape[1]
        flat = values.reshape((B * L,) + values.shape[2:])
        # Compact valid entries to the front so the jagged contract
        # (row b's values at offsets[b]:offsets[b]+lengths[b]) holds.
        row = jnp.repeat(jnp.arange(B), L)
        col = jnp.tile(jnp.arange(L), B)
        valid = col < lengths[row]
        order = jnp.argsort(~valid, stable=True)  # valid slots first, stable
        out_values = flat[order]
        out_weights = None
        if weights is not None:
            wflat = weights.reshape(B * L, *weights.shape[2:])
            out_weights = wflat[order]
        return JaggedTensor(values=out_values, lengths=lengths, weights=out_weights)

    @staticmethod
    def from_dense(
        values: Sequence[np.ndarray], weights: Optional[Sequence[np.ndarray]] = None
    ) -> "JaggedTensor":
        """Eager (host-side) construction from a list of per-row arrays."""
        lengths = jnp.asarray([len(v) for v in values], dtype=jnp.int32)
        vals = jnp.concatenate([jnp.asarray(v) for v in values]) if values else jnp.zeros((0,))
        w = None
        if weights is not None:
            w = jnp.concatenate([jnp.asarray(x) for x in weights])
        return JaggedTensor(values=vals, lengths=lengths, weights=w)

    def to_padded_dense(
        self, desired_length: int, padding_value: float = 0.0
    ) -> Array:
        """Jagged -> dense [B, desired_length(, D)]. ref: jagged_tensor.py:303."""
        B = self.lengths.shape[0]
        L = desired_length
        offsets = self.offsets
        row = jnp.repeat(jnp.arange(B), L)
        col = jnp.tile(jnp.arange(L), B)
        src = jnp.clip(offsets[row] + col, 0, max(self.values.shape[0] - 1, 0))
        vals = self.values[src]
        valid = col < self.lengths[row]
        if vals.ndim > 1:
            valid = valid[:, None]
        out = jnp.where(valid, vals, jnp.asarray(padding_value, dtype=vals.dtype))
        return out.reshape((B, L) + self.values.shape[1:])

    def to_dense(self) -> List[np.ndarray]:
        """Eager: list of per-row numpy arrays (host-side only)."""
        vals = np.asarray(self.values)
        offs = np.asarray(self.offsets)
        return [vals[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]


# ---------------------------------------------------------------------------
# KeyedJaggedTensor (ref: torchrec/sparse/jagged_tensor.py:614-1081)
# ---------------------------------------------------------------------------


@struct.dataclass
class KeyedJaggedTensor:
    """Multi-feature jagged batch in feature-major [F x B x jagged-L] layout.

    values:  [N] ids (feature-major concatenation; N is STATIC — the batch's
             token budget, >= the real total; slack slots have length 0)
    lengths: [F * B] per-(feature, row) counts, feature-major
    weights: optional [N]
    keys:    static tuple of feature names
    stride:  static batch size B

    ref: KeyedJaggedTensor semantics (split 848, permute 921, __getitem__ 968,
    to_dict 982, concat 731, length_per_key 824). jit-safe ops keep static
    shapes; data-dependent ones are eager.
    """

    values: Array
    lengths: Array
    keys: Tuple[str, ...] = struct.field(pytree_node=False)
    stride: int = struct.field(pytree_node=False)
    weights: Optional[Array] = None

    # -- construction -------------------------------------------------------

    @staticmethod
    def from_lengths(
        keys: Sequence[str],
        values: Array,
        lengths: Array,
        weights: Optional[Array] = None,
        stride: Optional[int] = None,
    ) -> "KeyedJaggedTensor":
        F = len(keys)
        if stride is None:
            assert lengths.shape[0] % F == 0
            stride = lengths.shape[0] // F
        return KeyedJaggedTensor(
            values=jnp.asarray(values),
            lengths=jnp.asarray(lengths, dtype=jnp.int32),
            keys=tuple(keys),
            stride=stride,
            weights=None if weights is None else jnp.asarray(weights),
        )

    @staticmethod
    def from_offsets(
        keys: Sequence[str],
        values: Array,
        offsets: Array,
        weights: Optional[Array] = None,
    ) -> "KeyedJaggedTensor":
        return KeyedJaggedTensor.from_lengths(
            keys, values, offsets_to_lengths(jnp.asarray(offsets)), weights
        )

    @staticmethod
    def empty() -> "KeyedJaggedTensor":
        return KeyedJaggedTensor(
            values=jnp.zeros((0,), dtype=jnp.int32),
            lengths=jnp.zeros((0,), dtype=jnp.int32),
            keys=(),
            stride=0,
        )

    @staticmethod
    def concat(kjts: Sequence["KeyedJaggedTensor"]) -> "KeyedJaggedTensor":
        """Concatenate along the feature axis. ref: jagged_tensor.py:731.

        Static-shape: output N = sum of input Ns. Strides must match.
        """
        stride = kjts[0].stride
        assert all(k.stride == stride for k in kjts)
        keys: Tuple[str, ...] = ()
        for k in kjts:
            keys = keys + k.keys
        values = jnp.concatenate([k.values for k in kjts])
        lengths = jnp.concatenate([k.lengths for k in kjts])
        weights = None
        if any(k.weights is not None for k in kjts):
            weights = jnp.concatenate(
                [
                    k.weights
                    if k.weights is not None
                    else jnp.zeros_like(k.values, dtype=jnp.float32)
                    for k in kjts
                ]
            )
        return KeyedJaggedTensor(
            values=values, lengths=lengths, keys=keys, stride=stride, weights=weights
        )

    # -- derived views ------------------------------------------------------

    @property
    def num_keys(self) -> int:
        return len(self.keys)

    @property
    def offsets(self) -> Array:
        return lengths_to_offsets(self.lengths)

    def length_per_key(self) -> Array:
        """[F] number of values for each key. ref: jagged_tensor.py:824."""
        return self.lengths.reshape(len(self.keys), self.stride).sum(axis=1)

    def offset_per_key(self) -> Array:
        """[F+1] value offsets per key. ref: jagged_tensor.py:835."""
        return lengths_to_offsets(self.length_per_key())

    def lengths_matrix(self) -> Array:
        """[F, B] view of lengths."""
        return self.lengths.reshape(len(self.keys), self.stride)

    def sync(self) -> "KeyedJaggedTensor":
        """No-op: there is no host<->device cache to sync in this design.

        ref: jagged_tensor.py:783 — reference eagerly materializes
        length_per_key/offset_per_key; here they are cheap XLA reductions.
        """
        return self

    # -- jit-safe transforms -------------------------------------------------

    def permute(self, indices: Sequence[int]) -> "KeyedJaggedTensor":
        """Reorder features. ref: jagged_tensor.py:921 (fbgemm
        permute_2D_sparse_data) — re-designed as a static-shape gather."""
        perm_f = np.asarray(indices, dtype=np.int32)
        F, B = len(self.keys), self.stride
        # segment-level permutation: segments are (feature, row) pairs,
        # feature-major; permuting features permutes blocks of B segments.
        seg_perm = (perm_f[:, None] * B + np.arange(B)[None, :]).reshape(-1)
        src = jagged_permute_indices(
            self.lengths, jnp.asarray(seg_perm), self.values.shape[0]
        )
        new_lengths = self.lengths[jnp.asarray(seg_perm)]
        return KeyedJaggedTensor(
            values=self.values[src],
            lengths=new_lengths,
            keys=tuple(self.keys[i] for i in indices),
            stride=B,
            weights=None if self.weights is None else self.weights[src],
        )

    def to_padded(
        self, max_length: int, pad_id: int = 0
    ) -> "PaddedSparseBatch":
        """Jagged -> dense [F, B, L] compute layout (see PaddedSparseBatch).

        Ids beyond a row's length are `pad_id` with mask 0. Rows longer than
        max_length are TRUNCATED (dataset configs must budget L).
        """
        F, B, L = len(self.keys), self.stride, max_length
        offsets = self.offsets  # [F*B + 1]
        seg = jnp.arange(F * B)
        col = jnp.arange(L)
        base = offsets[seg][:, None] + col[None, :]  # [F*B, L]
        src = jnp.clip(base, 0, max(self.values.shape[0] - 1, 0))
        # an all-empty batch has values.shape == (0,); gather needs at
        # least one source row (every slot is masked to pad_id below)
        values = (
            self.values
            if self.values.shape[0]
            else jnp.zeros((1,), self.values.dtype)
        )
        ids = values[src.reshape(-1)].reshape(F * B, L)
        valid = col[None, :] < jnp.minimum(self.lengths, L)[:, None]
        ids = jnp.where(valid, ids, pad_id)
        weights = None
        if self.weights is not None:
            wsrc = (
                self.weights
                if self.weights.shape[0]
                else jnp.zeros((1,), self.weights.dtype)
            )
            w = wsrc[src.reshape(-1)].reshape(F * B, L)
            weights = jnp.where(valid, w, 0.0).reshape(F, B, L)
        return PaddedSparseBatch(
            ids=ids.reshape(F, B, L).astype(jnp.int32),
            lengths=jnp.minimum(self.lengths, L).reshape(F, B),
            keys=self.keys,
            weights=weights,
        )

    # -- eager (host-side, data-dependent shapes) ---------------------------

    def split(self, segments: Sequence[int]) -> List["KeyedJaggedTensor"]:
        """Split by key-groups (eager: value sizes are data-dependent).

        ref: jagged_tensor.py:848.
        """
        out: List[KeyedJaggedTensor] = []
        offs = np.asarray(self.offset_per_key())
        lengths = np.asarray(self.lengths)
        values = np.asarray(self.values)
        weights = None if self.weights is None else np.asarray(self.weights)
        start_k = 0
        for seg in segments:
            end_k = start_k + seg
            v0, v1 = int(offs[start_k]), int(offs[end_k])
            out.append(
                KeyedJaggedTensor(
                    values=jnp.asarray(values[v0:v1]),
                    lengths=jnp.asarray(
                        lengths[start_k * self.stride : end_k * self.stride]
                    ),
                    keys=self.keys[start_k:end_k],
                    stride=self.stride,
                    weights=None if weights is None else jnp.asarray(weights[v0:v1]),
                )
            )
            start_k = end_k
        return out

    def __getitem__(self, key: str) -> JaggedTensor:
        """Single-feature jagged view (eager). ref: jagged_tensor.py:968."""
        f = self.keys.index(key)
        offs = np.asarray(self.offset_per_key())
        v0, v1 = int(offs[f]), int(offs[f + 1])
        w = self.weights
        return JaggedTensor(
            values=self.values[v0:v1],
            lengths=self.lengths[f * self.stride : (f + 1) * self.stride],
            weights=None if w is None else w[v0:v1],
        )

    def to_dict(self) -> Dict[str, JaggedTensor]:
        """ref: jagged_tensor.py:982 (eager)."""
        return {k: self[k] for k in self.keys}


# ---------------------------------------------------------------------------
# PaddedSparseBatch — THE jit compute layout
# ---------------------------------------------------------------------------


@struct.dataclass
class PaddedSparseBatch:
    """Dense [F, B, L] id layout with a length mask — the jit/TPU hot-path
    twin of KeyedJaggedTensor.

    Every sharded input-dist, all_to_all, embedding lookup and pooling op in
    this framework consumes this layout: static shapes end-to-end, no
    host syncs, XLA-friendly. The reference's two-phase (lengths-then-values)
    KJT all_to_all (ref: distributed/dist_data.py:276-411) is unnecessary
    here — blocks are fixed-size, one collective moves them.
    """

    ids: Array  # [F, B, L] int32
    lengths: Array  # [F, B] int32
    keys: Tuple[str, ...] = struct.field(pytree_node=False)
    weights: Optional[Array] = None  # [F, B, L] f32

    @property
    def num_keys(self) -> int:
        return len(self.keys)

    @property
    def batch_size(self) -> int:
        return self.ids.shape[1]

    @property
    def max_length(self) -> int:
        return self.ids.shape[2]

    def mask(self) -> Array:
        """[F, B, L] bool validity mask."""
        L = self.ids.shape[2]
        return jnp.arange(L)[None, None, :] < self.lengths[:, :, None]

    def select_features(self, feature_indices: Sequence[int]) -> "PaddedSparseBatch":
        """Static feature subset/permute — replaces KJT.permute+split in the
        sharded input path (ref: embeddingbag.py:331-360)."""
        idx = np.asarray(feature_indices, dtype=np.int32)
        if idx.shape[0] == len(self.keys) and np.array_equal(
            idx, np.arange(len(self.keys))
        ):
            return self  # identity: skip the (measured ~1.8ms/step) gather
        return PaddedSparseBatch(
            ids=self.ids[idx],
            lengths=self.lengths[idx],
            keys=tuple(self.keys[i] for i in feature_indices),
            weights=None if self.weights is None else self.weights[idx],
        )

    def to_kjt(self) -> KeyedJaggedTensor:
        """Padded -> jagged (static total = F*B*L; tail slack has length 0)."""
        F, B, L = self.ids.shape
        flat_len = self.lengths.reshape(F * B)
        valid = jnp.arange(L)[None, :] < flat_len[:, None]  # [F*B, L]
        order = jnp.argsort(~valid.reshape(-1), stable=True)
        values = self.ids.reshape(-1)[order]
        weights = None
        if self.weights is not None:
            weights = self.weights.reshape(-1)[order]
        return KeyedJaggedTensor(
            values=values,
            lengths=flat_len,
            keys=self.keys,
            stride=B,
            weights=weights,
        )


# ---------------------------------------------------------------------------
# KeyedTensor (ref: torchrec/sparse/jagged_tensor.py:1101-1247)
# ---------------------------------------------------------------------------


@struct.dataclass
class KeyedTensor:
    """Dense tensors concatenated along the last dim, addressable by key.

    values: [B, sum(length_per_key)]; the canonical pooled-embedding output.
    """

    values: Array
    keys: Tuple[str, ...] = struct.field(pytree_node=False)
    length_per_key: Tuple[int, ...] = struct.field(pytree_node=False)

    @staticmethod
    def from_tensor_list(
        keys: Sequence[str], tensors: Sequence[Array], dim: int = 1
    ) -> "KeyedTensor":
        assert dim == 1
        return KeyedTensor(
            values=jnp.concatenate(list(tensors), axis=1),
            keys=tuple(keys),
            length_per_key=tuple(int(t.shape[1]) for t in tensors),
        )

    def _offsets(self) -> List[int]:
        offs = [0]
        for l in self.length_per_key:
            offs.append(offs[-1] + l)
        return offs

    def __getitem__(self, key: str) -> Array:
        i = self.keys.index(key)
        offs = self._offsets()
        return self.values[:, offs[i] : offs[i + 1]]

    def to_dict(self) -> Dict[str, Array]:
        offs = self._offsets()
        return {
            k: self.values[:, offs[i] : offs[i + 1]] for i, k in enumerate(self.keys)
        }

    @staticmethod
    def regroup(
        keyed_tensors: Sequence["KeyedTensor"], groups: Sequence[Sequence[str]]
    ) -> List[Array]:
        """Regroup columns of several KeyedTensors into new concatenations.

        ref: jagged_tensor.py:1213 (fbgemm-backed _regroup_keyed_tensors
        72-110) — static column slicing + concat, fused by XLA.
        """
        lookup: Dict[str, Array] = {}
        for kt in keyed_tensors:
            for k in kt.keys:
                lookup[k] = kt[k]
        return [jnp.concatenate([lookup[k] for k in g], axis=1) for g in groups]
