"""Variable-batch support — per-device batch sizes through every dist.

ref: torchrec/distributed/sharding/vb_sharding.py:18-51 (
`VariableBatchShardingContext.batch_size_per_rank`), vb_tw_sharding.py,
vb_cw_sharding.py, and the variable-batch KJT all_to_all
(dist_data.py:301-347).

TPU-first redesign. The reference threads dynamic `batch_size_per_rank`
lists through its jagged all_to_alls so no rank pads its tensors. XLA
requires static shapes, so here every device pads its local batch to a
common `batch_size` budget and carries the *true* size as data:

* `VariableBatch.from_ragged` builds the padded global batch. Pad rows
  have zero sparse lengths (so they fetch nothing, pool to zeros, and
  contribute exactly zero gradient through the masked pooling) and a
  label mask of 0.
* Losses/metrics use `example_mask` so pad rows do not bias training —
  the numerical equivalent of the reference's unpadded math.
* No strategy changes are needed: DP/TW/RW/CW/TWRW/TWCW/sequence
  forward+update already reduce over the token mask, which is zero for
  pad rows. This is checked by tests/test_variable_batch.py (per-device
  batches [3, 1, 4, 2] match an unpadded single-device reference).

The padding overhead is bounded by the batch-size skew across devices,
and the bytes on the wire stay aligned/static — a good trade on ICI.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array


@struct.dataclass
class VariableBatch:
    """A padded global batch with per-device true batch sizes.

    sparse:   PaddedSparseBatch [F, n_dev * B_pad, L]
    dense:    [n_dev * B_pad, d] (zeros on pad rows)
    labels:   [n_dev * B_pad]
    example_mask: [n_dev * B_pad] f32, 1.0 on real rows
    batch_size_per_device: [n_dev] int32 (the reference's
        batch_size_per_rank, vb_sharding.py:18-33)
    """

    sparse: PaddedSparseBatch
    dense: Optional[Array]
    labels: Optional[Array]
    example_mask: Array
    batch_size_per_device: Array

    @property
    def padded_batch_per_device(self) -> int:
        return self.example_mask.shape[0] // self.batch_size_per_device.shape[0]

    @staticmethod
    def from_ragged(
        sparse_parts: Sequence[PaddedSparseBatch],
        dense_parts: Optional[Sequence[np.ndarray]] = None,
        label_parts: Optional[Sequence[np.ndarray]] = None,
        batch_size: Optional[int] = None,
    ) -> "VariableBatch":
        """Build a padded global batch from one ragged part per device."""
        n = len(sparse_parts)
        sizes = [p.batch_size for p in sparse_parts]
        B_pad = int(batch_size if batch_size is not None else max(sizes))
        if any(s > B_pad for s in sizes):
            raise ValueError(
                f"device batch {max(sizes)} exceeds budget {B_pad}"
            )
        keys = sparse_parts[0].keys
        F = sparse_parts[0].num_keys
        L = sparse_parts[0].max_length
        ids = np.zeros((F, n * B_pad, L), np.int32)
        lengths = np.zeros((F, n * B_pad), np.int32)
        has_w = sparse_parts[0].weights is not None
        weights = np.zeros((F, n * B_pad, L), np.float32) if has_w else None
        mask = np.zeros((n * B_pad,), np.float32)
        for d, p in enumerate(sparse_parts):
            if p.keys != keys or p.max_length != L:
                raise ValueError("sparse parts must share keys and max_length")
            b = sizes[d]
            lo = d * B_pad
            ids[:, lo : lo + b] = np.asarray(p.ids)
            lengths[:, lo : lo + b] = np.asarray(p.lengths)
            if has_w:
                weights[:, lo : lo + b] = np.asarray(p.weights)
            mask[lo : lo + b] = 1.0
        sb = PaddedSparseBatch(
            ids=jnp.asarray(ids),
            lengths=jnp.asarray(lengths),
            keys=keys,
            weights=None if weights is None else jnp.asarray(weights),
        )
        dense = None
        if dense_parts is not None:
            d0 = np.asarray(dense_parts[0])
            dense_np = np.zeros((n * B_pad,) + d0.shape[1:], d0.dtype)
            for d, part in enumerate(dense_parts):
                dense_np[d * B_pad : d * B_pad + sizes[d]] = part
            dense = jnp.asarray(dense_np)
        labels = None
        if label_parts is not None:
            l0 = np.asarray(label_parts[0])
            lab_np = np.zeros((n * B_pad,) + l0.shape[1:], l0.dtype)
            for d, part in enumerate(label_parts):
                lab_np[d * B_pad : d * B_pad + sizes[d]] = part
            labels = jnp.asarray(lab_np)
        return VariableBatch(
            sparse=sb,
            dense=dense,
            labels=labels,
            example_mask=jnp.asarray(mask),
            batch_size_per_device=jnp.asarray(sizes, jnp.int32),
        )


def masked_mean(values: Array, example_mask: Array) -> Array:
    """Mean over real examples only (pad rows excluded)."""
    m = example_mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_bce_with_logits(
    logits: Array, labels: Array, example_mask: Array
) -> Array:
    """BCE-with-logits averaged over real examples — the variable-batch
    loss (pad rows contribute exactly zero gradient)."""
    z = logits.reshape(-1)
    y = labels.astype(z.dtype).reshape(-1)
    per = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return masked_mean(per, example_mask)
