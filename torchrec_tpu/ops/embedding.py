"""Table-batched embedding lookup — the TPU equivalent of FBGEMM's
`SplitTableBatchedEmbeddingBagsCodegen` forward
(ref: third_party/fbgemm, consumed at
torchrec/distributed/batched_embedding_kernel.py:410-421).

Design (TPU-first, not a CUDA translation):

* Tables in a group are ROW-CONCATENATED into one [total_rows, D] array;
  a static per-feature `row_offsets` vector rebases ids. One big gather
  feeds the whole group — exactly the "table-batched" trick, but expressed
  so XLA sees a single gather + masked reduction it can fuse and tile.

* Ids arrive in the padded [F, B, L] layout (see sparse/jagged.py). The
  L axis is reduced with a validity mask: SUM/MEAN pooling is a masked
  segment-sum that XLA lowers to VPU reductions; `NONE` returns per-token
  rows for sequence models.

* The op is differentiable: XLA derives the backward gather->scatter-add.
  The *fused-optimizer* path (no dense table cotangent) lives in
  fused_update.py and is wired by the training step, mirroring the
  reference contract that the fused optimizer's `.step()` is a no-op
  (ref: torchrec/optim/fused.py:15-31).
"""

from __future__ import annotations

import enum
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


class PoolingMode(enum.Enum):
    """ref: fbgemm PoolingMode consumed at
    torchrec/modules/embedding_configs.py:66-75."""

    SUM = "sum"
    MEAN = "mean"
    NONE = "none"


# ---------------------------------------------------------------------------
# Implementation dispatch: Pallas DMA kernels on TPU, XLA gather elsewhere.
# Override with TORCHREC_TPU_EMB_IMPL={auto,xla,pallas}.
# ---------------------------------------------------------------------------


def _use_pallas(dtype, L: int, impl: str = "auto") -> bool:
    """Measured on v5e (tools/bench_kernels.py, 213k rows of D=128 f32):
    XLA's native gather runs at ~8.6 ns/row and scatter at ~26 ns/row —
    both dispatch-bound, not bandwidth-bound. The Pallas DMA-wave kernels
    cost ~15 ns/row per DMA descriptor on the scalar core (~30 ns/row for
    start+wait), so they LOSE to XLA on this chip generation; they exist
    for chips where descriptor issue is cheaper and as the base for a
    future SparseCore path. Hence: default to XLA, opt in to Pallas via
    TORCHREC_TPU_EMB_IMPL=pallas."""
    impl = os.environ.get("TORCHREC_TPU_EMB_IMPL", impl)
    if impl == "xla":
        return False
    if impl == "pallas":
        return (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            # wave size TB*L (TB = 8-aligned max(8, 256 // L)) must stay
            # within the 256 DMA-semaphore budget (sflag overflow
            # measured at 512 on v5e) -> at the TB=8 bag floor that
            # bounds L at 32
            and L <= 32
        )
    return False


def pooled_lookup(
    weights: Array, ids: Array, coeff: Array, impl: str = "auto"
) -> Array:
    """Fused gather+pool: out[..., :] = sum_l coeff[..., l] * W[ids[..., l]].

    weights [R, D]; ids [..., L] global row ids; coeff [..., L] pooling
    coefficients (0 where invalid). Returns [..., D]. This is THE embedding
    forward every sharding strategy calls on its local shard (the TBE
    forward, ref batched_embedding_kernel.py:410-421).
    """
    lead = ids.shape[:-1]
    L = ids.shape[-1]
    D = weights.shape[1]
    if _use_pallas(weights.dtype, L, impl):
        from torchrec_tpu.ops import pallas_embedding as pe

        NB = 1
        for s in lead:
            NB *= s
        # batch-dependent budget: the flat ids array is scalar-prefetched
        # into SMEM, so big NB*L batches must take the XLA path
        if pe.tbe_lookup_fits(NB, L):
            out = pe.tbe_lookup_pooled(
                weights, ids.reshape(-1, L), coeff.reshape(-1, L)
            )
            return out.reshape(*lead, D)
    rows = weights[ids.reshape(-1)].reshape(*lead, L, D)
    # low-precision tables (bf16/fp16) pool with fp32 accumulation and
    # return fp32 (ref: fbgemm output_dtype defaults to FP32)
    acc = (
        jnp.float32
        if weights.dtype in (jnp.bfloat16, jnp.float16)
        else weights.dtype
    )
    return jnp.einsum(
        "...ld,...l->...d",
        rows,
        coeff.astype(weights.dtype),
        preferred_element_type=acc,
    )


def lookup_rows(weights: Array, flat_ids: Array, impl: str = "auto") -> Array:
    """Row gather W[flat_ids] -> [N, D] (the PoolingMode.NONE path)."""
    if _use_pallas(weights.dtype, 1, impl):
        from torchrec_tpu.ops import pallas_embedding as pe

        return pe.gather_rows(weights, flat_ids)
    return weights[flat_ids]


def embedding_bag_lookup(
    weights: Array,
    ids: Array,
    lengths: Array,
    pooling: PoolingMode = PoolingMode.SUM,
    per_sample_weights: Optional[Array] = None,
) -> Array:
    """Single-table pooled lookup.

    weights: [R, D]; ids: [B, L] (pad slots may hold any valid id);
    lengths: [B]. Returns [B, D] pooled ([B, L, D] for NONE).
    """
    B, L = ids.shape
    mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(weights.dtype)
    if per_sample_weights is not None:
        mask = mask * per_sample_weights.astype(weights.dtype)
    if pooling is PoolingMode.NONE:
        rows = lookup_rows(weights, ids.reshape(-1)).reshape(B, L, -1)
        return rows * mask[:, :, None]
    if pooling is PoolingMode.MEAN:
        denom = jnp.maximum(lengths.astype(weights.dtype), 1.0)
        mask = mask / denom[:, None]
    return pooled_lookup(weights, ids, mask)


def batched_embedding_lookup(
    weights: Array,
    ids: Array,
    lengths: Array,
    row_offsets: Array,
    pooling: PoolingMode = PoolingMode.SUM,
    per_sample_weights: Optional[Array] = None,
) -> Array:
    """Grouped multi-table pooled lookup (the TBE forward).

    weights:     [total_rows, D] row-concatenation of all tables in the group
    ids:         [F, B, L] per-feature local ids (padded layout)
    lengths:     [F, B]
    row_offsets: [F] static base row of each feature's table in `weights`
    per_sample_weights: optional [F, B, L]

    Returns [F, B, D] pooled embeddings ([F, B, L, D] for PoolingMode.NONE).
    """
    F, B, L = ids.shape
    global_ids = ids + row_offsets[:, None, None]
    mask = (jnp.arange(L)[None, None, :] < lengths[:, :, None]).astype(
        weights.dtype
    )
    if per_sample_weights is not None:
        mask = mask * per_sample_weights.astype(weights.dtype)
    if pooling is PoolingMode.NONE:
        rows = lookup_rows(weights, global_ids.reshape(-1)).reshape(
            F, B, L, -1
        )
        return rows * mask[:, :, :, None]
    if pooling is PoolingMode.MEAN:
        denom = jnp.maximum(lengths.astype(weights.dtype), 1.0)
        mask = mask / denom[:, :, None]
    return pooled_lookup(weights, global_ids, mask)


def sequence_embedding_lookup(
    weights: Array,
    ids: Array,
    lengths: Array,
    row_offsets: Array,
) -> Array:
    """Unpooled per-token lookup for EmbeddingCollection-style modules
    (ref: PoolingMode.NONE TBE use at batched_embedding_kernel.py:416).

    Returns [F, B, L, D]; pad tokens are zero rows.
    """
    return batched_embedding_lookup(
        weights, ids, lengths, row_offsets, pooling=PoolingMode.NONE
    )


def make_row_offsets(rows_per_table: Sequence[int]) -> Array:
    """Static cumulative base-row offsets for a table group."""
    offs = [0]
    for r in rows_per_table:
        offs.append(offs[-1] + int(r))
    return jnp.asarray(offs[:-1], dtype=jnp.int32)
