"""Row-wise quantized embedding storage + lookup — the TPU equivalent of
FBGEMM's `IntNBitTableBatchedEmbeddingBagsCodegen` and
`FloatToFusedNBitRowwiseQuantizedSBHalf`
(ref: torchrec/distributed/quant_embedding_kernel.py:19-240,
torchrec/quant/embedding_modules.py:49-88).

Layout: instead of FBGEMM's fused bytes-per-row blob (packed int-N data
+ fp16 scale + fp16 shift appended per row, row_alignment=16), the TPU
layout keeps THREE arrays — packed int8 data [R, D*bits/8], scale [R],
shift [R] — because XLA gathers/dequantizes vectorized arrays far better
than byte-blob slices, and alignment is the compiler's job.

Quantization: per-row affine: q = round((w - min) / scale) in [0, 2^bits),
dequant = q * scale + min. Scales/shifts stored fp16-rounded for parity
with the reference's half-precision scale/bias."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from torchrec_tpu.ops.embedding import PoolingMode

Array = jax.Array


@struct.dataclass
class QuantizedTable:
    """Row-wise quantized table."""

    data: Array  # [R, D * bits // 8] uint8 (packed)
    scale: Array  # [R] f32 (fp16-rounded)
    shift: Array  # [R] f32 (fp16-rounded)
    bits: int = struct.field(pytree_node=False)
    dim: int = struct.field(pytree_node=False)


def quantize_rowwise(weights: Array, bits: int = 8) -> QuantizedTable:
    """FP32 [R, D] -> int-N row-wise quantized (ref:
    FloatToFusedNBitRowwiseQuantizedSBHalf, quant_embedding_kernel.py:91)."""
    if bits not in (2, 4, 8):
        raise ValueError(f"bits must be 2/4/8, got {bits}")
    R, D = weights.shape
    per_byte = 8 // bits
    if D % per_byte:
        raise ValueError(f"dim {D} not packable at {bits} bits")
    qmax = (1 << bits) - 1
    lo = jnp.min(weights, axis=1)
    hi = jnp.max(weights, axis=1)
    scale = ((hi - lo) / qmax).astype(jnp.float16).astype(jnp.float32)
    scale = jnp.where(scale == 0, 1.0, scale)
    shift = lo.astype(jnp.float16).astype(jnp.float32)
    q = jnp.clip(
        jnp.round((weights - shift[:, None]) / scale[:, None]), 0, qmax
    ).astype(jnp.uint8)
    if per_byte > 1:
        q = q.reshape(R, D // per_byte, per_byte)
        packed = jnp.zeros((R, D // per_byte), jnp.uint8)
        for j in range(per_byte):
            packed = packed | (q[:, :, j] << (bits * j))
        q = packed
    return QuantizedTable(data=q, scale=scale, shift=shift, bits=bits, dim=D)


def dequantize_rows(table: QuantizedTable, row_ids: Array) -> Array:
    """Gather + dequantize rows: [N] ids -> [N, D] f32."""
    bits, D = table.bits, table.dim
    per_byte = 8 // bits
    packed = table.data[row_ids]  # [N, D // per_byte] uint8
    if per_byte > 1:
        mask = (1 << bits) - 1
        parts = [
            ((packed >> (bits * j)) & mask)[:, :, None]
            for j in range(per_byte)
        ]
        q = jnp.concatenate(parts, axis=2).reshape(packed.shape[0], D)
    else:
        q = packed
    scale = table.scale[row_ids][:, None]
    shift = table.shift[row_ids][:, None]
    return q.astype(jnp.float32) * scale + shift


def quant_embedding_bag_lookup(
    table: QuantizedTable,
    ids: Array,
    lengths: Array,
    pooling: PoolingMode = PoolingMode.SUM,
    per_sample_weights: Optional[Array] = None,
) -> Array:
    """Pooled lookup over a quantized table: ids [F, B, L] -> [F, B, D]
    (the IntNBit TBE forward, ref quant_embedding_kernel.py:102-199)."""
    F, B, L = ids.shape
    rows = dequantize_rows(table, ids.reshape(-1)).reshape(F, B, L, table.dim)
    mask = (jnp.arange(L)[None, None, :] < lengths[:, :, None]).astype(
        rows.dtype
    )
    if per_sample_weights is not None:
        mask = mask * per_sample_weights.astype(rows.dtype)
    if pooling is PoolingMode.NONE:
        return rows * mask[:, :, :, None]
    pooled = jnp.einsum("fbld,fbl->fbd", rows, mask)
    if pooling is PoolingMode.MEAN:
        denom = jnp.maximum(lengths.astype(rows.dtype), 1.0)
        pooled = pooled / denom[:, :, None]
    return pooled


def quantized_size_bytes(rows: int, dim: int, bits: int) -> int:
    """Storage of a quantized table incl. scale/shift (the
    `rounded_row_size_in_bytes` analogue, ref quant_embedding_kernel.py:19)."""
    return rows * (dim * bits // 8 + 8)
