"""Sharded quantized EmbeddingBagCollection — distributed int-N inference.

ref: torchrec/distributed/quant_embeddingbag.py:62-256
(`ShardedQuantEmbeddingBagCollection`): the reference TW-places quantized
tables over local devices with `ShardingEnv.from_local` (no process
group), routes inputs with `SparseFeaturesOneToAll` P2P copies and merges
pooled outputs on one device with fbgemm `merge_pooled_embeddings`
(`EmbeddingsAllToOne`, tw_sharding.py:434-472).

TPU re-design: one SPMD program over the mesh — the batch is replicated
(serving input), every device dequant-lookups only the tables placed on
it (TW layout: row-concatenated per device, padded to rows_max), and one
all_gather over ICI replaces both the P2P input fan-out and the output
merge. Output: a replicated KeyedTensor, bit-identical to the unsharded
quantized module (dequantization is deterministic).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from torchrec_tpu.modules.embedding_configs import (
    DATA_TYPE_NUM_BITS,
    DataType,
    EmbeddingBagConfig,
    pooling_type_to_mode,
)
from torchrec_tpu.modules.embedding_modules import embedding_names_by_table
from torchrec_tpu.ops.embedding import PoolingMode
from torchrec_tpu.ops.quant import QuantizedTable, quantize_rowwise
from torchrec_tpu.parallel.strategies import _pad_rows_tile
from torchrec_tpu.parallel.types import ShardingEnv
from torchrec_tpu.sparse import (
    KeyedJaggedTensor,
    KeyedTensor,
    PaddedSparseBatch,
)

Array = jax.Array
AXIS = ShardingEnv.AXIS


class ShardedQuantEmbeddingBagCollection:
    """TW-sharded int-N inference EBC (ref: quant_embeddingbag.py:62).

    `table_ranks` places each table on a device (round-robin default) —
    the reference's TW-only inference sharding.
    """

    def __init__(
        self,
        env: ShardingEnv,
        tables: Sequence[EmbeddingBagConfig],
        quantized: Dict[str, QuantizedTable],
        table_ranks: Optional[Dict[str, int]] = None,
        is_weighted: bool = False,
        max_feature_length: int = 1,
    ):
        self.env = env
        self.tables = tuple(tables)
        self.is_weighted = is_weighted
        self.max_feature_length = max_feature_length
        n = env.world_size
        dims = {t.embedding_dim for t in tables}
        if len(dims) != 1:
            raise ValueError("tables must share embedding_dim")
        self.dim = dims.pop()
        bits = {quantized[t.name].bits for t in tables}
        if len(bits) != 1:
            raise ValueError("tables must share quantized bits")
        self.bits = bits.pop()
        self.bytes_per_row = self.dim * self.bits // 8

        self._emb_names = embedding_names_by_table(self.tables)
        self.embedding_names = tuple(
            nm for names in self._emb_names for nm in names
        )
        feats = [f for t in tables for f in t.feature_names]
        feat_pos = {f: i for i, f in enumerate(feats)}
        self.features = feats

        ranks = table_ranks or {
            t.name: i % n for i, t in enumerate(tables)
        }
        per_dev: List[List[int]] = [[] for _ in range(n)]
        for ti, t in enumerate(tables):
            r = ranks[t.name]
            if not (0 <= r < n):
                raise ValueError(f"table {t.name} rank {r} outside mesh {n}")
            per_dev[r].append(ti)

        self.f_max = max(
            (sum(len(tables[ti].feature_names) for ti in tids)
             for tids in per_dev),
            default=1,
        ) or 1
        # ROW_TILE-padded like every packed group operand: unaligned row
        # counts cost whole-operand layout copies at jit entry (NOTES_r4)
        self.rows_max = _pad_rows_tile(max(
            (sum(tables[ti].num_embeddings for ti in tids)
             for tids in per_dev),
            default=1,
        ) or 1)

        F = len(feats)
        self.dev_feats = np.zeros((n, self.f_max), np.int32)
        self.dev_feat_valid = np.zeros((n, self.f_max), bool)
        self.dev_feat_rowoff = np.zeros((n, self.f_max), np.int32)
        self.dev_feat_mean = np.zeros((n, self.f_max), bool)
        self.out_pos = np.zeros((F,), np.int32)
        data = np.zeros((n, self.rows_max, self.bytes_per_row), np.uint8)
        scale = np.zeros((n, self.rows_max), np.float32)
        shift = np.zeros((n, self.rows_max), np.float32)
        for d, tids in enumerate(per_dev):
            slot = 0
            off = 0
            for ti in tids:
                t = tables[ti]
                q = quantized[t.name]
                data[d, off : off + t.num_embeddings] = np.asarray(q.data)
                scale[d, off : off + t.num_embeddings] = np.asarray(q.scale)
                shift[d, off : off + t.num_embeddings] = np.asarray(q.shift)
                mean = pooling_type_to_mode(t.pooling) is PoolingMode.MEAN
                for f in t.feature_names:
                    fi = feat_pos[f]
                    self.dev_feats[d, slot] = fi
                    self.dev_feat_valid[d, slot] = True
                    self.dev_feat_rowoff[d, slot] = off
                    self.dev_feat_mean[d, slot] = mean
                    self.out_pos[fi] = d * self.f_max + slot
                    slot += 1
                off += t.num_embeddings
        shd = NamedSharding(env.mesh, P(AXIS))
        self.data = jax.device_put(jnp.asarray(data), shd)
        self.scale = jax.device_put(jnp.asarray(scale), shd)
        self.shift = jax.device_put(jnp.asarray(shift), shd)

    @staticmethod
    def from_float(
        env: ShardingEnv,
        tables: Sequence[EmbeddingBagConfig],
        weights: Dict[str, np.ndarray],
        data_type: DataType = DataType.INT8,
        **kwargs,
    ) -> "ShardedQuantEmbeddingBagCollection":
        bits = DATA_TYPE_NUM_BITS[data_type]
        quantized = {
            t.name: quantize_rowwise(jnp.asarray(weights[t.name]), bits)
            for t in tables
        }
        return ShardedQuantEmbeddingBagCollection(
            env, tables, quantized, **kwargs
        )

    def __call__(self, features, arrays=None) -> KeyedTensor:
        """Replicated batch in -> replicated pooled KeyedTensor out.

        `arrays` optionally supplies (data, scale, shift) as jit ARGUMENTS
        instead of the stored attributes — closure-captured GB-scale
        tables become jit constants and re-upload at compile time on
        remote-attached chips, so serving wrappers pass them explicitly."""
        if isinstance(features, KeyedJaggedTensor):
            features = features.to_padded(self.max_feature_length)
        sb: PaddedSparseBatch = features
        L = sb.max_length
        has_w = self.is_weighted and sb.weights is not None
        dim, bits = self.dim, self.bits
        f_max = self.f_max
        n = self.env.world_size
        data_a, scale_a, shift_a = (
            arrays if arrays is not None
            else (self.data, self.scale, self.shift)
        )

        def fwd(data, scale, shift, ids, lengths, psw):
            my = lax.axis_index(AXIS)
            feats = jnp.asarray(self.dev_feats)[my]
            fvalid = jnp.asarray(self.dev_feat_valid)[my]
            rowoff = jnp.asarray(self.dev_feat_rowoff)[my]
            mean_m = jnp.asarray(self.dev_feat_mean)[my]
            ids_m = ids[feats] + rowoff[:, None, None]
            len_m = lengths[feats] * fvalid[:, None].astype(lengths.dtype)
            table = QuantizedTable(
                data=data[0], scale=scale[0], shift=shift[0],
                bits=bits, dim=dim,
            )
            from torchrec_tpu.ops.quant import dequantize_rows

            rows = dequantize_rows(table, ids_m.reshape(-1)).reshape(
                f_max, -1, L, dim
            )
            coeff = (
                jnp.arange(L)[None, None, :] < len_m[:, :, None]
            ).astype(rows.dtype)
            if has_w:
                coeff = coeff * psw[feats].astype(rows.dtype)
            denom = jnp.maximum(len_m.astype(rows.dtype), 1.0)[:, :, None]
            coeff = jnp.where(mean_m[:, None, None], coeff / denom, coeff)
            pooled = jnp.einsum("fbld,fbl->fbd", rows, coeff)
            # output merge: one all_gather over ICI (the reference's
            # EmbeddingsAllToOne / merge_pooled_embeddings)
            return lax.all_gather(pooled, AXIS, axis=0, tiled=True)

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        slots = jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(),
                      P() if not has_w else P()),
            out_specs=P(),
            check_vma=False,
        )(data_a, scale_a, shift_a, sb.ids, sb.lengths, psw)
        # [n*f_max, B, D] -> canonical feature order
        out = slots[jnp.asarray(self.out_pos)]  # [F, B, D]
        values = jnp.concatenate(list(out), axis=1)  # [B, F*D]
        return KeyedTensor(
            values=values,
            keys=self.embedding_names,
            length_per_key=tuple(self.dim for _ in self.embedding_names),
        )
