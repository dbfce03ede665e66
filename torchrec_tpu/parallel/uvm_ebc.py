"""Host-offloaded EmbeddingBagCollection — the runtime consumer of the
planner's FUSED_UVM_CACHING kernel.

ref: FBGEMM `EmbeddingLocation.MANAGED_CACHING` consumed through
torchrec's BATCHED_FUSED_UVM_CACHING compute kernel
(distributed/embedding_types.py:44-76): tables too big for device memory
live in host RAM with a device-side row cache.

Unlike every other module here, this one is HOST-DRIVEN by necessity:
each step stages the batch's rows into the HBM cache (evicting LRU dirty
rows back to the host) before the jitted lookup/update runs on the
cache. That breaks the one-executable-per-step pattern — which is
exactly the price UVM pays on any architecture; CUDA's UVM page faults
are the same staging, hidden in the kernel.

Contract mirrors the functional sharded EBC: `forward(sb) ->
KeyedTensor`, `update(sb, d_values, lr)`, plus `flush()` before reading
`state_dict()` (ref: batched_embedding_kernel.py:344,455).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    PoolingType,
    pooling_type_to_mode,
)
from torchrec_tpu.modules.embedding_modules import embedding_names_by_table
from torchrec_tpu.ops.embedding import PoolingMode
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.ops.uvm_cache import UvmCachedEmbedding
from torchrec_tpu.sparse import KeyedTensor, PaddedSparseBatch

Array = jax.Array


class UvmEmbeddingBagCollection:
    """Multi-table host-offloaded EBC with per-table HBM row caches."""

    def __init__(
        self,
        tables: Sequence[EmbeddingBagConfig],
        weights: Dict[str, np.ndarray],
        cache_load_factor: float = 0.2,
        min_cache_rows: int = 1024,
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
    ):
        optim_kwargs = dict(optim_kwargs or {})
        optim_kwargs.pop("input_routing", None)  # device-strategy-only knob
        optim_kwargs.pop("emb_impl", None)  # cache lookups are XLA-path
        self.tables = tuple(tables)
        for t in self.tables:
            if t.name.endswith((".m2", ".step")):
                # momentum_dict suffix-encodes second moments and the
                # Adam step under these names; a colliding table name
                # would misroute load_momentum
                raise ValueError(
                    f"UVM table name {t.name!r} ends in a reserved "
                    "checkpoint suffix ('.m2'/'.step')"
                )
        self._emb_names = embedding_names_by_table(self.tables)
        self.embedding_names = tuple(
            n for names in self._emb_names for n in names
        )
        self._uvm: Dict[str, UvmCachedEmbedding] = {}
        for t in self.tables:
            cache_rows = max(
                min_cache_rows, int(t.num_embeddings * cache_load_factor)
            )
            self._uvm[t.name] = UvmCachedEmbedding(
                np.array(weights[t.name], np.float32, copy=True),
                cache_rows=min(cache_rows, t.num_embeddings),
                optim=optim,
                optim_kwargs=optim_kwargs,
            )

    def forward(self, sb: PaddedSparseBatch) -> KeyedTensor:
        key_index = {k: i for i, k in enumerate(sb.keys)}
        ids_np = np.asarray(sb.ids)
        outputs, names = [], []
        for t, enames in zip(self.tables, self._emb_names):
            uvm = self._uvm[t.name]
            fidx = [key_index[f] for f in t.feature_names]
            slots = uvm.prepare(ids_np[fidx])  # [F_t, B, L] host staging
            lengths = sb.lengths[jnp.asarray(fidx)]
            mode = pooling_type_to_mode(t.pooling)
            psw = None
            if sb.weights is not None:
                psw = sb.weights[jnp.asarray(fidx)]
            for j, ename in enumerate(enames):
                coeff = psw[j] if psw is not None else None
                pooled = uvm.lookup_pooled(
                    jnp.asarray(slots[j]), lengths[j], coeff
                )
                if mode is PoolingMode.MEAN:
                    denom = jnp.maximum(
                        lengths[j].astype(pooled.dtype), 1.0
                    )
                    pooled = pooled / denom[:, None]
                outputs.append(pooled)
                names.append(ename)
        return KeyedTensor.from_tensor_list(names, outputs)

    def update(
        self, sb: PaddedSparseBatch, d_values: Array, learning_rate
    ) -> None:
        key_index = {k: i for i, k in enumerate(sb.keys)}
        ids_np = np.asarray(sb.ids)
        offsets = np.concatenate(
            [[0], np.cumsum([t.embedding_dim
                             for t in self.tables
                             for _ in t.feature_names])]
        )
        pos = 0
        for t, enames in zip(self.tables, self._emb_names):
            uvm = self._uvm[t.name]
            fidx = [key_index[f] for f in t.feature_names]
            slots = uvm.prepare(ids_np[fidx])
            L = sb.max_length
            mode = pooling_type_to_mode(t.pooling)
            # One fused update per TABLE: a row id appearing under two of
            # the table's features in the same batch must be duplicate-
            # combined (FBGEMM exact semantics; ref
            # batched_embedding_kernel.py:604-647), not updated twice
            # sequentially — sequential rowwise-Adagrad diverges.
            all_slots, all_grads, all_masks = [], [], []
            for j, _ in enumerate(enames):
                lo, hi = offsets[pos], offsets[pos + 1]
                d = d_values[:, lo:hi]  # [B, D_t]
                lengths = np.asarray(sb.lengths)[fidx[j]]
                mask = np.arange(L)[None, :] < lengths[:, None]
                coeff = mask.astype(np.float32)
                if sb.weights is not None:
                    coeff = coeff * np.asarray(sb.weights)[fidx[j]]
                if mode is PoolingMode.MEAN:
                    coeff = coeff / np.maximum(lengths, 1)[:, None]
                row_grads = (
                    np.asarray(d)[:, None, :] * coeff[:, :, None]
                )  # [B, L, D_t]
                all_slots.append(slots[j].reshape(-1))
                all_grads.append(row_grads.reshape(-1, hi - lo))
                all_masks.append(mask.reshape(-1))
                pos += 1
            uvm.update(
                jnp.asarray(np.concatenate(all_slots)),
                jnp.asarray(np.concatenate(all_grads)),
                jnp.asarray(np.concatenate(all_masks)),
                learning_rate,
            )

    def flush(self) -> None:
        for uvm in self._uvm.values():
            uvm.flush()

    def state_dict(self) -> Dict[str, np.ndarray]:
        # copies: the host table keeps mutating as training continues
        self.flush()
        return {
            t.name: np.array(self._uvm[t.name].table, copy=True)
            for t in self.tables
        }

    def momentum_dict(self) -> Dict[str, np.ndarray]:
        """Flushed per-table optimizer momentum — the analogue of fbgemm
        split_optimizer_states (batched_embedding_kernel.py:204-246).
        First moments under the table name; second moments (Adam/LAMB
        families) under `<name>.m2` (the suffix keeps the checkpoint key
        `uvmopt/{module}/{entry}` slash-free and old rowwise checkpoints
        loadable unchanged)."""
        self.flush()
        out: Dict[str, np.ndarray] = {}
        for t in self.tables:
            uvm = self._uvm[t.name]
            if uvm.host_momentum1 is not None:
                out[t.name] = np.array(uvm.host_momentum1, copy=True)
            if uvm.host_momentum2 is not None:
                out[t.name + ".m2"] = np.array(
                    uvm.host_momentum2, copy=True
                )
            if uvm.host_momentum1 is not None and int(uvm.step):
                # Adam-family bias correction depends on the step count
                out[t.name + ".step"] = np.asarray(uvm.step)
        return out

    def load_momentum(self, momentum: Dict[str, np.ndarray]) -> None:
        """Restore host momentum (exact optimizer resume). Invalidates the
        row cache so resident rows can't serve stale momentum."""
        for name, m in momentum.items():
            if name.endswith(".step"):
                uvm = self._uvm[name[:-len(".step")]]
                uvm.invalidate()
                uvm.step = jnp.asarray(m, jnp.int32)
                continue
            slot = "host_momentum1"
            if name.endswith(".m2"):
                name, slot = name[:-len(".m2")], "host_momentum2"
            uvm = self._uvm[name]
            host = getattr(uvm, slot)
            if host is None:
                raise ValueError(f"table {name} has no momentum state")
            uvm.invalidate()
            host[:] = np.asarray(m, np.float32)

    def cache_stats(self) -> Dict[str, Dict[str, int]]:
        return {
            name: {"hits": u.hits, "misses": u.misses}
            for name, u in self._uvm.items()
        }
