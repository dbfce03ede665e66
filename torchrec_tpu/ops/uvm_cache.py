"""Host-offloaded embedding tables with a software-managed HBM row cache —
the TPU equivalent of FBGEMM's `EmbeddingLocation.MANAGED` /
`MANAGED_CACHING` (UVM) kernels (ref: consumed at
torchrec/distributed/embedding_types.py:57-76 and
batched_embedding_kernel.py:410-421; `flush()` contract at :344,455).

TPU has no unified virtual memory: a table bigger than HBM must live in
host RAM, with touched rows staged in. CUDA UVM pages rows in on demand
in-kernel; here the staging is explicit and batched, which is actually a
better fit for a synchronous-dataflow machine:

* the table lives on the host (numpy), the cache is a device-resident
  [cache_rows, D] array (+ optimizer state) managed LRU by the host;
* `prepare(ids)` runs per step on the host: hits map to their slots,
  misses evict LRU victims (writing their dirty rows + momentum back to
  the host table) and stage the new rows in with ONE device scatter;
* lookups/updates then run entirely on-device against the cache with the
  translated slot ids — the normal fused kernels, full speed;
* `flush()` writes every dirty row back (the reference calls flush before
  state_dict reads).

This is the per-shard building block: in a sharded setting each device
owns the cache of its own row/table shard. Rows must fit the cache per
step (cache_rows >= unique ids per batch), the analogue of FBGEMM's
cache-miss stall being a hard requirement rather than a slowdown.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    FusedOptimizerState,
    apply_fused_update,
    fused_state_shapes,
)

Array = jax.Array


class UvmCachedEmbedding:
    """LRU software cache for one host-resident table.

    Supports the FULL fused optimizer set (fbgemm's UVM locations take
    every optimizer, ref torchrec/distributed/embedding_types.py:57-76):
    momentum state — rowwise [R] and/or full [R, D] per
    `fused_state_shapes` — lives on the host beside the table and is
    staged/evicted with the rows it belongs to.

    Args:
        table: [R, D] float32 numpy array (host memory; mutated in place
            by evictions/flush).
        cache_rows: device cache capacity C (must cover one batch's
            unique ids).
        optim: fused optimizer type (momentum cached alongside rows).
    """

    def __init__(
        self,
        table: np.ndarray,
        cache_rows: int,
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
    ):
        self.table = table
        self.optim = optim
        self.optim_kwargs = dict(optim_kwargs or {})
        R, D = table.shape
        self.R, self.D, self.C = R, D, int(cache_rows)
        k1, k2 = fused_state_shapes(optim)

        def _host(kind):
            if kind == "row":
                return np.zeros((R,), np.float32)
            if kind == "full":
                return np.zeros((R, D), np.float32)
            return None

        def _dev(kind):
            if kind == "row":
                return jnp.zeros((self.C,), jnp.float32)
            if kind == "full":
                return jnp.zeros((self.C, D), jnp.float32)
            return None

        self.host_momentum1 = _host(k1)
        self.host_momentum2 = _host(k2)
        self.cache_w = jnp.zeros((self.C, D), jnp.float32)
        self.cache_m1 = _dev(k1)
        self.cache_m2 = _dev(k2)
        self.step = jnp.zeros((), jnp.int32)
        # host-side cache directory
        self.slot_of: Dict[int, int] = {}
        self.row_in_slot = np.full((self.C,), -1, np.int64)
        self.dirty = np.zeros((self.C,), bool)
        self._clock = 0
        self.last_use = np.zeros((self.C,), np.int64)
        self._free = list(range(self.C - 1, -1, -1))
        # counters (the reference exposes UVM cache stats)
        self.hits = 0
        self.misses = 0

    # back-compat aliases (pre-r5 surface: rowwise momentum only)
    @property
    def host_momentum(self):
        return self.host_momentum1

    @property
    def cache_m(self):
        return self.cache_m1

    def _momentum_pairs(self):
        """(host array, cache attr name) for each live momentum slot."""
        out = []
        if self.host_momentum1 is not None:
            out.append((self.host_momentum1, "cache_m1"))
        if self.host_momentum2 is not None:
            out.append((self.host_momentum2, "cache_m2"))
        return out

    # -- host-side cache management -----------------------------------------

    def prepare(self, ids: np.ndarray) -> np.ndarray:
        """Make every id resident; return the slot id per input id."""
        shape = np.asarray(ids).shape
        ids = np.asarray(ids).reshape(-1)
        uniq = np.unique(ids)
        self._clock += 1
        if uniq.size > self.C:
            raise ValueError(
                f"batch touches {uniq.size} unique rows > cache_rows {self.C}"
            )
        miss = [r for r in uniq.tolist() if r not in self.slot_of]
        self.hits += len(uniq) - len(miss)
        self.misses += len(miss)
        # protect this batch's resident rows from eviction (LRU stamp now)
        for r in uniq.tolist():
            if r in self.slot_of:
                self.last_use[self.slot_of[r]] = self._clock
        if miss:
            slots = self._allocate(len(miss))
            # stage missed rows host -> device with one scatter
            rows = jnp.asarray(self.table[miss])
            sl = jnp.asarray(slots)
            self.cache_w = self.cache_w.at[sl].set(rows)
            for host_m, attr in self._momentum_pairs():
                setattr(
                    self, attr,
                    getattr(self, attr).at[sl].set(
                        jnp.asarray(host_m[miss])
                    ),
                )
            for r, s in zip(miss, slots.tolist()):
                self.slot_of[r] = s
                self.row_in_slot[s] = r
        out = np.asarray([self.slot_of[r] for r in ids.tolist()], np.int32)
        for r in uniq.tolist():
            self.last_use[self.slot_of[r]] = self._clock
        return out.reshape(shape)

    def _allocate(self, n: int) -> np.ndarray:
        if n > self.C:
            raise ValueError(
                f"batch touches {n} unique rows > cache_rows {self.C}"
            )
        slots = []
        while self._free and len(slots) < n:
            slots.append(self._free.pop())
        need = n - len(slots)
        if need:
            # evict the LRU `need` occupied slots not allocated this call
            occupied = np.asarray(
                [s for s in range(self.C) if self.row_in_slot[s] >= 0
                 and s not in slots],
                np.int64,
            )
            order = occupied[np.argsort(self.last_use[occupied])]
            victims = order[:need]
            self._evict(victims)
            slots.extend(victims.tolist())
        return np.asarray(slots, np.int64)

    def _evict(self, victims: np.ndarray) -> None:
        dirty_v = victims[self.dirty[victims]]
        if dirty_v.size:
            rows_back = np.asarray(self.cache_w[jnp.asarray(dirty_v)])
            self.table[self.row_in_slot[dirty_v]] = rows_back
            for host_m, attr in self._momentum_pairs():
                host_m[self.row_in_slot[dirty_v]] = np.asarray(
                    getattr(self, attr)[jnp.asarray(dirty_v)]
                )
        for s in victims.tolist():
            del self.slot_of[self.row_in_slot[s]]
            self.row_in_slot[s] = -1
            self.dirty[s] = False

    def flush(self) -> None:
        """Write all dirty rows back to the host table
        (ref: batched_embedding_kernel.py:344,455)."""
        occ = np.nonzero(self.dirty)[0]
        if occ.size:
            self._sync_back(occ)
            self.dirty[occ] = False

    def invalidate(self) -> None:
        """Flush then drop all residency — required after mutating the
        host table/momentum directly, else resident rows go stale."""
        self.flush()
        self.slot_of.clear()
        self.row_in_slot[:] = -1
        self.dirty[:] = False
        self.last_use[:] = 0
        self._free = list(range(self.C - 1, -1, -1))

    def _sync_back(self, slots: np.ndarray) -> None:
        rows = np.asarray(self.cache_w[jnp.asarray(slots)])
        self.table[self.row_in_slot[slots]] = rows
        for host_m, attr in self._momentum_pairs():
            host_m[self.row_in_slot[slots]] = np.asarray(
                getattr(self, attr)[jnp.asarray(slots)]
            )

    # -- device-side compute (same fused kernels, slot-translated ids) ------

    def lookup_pooled(
        self, slot_ids: Array, lengths: Array, coeff: Optional[Array] = None
    ) -> Array:
        """Pooled lookup on the cache: slot_ids [B, L], lengths [B]."""
        from torchrec_tpu.ops.embedding import (
            PoolingMode,
            embedding_bag_lookup,
        )

        return embedding_bag_lookup(
            self.cache_w, slot_ids, lengths, PoolingMode.SUM, coeff
        )

    def update(
        self,
        flat_slot_ids: Array,
        row_grads: Array,
        valid: Array,
        learning_rate,
    ) -> None:
        """Fused optimizer step on cached rows; marks them dirty."""
        opt = FusedOptimizerState(
            momentum1=self.cache_m1,
            momentum2=self.cache_m2,
            step=self.step,
            optim=self.optim,
        )
        new_w, new_opt = apply_fused_update(
            self.cache_w, opt, flat_slot_ids, row_grads, valid,
            learning_rate, **self.optim_kwargs,
        )
        self.cache_w = new_w
        self.cache_m1 = new_opt.momentum1
        self.cache_m2 = new_opt.momentum2
        self.step = new_opt.step
        touched = np.unique(np.asarray(flat_slot_ids)[np.asarray(valid)])
        self.dirty[touched] = True
