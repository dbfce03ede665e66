"""Hierarchical sharding: TABLE_ROW_WISE (TWRW) and TABLE_COLUMN_WISE (TWCW).

ref: torchrec/distributed/sharding/twrw_sharding.py:253-484 and
twcw_sharding.py:16-34 — a table is pinned to one HOST; its rows (TWRW)
or columns (TWCW) are split across that host's local devices, so the
heavy reduce/concat traffic rides intra-host links (ICI) and only the
final batch-routing crosses hosts (the reference's intra-node
reduce-scatter + cross-node all-to-all over the two-level process groups
of comm.py:102-150).

TPU re-design:
* One FLAT mesh axis; the host/local split is expressed with
  `axis_index_groups`: intra groups [[h*Lc + l for l], ...] and cross
  groups [[h*Lc + l for h], ...]. On hardware, mesh device order must
  place consecutive ranks on the same host so intra groups ride ICI.
* The reference's "staggered shuffle" (_get_recat stagger,
  dist_data.py:40-118) becomes a static transpose of the all_gathered
  batch: gathered blocks are viewed [H, Lc] and transposed to [Lc, H] so
  that after the intra-scatter (chunk l) and cross-split (sub-chunk h),
  device (h, l) ends up holding exactly its canonical batch block
  h*Lc + l. No runtime permutation tensors.

Storage: [n_dev, rows_loc, cols_loc] like every other strategy, so
shard/unshard/checkpoint/fused-update machinery is shared.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from torchrec_tpu.ops.embedding import pooled_lookup
from torchrec_tpu.ops.fused_update import apply_fused_update
from torchrec_tpu.parallel.strategies import (
    AXIS,
    BaseEmbeddingShardingStrategy,
    EmbeddingGroupState,
    _cdiv,
    _merge_dev_fracs,
    _mom_layout_fracs,
    _uniq_entries,
    _pad_rows_tile,
    _token_mask,
)
from torchrec_tpu.parallel.types import ShardingType

Array = jax.Array


class TwRwEmbeddingSharding(BaseEmbeddingShardingStrategy):
    """Table pinned to a host; rows split over its local devices
    (ref: twrw_sharding.py:114-163,253-484)."""

    def _build(self) -> None:
        n = self.n
        Lc = self.env.local_size
        if n % Lc:
            raise ValueError(f"world {n} not divisible by local size {Lc}")
        H = n // Lc
        self.H, self.Lc = H, Lc
        self.intra_groups = [
            [h * Lc + l for l in range(Lc)] for h in range(H)
        ]
        self.cross_groups = [
            [h * Lc + l for h in range(H)] for l in range(Lc)
        ]

        per_host: List[List[int]] = [[] for _ in range(H)]
        for ti, t in enumerate(self.meta.tables):
            if not (0 <= t.rank < H):
                raise ValueError(
                    f"table {t.name} pinned to host {t.rank} outside "
                    f"{H} hosts"
                )
            per_host[t.rank].append(ti)

        feats_of_table: List[List[int]] = [[] for _ in self.meta.tables]
        for fi, ti in enumerate(self.meta.feature_table):
            feats_of_table[ti].append(fi)

        self.f_max = max(
            (sum(len(feats_of_table[ti]) for ti in tids)
             for tids in per_host),
            default=1,
        ) or 1
        # per-table row shard size over Lc local devices
        self.table_sr = np.asarray(
            [_cdiv(t.rows, Lc) for t in self.meta.tables], np.int32
        )
        self.rows_loc = _pad_rows_tile(max(
            (sum(int(self.table_sr[ti]) for ti in tids)
             for tids in per_host),
            default=1,
        ) or 1)

        F = len(self.meta.features)
        self.host_feats = np.zeros((H, self.f_max), np.int32)
        self.host_feat_valid = np.zeros((H, self.f_max), bool)
        self.host_feat_sr = np.ones((H, self.f_max), np.int32)
        self.host_feat_off = np.zeros((H, self.f_max), np.int32)
        self.out_pos = np.zeros((F,), np.int32)
        self.per_host = per_host
        self.table_local_off: Dict[int, int] = {}
        for h, tids in enumerate(per_host):
            slot = 0
            off = 0
            for ti in tids:
                self.table_local_off[ti] = off
                for fi in feats_of_table[ti]:
                    self.host_feats[h, slot] = fi
                    self.host_feat_valid[h, slot] = True
                    self.host_feat_sr[h, slot] = self.table_sr[ti]
                    self.host_feat_off[h, slot] = off
                    self.out_pos[fi] = h * self.f_max + slot
                    slot += 1
                off += int(self.table_sr[ti])
        # uids per device = [f_max, B, L] slots of the HOST's features;
        # 1/Lc of each table's ids owned locally (owner = id // sr);
        # worst host's worst momentum block gates the static window
        self.mom_fracs = _merge_dev_fracs([
            _mom_layout_fracs(
                [
                    (self.table_local_off[ti], int(self.table_sr[ti]),
                     len(feats_of_table[ti]) / (self.f_max * Lc))
                    for ti in tids
                ],
                self.rows_loc,
            )
            for tids in per_host
        ])
        self.mom_share = max(self.mom_fracs) if self.mom_fracs else None
        # unique-row hard bound per device (ops/cost_model.unique_slot_cap):
        # a device sees all its host's feature ids ([f_max, B, L] slots,
        # non-owned masked invalid) and owns table_sr rows of each table
        self.uniq_entries = tuple(
            _uniq_entries(
                (int(self.table_sr[ti]),
                 len(feats_of_table[ti]) / self.f_max)
                for ti in tids
            )
            for tids in per_host
        )

    def weights_shape(self):
        return (self.n, self.rows_loc, self.dim)

    def _pack_dense(self, dense, dtype=None):
        arr = jnp.zeros((self.n, self.rows_loc, self.dim), jnp.float32)
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                sr = int(self.table_sr[ti])
                off = self.table_local_off[ti]
                w = jnp.asarray(dense[t.name], jnp.float32)
                pad = sr * self.Lc - t.rows
                if pad:
                    w = jnp.concatenate(
                        [w, jnp.zeros((pad, t.dim), w.dtype)], axis=0
                    )
                for l in range(self.Lc):
                    arr = arr.at[h * self.Lc + l, off : off + sr].set(
                        w[l * sr : (l + 1) * sr]
                    )
        return arr.astype(dtype or self.w_dtype)

    def unshard_to_dense(self, weights):
        w = np.asarray(weights)
        out = {}
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                sr = int(self.table_sr[ti])
                off = self.table_local_off[ti]
                parts = [
                    w[h * self.Lc + l, off : off + sr]
                    for l in range(self.Lc)
                ]
                out[t.name] = np.concatenate(parts)[: t.rows]
        return out

    def unshard_rowwise(self, m):
        # m [n, rows_loc]: host h's table rows split over its Lc locals
        out = {}
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                sr = int(self.table_sr[ti])
                off = self.table_local_off[ti]
                parts = [
                    m[h * self.Lc + l, off : off + sr]
                    for l in range(self.Lc)
                ]
                out[t.name] = np.concatenate(parts)[: t.rows]
        return out

    def shard_rowwise(self, per_table):
        arr = np.zeros((self.n, self.rows_loc), np.float32)
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                sr = int(self.table_sr[ti])
                off = self.table_local_off[ti]
                v = np.asarray(per_table[t.name], np.float32)
                pad = sr * self.Lc - t.rows
                if pad:
                    v = np.concatenate([v, np.zeros((pad,), v.dtype)])
                for l in range(self.Lc):
                    arr[h * self.Lc + l, off : off + sr] = (
                        v[l * sr : (l + 1) * sr]
                    )
        return jax.device_put(jnp.asarray(arr), self._sharding(P(AXIS)))

    # -- stagger helpers -----------------------------------------------------

    def _stagger(self, x: Array, batch_axis: int) -> Array:
        """Reorder gathered batch blocks [H, Lc] -> [Lc, H] so downstream
        intra-scatter + cross-split deliver canonical blocks."""
        H, Lc = self.H, self.Lc
        shape = x.shape
        B = shape[batch_axis]
        bn = B // self.n
        pre = shape[:batch_axis]
        post = shape[batch_axis + 1:]
        x = x.reshape(*pre, H, Lc, bn, *post)
        perm = list(range(x.ndim))
        a = len(pre)
        perm[a], perm[a + 1] = perm[a + 1], perm[a]
        return x.transpose(perm).reshape(*shape)

    def _route_feature_major(self, x: Array) -> Array:
        """Routed input dist (input_routing="a2a"): deliver each HOST only
        its own features' blocks instead of all_gathering everything.

        x is a local feature-major array [F, B_loc, ...]. Per destination
        host h we select x[host_feats[h]] and all_to_all over the
        cross-host groups (the DCN leg carries f_max/F of the all_gather
        traffic), then all_gather over the intra-host groups (ICI, cheap)
        and reorder to the staggered [Lc, H] batch-block layout the rest
        of the kernel expects (ref: the targeted two-phase exchange,
        dist_data.py:40-567, vs this strategy's default full all_gather).
        Returns [f_max, B_global, ...] for MY host's feature slots.
        """
        H, Lc = self.H, self.Lc
        feats = jnp.asarray(self.host_feats).reshape(-1)  # [H * f_max]
        sel = x[feats].reshape(H, self.f_max, *x.shape[1:])
        y = lax.all_to_all(
            sel, AXIS, split_axis=0, concat_axis=2, tiled=True,
            axis_index_groups=self.cross_groups,
        )[0]  # [f_max, H*B_loc, ...] blocks ordered by source host h'
        z = lax.all_gather(
            y, AXIS, axis=0, tiled=False,
            axis_index_groups=self.intra_groups,
        )  # [Lc, f_max, H*B_loc, ...] ordered by source local l'
        z = jnp.moveaxis(z, 0, 1)  # [f_max, Lc, H*B_loc, ...]
        return z.reshape(self.f_max, Lc * z.shape[2], *x.shape[2:])

    def _route_inputs(self, ids, lengths, psw, h):
        """Routed equivalent of all_gather+_stagger+_mine: my host's
        feature slots over the staggered global batch."""
        ids_m = self._route_feature_major(ids)
        fvalid = jnp.asarray(self.host_feat_valid)[h]
        len_m = self._route_feature_major(lengths) * fvalid[:, None].astype(
            lengths.dtype
        )
        psw_m = None if psw is None else self._route_feature_major(psw)
        feats = jnp.asarray(self.host_feats)[h]
        mean_m = jnp.asarray(self.meta.feature_pooling_mean)[feats]
        sr = jnp.asarray(self.host_feat_sr)[h][:, None, None]
        off = jnp.asarray(self.host_feat_off)[h][:, None, None]
        return ids_m, len_m, psw_m, mean_m, sr, off

    def _mine(self, ids_s, len_s, psw_s, h):
        feats = jnp.asarray(self.host_feats)[h]
        fvalid = jnp.asarray(self.host_feat_valid)[h]
        ids_m = ids_s[feats]
        len_m = len_s[feats] * fvalid[:, None].astype(len_s.dtype)
        psw_m = None if psw_s is None else psw_s[feats]
        mean_m = jnp.asarray(self.meta.feature_pooling_mean)[feats]
        sr = jnp.asarray(self.host_feat_sr)[h][:, None, None]
        off = jnp.asarray(self.host_feat_off)[h][:, None, None]
        return ids_m, len_m, psw_m, mean_m, sr, off

    def _coeff(self, len_m, L, mean_m, psw_m, dtype):
        coeff = _token_mask(len_m, L).astype(dtype)
        if psw_m is not None:
            coeff = coeff * psw_m.astype(dtype)
        denom = jnp.maximum(len_m.astype(dtype), 1.0)[:, :, None]
        return jnp.where(mean_m[:, None, None], coeff / denom, coeff)

    def _host_meta(self, h):
        """Static per-host feature metadata (mean flags, shard rows,
        local offsets) — recomputed in-step, never shipped."""
        feats = jnp.asarray(self.host_feats)[h]
        mean_m = jnp.asarray(self.meta.feature_pooling_mean)[feats]
        sr = jnp.asarray(self.host_feat_sr)[h][:, None, None]
        off = jnp.asarray(self.host_feat_off)[h][:, None, None]
        return mean_m, sr, off

    def _acquire_inputs(self, ids, lengths, psw, h, has_w):
        """Input dist (either routing mode) -> my host's feature-slot
        views over the staggered global batch. This is the batch-only,
        parameter-independent stage — exactly what input_dist prefetches."""
        if self.input_routing == "a2a":
            return self._route_inputs(
                ids, lengths, psw if has_w else None, h
            )
        ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
        len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
        psw_g = (
            lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
        )
        ids_s = self._stagger(ids_g, 1)
        len_s = self._stagger(len_g, 1)
        psw_s = None if psw_g is None else self._stagger(psw_g, 1)
        return self._mine(ids_s, len_s, psw_s, h)

    def _fwd_tail(self, w, l, ids_m, len_m, psw_m, mean_m, sr, off, L):
        """Per-device forward after input acquisition."""
        owner_l = ids_m // sr
        local = ids_m % sr + off
        owned = (owner_l == l) & _token_mask(len_m, L)
        coeff = self._coeff(len_m, L, mean_m, psw_m, w.dtype)
        coeff = coeff * owned.astype(w.dtype)
        partial = pooled_lookup(w[0], local, coeff, impl=self.emb_impl)
        # intra-host reduce-scatter (ICI), ref twrw_sharding.py:441-484
        intra = lax.psum_scatter(
            partial, AXIS, scatter_dimension=1, tiled=True,
            axis_index_groups=self.intra_groups,
        )  # [f_max, B/Lc, D]
        # cross-host all_to_all routes feature blocks to batch owners
        cross = lax.all_to_all(
            intra, AXIS, split_axis=1, concat_axis=0, tiled=True,
            axis_index_groups=self.cross_groups,
        )  # [H*f_max, B/n, D]
        return cross[jnp.asarray(self.out_pos)]

    def _upd_tail(self, w, opt, l, d_out, ids_m, len_m, psw_m, mean_m,
                  sr, off, lr, L):
        """Per-device update after input acquisition (the cotangent
        routing depends on the loss and always runs in-step)."""
        D = self.dim
        # route cotangent back: canonical -> slots -> cross -> intra
        slots = jnp.zeros(
            (self.H * self.f_max, d_out.shape[1], D), d_out.dtype
        ).at[jnp.asarray(self.out_pos)].set(d_out)
        d1 = lax.all_to_all(
            slots, AXIS, split_axis=0, concat_axis=1, tiled=True,
            axis_index_groups=self.cross_groups,
        )  # [f_max, B/Lc, D]
        d_full = lax.all_gather(
            d1, AXIS, axis=1, tiled=True,
            axis_index_groups=self.intra_groups,
        )  # [f_max, B, D] staggered order (matches ids_s)
        owner_l = ids_m // sr
        local = ids_m % sr + off
        owned = (owner_l == l) & _token_mask(len_m, L)
        coeff = self._coeff(len_m, L, mean_m, psw_m, w.dtype)
        row_grads = d_full[:, :, None, :] * coeff[:, :, :, None]
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            local.reshape(-1), row_grads.reshape(-1, D),
            owned.reshape(-1), lr,
            mom_block_fracs=self.mom_fracs,
            unique_entries=self.uniq_entries, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        has_w = sb.weights is not None
        Lc = self.Lc

        def fwd(w, ids, lengths, psw):
            my = lax.axis_index(AXIS)
            h, l = my // Lc, my % Lc
            ids_m, len_m, psw_m, mean_m, sr, off = self._acquire_inputs(
                ids, lengths, psw, h, has_w
            )
            return self._fwd_tail(
                w, l, ids_m, len_m, psw_m, mean_m, sr, off, L
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths, psw)

    def update(self, state, sb, d_pooled, learning_rate):
        F, B_loc, L = sb.ids.shape
        has_w = sb.weights is not None
        Lc = self.Lc

        def upd(w, opt, ids, lengths, psw, d_out, lr):
            my = lax.axis_index(AXIS)
            h, l = my // Lc, my % Lc
            ids_m, len_m, psw_m, mean_m, sr, off = self._acquire_inputs(
                ids, lengths, psw, h, has_w
            )
            return self._upd_tail(
                w, opt, l, d_out, ids_m, len_m, psw_m, mean_m, sr, off,
                lr, L,
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        psw_spec = P(None, AXIS) if has_w else P()
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(None, AXIS),
                      P(None, AXIS), psw_spec, P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # the fused update may dispatch a Pallas RMW kernel
            # (size-adaptive, ops/fused_update.py) whose out_shape carries
            # no vma annotation — the static VMA check cannot see through
            # the custom call
            check_vma=False,
        )(state.weights, state.opt, sb.ids, sb.lengths, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


    # -- cross-batch input-dist prefetch ------------------------------------
    #
    # For hierarchical strategies the prefetch matters MOST: in a2a
    # routing mode the input dist's cross-host leg rides DCN (long
    # latency); pre-computing it inside the previous step hides that
    # latency behind a full batch of dense compute.

    supports_input_dist = True

    def input_dist(self, sb):
        """Pre-computed host-feature input views, device-major: a tuple
        (ids_r [n, f_max, B, L], len_r [n, f_max, B], psw_r or None),
        each sharded on the leading device axis. Covers BOTH routing
        modes (all_gather+stagger or routed a2a)."""
        has_w = sb.weights is not None
        Lc = self.Lc

        def dist(ids, lengths, psw):
            my = lax.axis_index(AXIS)
            h = my // Lc
            ids_m, len_m, psw_m, _, _, _ = self._acquire_inputs(
                ids, lengths, psw, h, has_w
            )
            psw_out = psw_m[None] if has_w else psw
            return ids_m[None], len_m[None], psw_out

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        ids_r, len_r, psw_r = jax.shard_map(
            dist,
            mesh=self.env.mesh,
            in_specs=(P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=(P(AXIS), P(AXIS), P(AXIS) if has_w else P()),
            # per-device views stacked on a leading device axis; the
            # static VMA check cannot type the mixed varying/replicated
            # outputs
            check_vma=False,
        )(sb.ids, sb.lengths, psw)
        return (ids_r, len_r, psw_r if has_w else None)

    def forward_from_dist(self, state, dist):
        ids_r, len_r, psw_r = dist
        L = ids_r.shape[3]
        has_w = psw_r is not None
        Lc = self.Lc

        def fwd(w, ids_rl, len_rl, psw_rl):
            my = lax.axis_index(AXIS)
            h, l = my // Lc, my % Lc
            mean_m, sr, off = self._host_meta(h)
            psw_m = psw_rl[0] if has_w else None
            return self._fwd_tail(
                w, l, ids_rl[0], len_rl[0], psw_m, mean_m, sr, off, L
            )

        psw = psw_r if has_w else jnp.zeros((), ids_r.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
            # pre-distributed per-device views + collectives inside
            check_vma=False,
        )(state.weights, ids_r, len_r, psw)

    def update_from_dist(self, state, dist, d_pooled, learning_rate):
        ids_r, len_r, psw_r = dist
        L = ids_r.shape[3]
        has_w = psw_r is not None
        Lc = self.Lc

        def upd(w, opt, ids_rl, len_rl, psw_rl, d_out, lr):
            my = lax.axis_index(AXIS)
            h, l = my // Lc, my % Lc
            mean_m, sr, off = self._host_meta(h)
            psw_m = psw_rl[0] if has_w else None
            return self._upd_tail(
                w, opt, l, d_out, ids_rl[0], len_rl[0], psw_m, mean_m,
                sr, off, lr, L,
            )

        psw = psw_r if has_w else jnp.zeros((), ids_r.dtype)
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(AXIS),
                      P(AXIS), P(AXIS) if has_w else P(), P(None, AXIS),
                      P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # pre-distributed per-device views + Pallas custom call
            check_vma=False,
        )(state.weights, state.opt, ids_r, len_r, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class TwCwEmbeddingSharding(TwRwEmbeddingSharding):
    """Table pinned to a host; columns split over its local devices
    (ref: twcw_sharding.py:16-34 — CW restricted to one host). Each local
    column shard keeps independent rowwise momentum (virtual tables,
    as in plain CW)."""

    def _build(self) -> None:
        super()._build()
        if self.dim % self.Lc:
            raise ValueError(
                f"TWCW needs dim {self.dim} divisible by local size {self.Lc}"
            )
        self.cols_loc = self.dim // self.Lc
        # rows are NOT split: local offset = concat of full tables per host
        self.rows_loc = _pad_rows_tile(max(
            (sum(self.meta.tables[ti].rows for ti in tids)
             for tids in self.per_host),
            default=1,
        ) or 1)
        off_map: Dict[int, int] = {}
        for h, tids in enumerate(self.per_host):
            off = 0
            for ti in tids:
                off_map[ti] = off
                off += self.meta.tables[ti].rows
        self.table_local_off = off_map
        for h, tids in enumerate(self.per_host):
            slot = 0
            for ti in tids:
                for _ in range(
                    int((self.meta.feature_table == ti).sum())
                ):
                    self.host_feat_off[h, slot] = off_map[ti]
                    self.host_feat_sr[h, slot] = 1  # unused
                    slot += 1
        # TWCW: full rows on every device of the host (columns split);
        # every slot's ids land locally -> frac = feats_t / f_max
        ft = self.meta.feature_table
        self.mom_fracs = _merge_dev_fracs([
            _mom_layout_fracs(
                [
                    (off_map[ti], self.meta.tables[ti].rows,
                     int((ft == ti).sum()) / self.f_max)
                    for ti in tids
                ],
                self.rows_loc,
            )
            for tids in self.per_host
        ])
        self.mom_share = max(self.mom_fracs) if self.mom_fracs else None
        self.uniq_entries = tuple(
            _uniq_entries(
                (self.meta.tables[ti].rows,
                 int((ft == ti).sum()) / self.f_max)
                for ti in tids
            )
            for tids in self.per_host
        )

    def weights_shape(self):
        return (self.n, self.rows_loc, self.cols_loc)

    def _pack_dense(self, dense, dtype=None):
        arr = jnp.zeros((self.n, self.rows_loc, self.cols_loc), jnp.float32)
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                off = self.table_local_off[ti]
                w = jnp.asarray(dense[t.name], jnp.float32)
                for l in range(self.Lc):
                    arr = arr.at[h * self.Lc + l, off : off + t.rows].set(
                        w[:, l * self.cols_loc : (l + 1) * self.cols_loc]
                    )
        return arr.astype(dtype or self.w_dtype)

    def unshard_to_dense(self, weights):
        w = np.asarray(weights)
        out = {}
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                off = self.table_local_off[ti]
                cols = [
                    w[h * self.Lc + l, off : off + t.rows]
                    for l in range(self.Lc)
                ]
                out[t.name] = np.concatenate(cols, axis=1)
        return out

    def rowwise_shards(self):
        return self.Lc

    def unshard_rowwise(self, m):
        # m [n, rows_loc]: each of host h's Lc column shards keeps its own
        # rowwise state -> canonical [S=Lc, R] per table (column order)
        out = {}
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                off = self.table_local_off[ti]
                out[t.name] = np.stack(
                    [
                        m[h * self.Lc + l, off : off + t.rows]
                        for l in range(self.Lc)
                    ]
                )
        return out

    def shard_rowwise(self, per_table):
        arr = np.zeros((self.n, self.rows_loc), np.float32)
        for h, tids in enumerate(self.per_host):
            for ti in tids:
                t = self.meta.tables[ti]
                off = self.table_local_off[ti]
                # [Lc, R]; 1-D input = the Lc == 1 plain-row case
                v = np.atleast_2d(
                    np.asarray(per_table[t.name], np.float32)
                )
                for l in range(self.Lc):
                    arr[h * self.Lc + l, off : off + t.rows] = v[l]
        return jax.device_put(jnp.asarray(arr), self._sharding(P(AXIS)))

    def _fwd_tail(self, w, l, ids_m, len_m, psw_m, mean_m, sr, off, L):
        """Per-device forward after input acquisition (l/sr unused:
        columns are split locally, every device holds all rows)."""
        coeff = self._coeff(len_m, L, mean_m, psw_m, w.dtype)
        local = ids_m + off
        pooled = pooled_lookup(
            w[0], local, coeff, impl=self.emb_impl
        )  # [f,B,D/Lc]
        # intra-host: swap batch-sharding for column-concat (ICI)
        intra = lax.all_to_all(
            pooled, AXIS, split_axis=1, concat_axis=2, tiled=True,
            axis_index_groups=self.intra_groups,
        )  # [f_max, B/Lc, D]
        cross = lax.all_to_all(
            intra, AXIS, split_axis=1, concat_axis=0, tiled=True,
            axis_index_groups=self.cross_groups,
        )  # [H*f_max, B/n, D]
        return cross[jnp.asarray(self.out_pos)]

    def _upd_tail(self, w, opt, l, d_out, ids_m, len_m, psw_m, mean_m,
                  sr, off, lr, L):
        slots = jnp.zeros(
            (self.H * self.f_max, d_out.shape[1], self.dim), d_out.dtype
        ).at[jnp.asarray(self.out_pos)].set(d_out)
        d1 = lax.all_to_all(
            slots, AXIS, split_axis=0, concat_axis=1, tiled=True,
            axis_index_groups=self.cross_groups,
        )  # [f_max, B/Lc, D]
        d2 = lax.all_to_all(
            d1, AXIS, split_axis=2, concat_axis=1, tiled=True,
            axis_index_groups=self.intra_groups,
        )  # [f_max, B, D/Lc] staggered
        coeff = self._coeff(len_m, L, mean_m, psw_m, w.dtype)
        row_grads = d2[:, :, None, :] * coeff[:, :, :, None]
        valid = _token_mask(len_m, L)
        local = ids_m + off
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            local.reshape(-1), row_grads.reshape(-1, self.cols_loc),
            valid.reshape(-1), lr,
            mom_block_fracs=self.mom_fracs,
            unique_entries=self.uniq_entries, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        has_w = sb.weights is not None
        Lc = self.Lc

        def fwd(w, ids, lengths, psw):
            my = lax.axis_index(AXIS)
            h, l = my // Lc, my % Lc
            ids_m, len_m, psw_m, mean_m, sr, off = self._acquire_inputs(
                ids, lengths, psw, h, has_w
            )
            return self._fwd_tail(
                w, l, ids_m, len_m, psw_m, mean_m, sr, off, L
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths, psw)

    def update(self, state, sb, d_pooled, learning_rate):
        F, B_loc, L = sb.ids.shape
        has_w = sb.weights is not None
        Lc = self.Lc

        def upd(w, opt, ids, lengths, psw, d_out, lr):
            my = lax.axis_index(AXIS)
            h, l = my // Lc, my % Lc
            ids_m, len_m, psw_m, mean_m, sr, off = self._acquire_inputs(
                ids, lengths, psw, h, has_w
            )
            return self._upd_tail(
                w, opt, l, d_out, ids_m, len_m, psw_m, mean_m, sr, off,
                lr, L,
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        psw_spec = P(None, AXIS) if has_w else P()
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(None, AXIS),
                      P(None, AXIS), psw_spec, P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # the fused update may dispatch a Pallas RMW kernel
            # (size-adaptive, ops/fused_update.py) whose out_shape carries
            # no vma annotation — the static VMA check cannot see through
            # the custom call
            check_vma=False,
        )(state.weights, state.opt, sb.ids, sb.lengths, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)
