"""Sequence (unpooled) sharding strategies for EmbeddingCollection.

ref: torchrec/distributed/sharding/{rw,tw,dp}_sequence_sharding.py and
SequenceEmbeddingAllToAll (dist_data.py:841-932): per-token embedding
rows fetched from the owning rank and redistributed back to the batch
owner.

TPU re-design: same collective skeletons as the pooled strategies
(strategies.py) minus the pooling reduction — outputs are [F, B, L, D]
per-token rows, pad tokens zeroed. The reference's SequenceShardingContext
(input splits / unbucketize permutes carried between input and output
dists) does not exist: shapes are static, routing is recomputed as cheap
index math inside the same jit.

Storage layouts are inherited from the pooled strategies, so shard/
unshard/checkpointing work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from torchrec_tpu.ops.embedding import lookup_rows
from torchrec_tpu.ops.fused_update import apply_fused_update
from torchrec_tpu.parallel.strategies import (
    AXIS,
    BaseEmbeddingShardingStrategy,
    DpEmbeddingSharding,
    EmbeddingGroupState,
    RwEmbeddingSharding,
    TwEmbeddingSharding,
    _token_mask,
)
from torchrec_tpu.parallel.types import ShardingType

Array = jax.Array


class DpSequenceEmbeddingSharding(DpEmbeddingSharding):
    """ref: dp_sequence_sharding.py — replicated table, local per-token
    lookup, sparse grad sync via all_gather."""

    def forward(self, state, sb):
        F, B, L = sb.ids.shape
        mesh = self.env.mesh

        def fwd(w, ids, lengths):
            gids = ids + jnp.asarray(self.feat_row_off)[:, None, None]
            rows = w[gids.reshape(-1)].reshape(*gids.shape, w.shape[-1])
            mask = _token_mask(lengths, L).astype(w.dtype)
            return rows * mask[..., None]

        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(), P(None, AXIS), P(None, AXIS)),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths)

    def update(self, state, sb, d_tokens, learning_rate):
        F, B, L = sb.ids.shape
        mesh = self.env.mesh
        D = self.dim

        def upd(w, opt, ids, lengths, d_out, lr):
            gids = ids + jnp.asarray(self.feat_row_off)[:, None, None]
            valid = _token_mask(lengths, L)
            ids_all = lax.all_gather(gids.reshape(-1), AXIS, tiled=True)
            grads_all = lax.all_gather(
                d_out.reshape(-1, D), AXIS, tiled=True
            )
            valid_all = lax.all_gather(valid.reshape(-1), AXIS, tiled=True)
            return apply_fused_update(
                w, opt, ids_all, grads_all, valid_all, lr, **self.optim_kwargs
            )

        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
            in_specs=(P(), self._opt_specs(sharded=False), P(None, AXIS),
                      P(None, AXIS), P(None, AXIS), P()),
            out_specs=(P(), self._opt_specs(sharded=False)),
            check_vma=False,  # replicated by construction (see DP pooled)
        )(state.weights, state.opt, sb.ids, sb.lengths, d_tokens,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class RwSequenceEmbeddingSharding(RwEmbeddingSharding):
    """ref: rw_sequence_sharding.py:81 — row shards; each token's row is
    produced by its owning shard and summed to the batch owner via
    psum_scatter (zeros from non-owners)."""

    # token-level *_from_dist bodies below REPLACE the inherited pooled
    # ones (the base input_dist — all_gather of ids/lengths — is shared)
    supports_input_dist = True

    def _fwd_tokens(self, w, ids_g, len_g, L):
        """Per-device token forward on pre-gathered global inputs."""
        my = lax.axis_index(AXIS)
        local, owned = self._route(ids_g, len_g, my, L)
        rows = lookup_rows(
            w[0], local.reshape(-1), impl=self.emb_impl
        ).reshape(
            *local.shape, w.shape[-1]
        )
        rows = rows * owned.astype(w.dtype)[..., None]
        return lax.psum_scatter(
            rows, AXIS, scatter_dimension=1, tiled=True
        )  # [F, B_loc, L, D]

    def _upd_tokens(self, w, opt, ids_g, len_g, d_g, lr, L):
        """Per-device token update on pre-gathered global inputs (d_g is
        the already-gathered [F, B, L, D] cotangent)."""
        my = lax.axis_index(AXIS)
        local, owned = self._route(ids_g, len_g, my, L)
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            local.reshape(-1), d_g.reshape(-1, self.dim),
            owned.reshape(-1), lr, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh

        def fwd(w, ids, lengths):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            return self._fwd_tokens(w, ids_g, len_g, L)

        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS)),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths)

    def forward_from_dist(self, state, sb_g):
        F, B, L = sb_g.ids.shape

        def fwd(w, ids_g, len_g):
            return self._fwd_tokens(w, ids_g, len_g, L)

        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(), P()),
            out_specs=P(None, AXIS),
            # pre-gathered replicated batch + device-varying shard
            check_vma=False,
        )(state.weights, sb_g.ids, sb_g.lengths)

    def update(self, state, sb, d_tokens, learning_rate):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh

        def upd(w, opt, ids, lengths, d_out, lr):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            d_g = lax.all_gather(d_out, AXIS, axis=1, tiled=True)
            return self._upd_tokens(w, opt, ids_g, len_g, d_g, lr, L)

        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(None, AXIS),
                      P(None, AXIS), P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # fused update may dispatch a Pallas RMW custom call
            # (size-adaptive); the VMA check cannot see through it
            check_vma=False,
        )(state.weights, state.opt, sb.ids, sb.lengths, d_tokens,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)

    def update_from_dist(self, state, sb_g, d_tokens, learning_rate):
        F, B, L = sb_g.ids.shape

        def upd(w, opt, ids_g, len_g, d_out, lr):
            # the cotangent depends on the loss — its gather stays in-step
            d_g = lax.all_gather(d_out, AXIS, axis=1, tiled=True)
            return self._upd_tokens(w, opt, ids_g, len_g, d_g, lr, L)

        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(), P(),
                      P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # pre-gathered replicated batch + Pallas custom call (above)
            check_vma=False,
        )(state.weights, state.opt, sb_g.ids, sb_g.lengths, d_tokens,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class TwSequenceEmbeddingSharding(TwEmbeddingSharding):
    """ref: tw_sequence_sharding.py — table owner looks up the global
    batch's tokens; all_to_all returns rows to batch owners (the
    SequenceEmbeddingAllToAll equivalent, dist_data.py:841-932)."""

    # token-level *_from_dist bodies below REPLACE the inherited pooled
    # ones (the base input_dist — all_gather of ids/lengths — is shared)
    supports_input_dist = True

    def _fwd_tokens(self, w, ids_g, len_g, L):
        my = lax.axis_index(AXIS)
        ids_m, len_m, _, _ = self._mine(ids_g, len_g, None, my)
        rows = lookup_rows(
            w[0], ids_m.reshape(-1), impl=self.emb_impl
        ).reshape(
            *ids_m.shape, w.shape[-1]
        )
        mask = _token_mask(len_m, L).astype(w.dtype)
        rows = rows * mask[..., None]  # [f_max, B, L, D]
        slots = lax.all_to_all(
            rows, AXIS, split_axis=1, concat_axis=0, tiled=True
        )  # [n*f_max, B_loc, L, D]
        return slots[jnp.asarray(self.out_pos)]

    def _upd_tokens(self, w, opt, ids_g, len_g, d_out, lr, L):
        """d_out is the batch-sharded [F, B_loc, L, D] cotangent — its
        slot routing depends on the loss and stays in-step."""
        my = lax.axis_index(AXIS)
        D = self.dim
        slots = jnp.zeros(
            (self.n * self.f_max, d_out.shape[1], L, D), d_out.dtype
        )
        slots = slots.at[jnp.asarray(self.out_pos)].set(d_out)
        d_m = lax.all_to_all(
            slots, AXIS, split_axis=0, concat_axis=1, tiled=True
        )  # [f_max, B, L, D]
        ids_m, len_m, _, _ = self._mine(ids_g, len_g, None, my)
        valid = _token_mask(len_m, L)
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            ids_m.reshape(-1), d_m.reshape(-1, D),
            valid.reshape(-1), lr, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh

        def fwd(w, ids, lengths):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            return self._fwd_tokens(w, ids_g, len_g, L)

        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS)),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths)

    def forward_from_dist(self, state, sb_g):
        F, B, L = sb_g.ids.shape

        def fwd(w, ids_g, len_g):
            return self._fwd_tokens(w, ids_g, len_g, L)

        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(), P()),
            out_specs=P(None, AXIS),
            # pre-gathered replicated batch + device-varying shard
            check_vma=False,
        )(state.weights, sb_g.ids, sb_g.lengths)

    def update(self, state, sb, d_tokens, learning_rate):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh

        def upd(w, opt, ids, lengths, d_out, lr):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            return self._upd_tokens(w, opt, ids_g, len_g, d_out, lr, L)

        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(None, AXIS),
                      P(None, AXIS), P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # fused update may dispatch a Pallas RMW custom call
            # (size-adaptive); the VMA check cannot see through it
            check_vma=False,
        )(state.weights, state.opt, sb.ids, sb.lengths, d_tokens,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)

    def update_from_dist(self, state, sb_g, d_tokens, learning_rate):
        F, B, L = sb_g.ids.shape

        def upd(w, opt, ids_g, len_g, d_out, lr):
            return self._upd_tokens(w, opt, ids_g, len_g, d_out, lr, L)

        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(), P(),
                      P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # pre-gathered replicated batch + Pallas custom call (above)
            check_vma=False,
        )(state.weights, state.opt, sb_g.ids, sb_g.lengths, d_tokens,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class TwRwSequenceEmbeddingSharding:
    """Hierarchical (host-pinned, rows intra-host) UNPOOLED sharding
    (ref: test_sequence_model_parallel_hierarchical.py exercises
    TABLE_ROW_WISE for sequence models). Same metadata/layout as the
    pooled TWRW strategy; per-token rows replace the pooled reduction:
    intra-host psum_scatter selects each token's owning row, the
    cross-host all_to_all routes feature slots to batch owners."""

    def __new__(cls, env, meta, optim, optim_kwargs=None):
        from torchrec_tpu.parallel.hierarchical_strategies import (
            TwRwEmbeddingSharding,
        )

        class _Impl(TwRwEmbeddingSharding):
            # token-level *_from_dist bodies below REPLACE the inherited
            # pooled ones; input_dist/_acquire_inputs are inherited (and
            # honor input_routing="a2a" — the routed DCN dist now works
            # for the sequence path too)
            supports_input_dist = True

            def _fwd_tok_tail(self, w, l, ids_m, len_m, sr, off, L):
                owner_l = ids_m // sr
                local = ids_m % sr + off
                owned = (owner_l == l) & _token_mask(len_m, L)
                rows = lookup_rows(
                    w[0], local.reshape(-1), impl=self.emb_impl
                ).reshape(*local.shape, w.shape[-1])
                rows = rows * owned.astype(w.dtype)[..., None]
                intra = lax.psum_scatter(
                    rows, AXIS, scatter_dimension=1, tiled=True,
                    axis_index_groups=self.intra_groups,
                )  # [f_max, B/Lc, L, D]
                cross = lax.all_to_all(
                    intra, AXIS, split_axis=1, concat_axis=0,
                    tiled=True, axis_index_groups=self.cross_groups,
                )  # [H*f_max, B/n, L, D]
                return cross[jnp.asarray(self.out_pos)]

            def _upd_tok_tail(self, w, opt, l, d_out, ids_m, len_m, sr,
                              off, lr, L):
                D = self.dim
                slots = jnp.zeros(
                    (self.H * self.f_max, d_out.shape[1], L, D),
                    d_out.dtype,
                ).at[jnp.asarray(self.out_pos)].set(d_out)
                d1 = lax.all_to_all(
                    slots, AXIS, split_axis=0, concat_axis=1,
                    tiled=True, axis_index_groups=self.cross_groups,
                )  # [f_max, B/Lc, L, D]
                d_full = lax.all_gather(
                    d1, AXIS, axis=1, tiled=True,
                    axis_index_groups=self.intra_groups,
                )  # [f_max, B, L, D] staggered (matches ids_m)
                owner_l = ids_m // sr
                local = ids_m % sr + off
                owned = (owner_l == l) & _token_mask(len_m, L)
                new_w, new_opt = apply_fused_update(
                    w[0], self._opt_local(opt),
                    local.reshape(-1), d_full.reshape(-1, D),
                    owned.reshape(-1), lr, **self.optim_kwargs,
                )
                return new_w[None], self._opt_relocal(new_opt)

            def forward(self, state, sb):
                F, B_loc, L = sb.ids.shape
                Lc = self.Lc

                def fwd(w, ids, lengths):
                    my = lax.axis_index(AXIS)
                    h, l = my // Lc, my % Lc
                    ids_m, len_m, _, _, sr, off = self._acquire_inputs(
                        ids, lengths, None, h, False
                    )
                    return self._fwd_tok_tail(
                        w, l, ids_m, len_m, sr, off, L
                    )

                return jax.shard_map(
                    fwd,
                    mesh=self.env.mesh,
                    in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS)),
                    out_specs=P(None, AXIS),
                )(state.weights, sb.ids, sb.lengths)

            def forward_from_dist(self, state, dist):
                ids_r, len_r, _ = dist
                L = ids_r.shape[3]
                Lc = self.Lc

                def fwd(w, ids_rl, len_rl):
                    my = lax.axis_index(AXIS)
                    h, l = my // Lc, my % Lc
                    _, sr, off = self._host_meta(h)
                    return self._fwd_tok_tail(
                        w, l, ids_rl[0], len_rl[0], sr, off, L
                    )

                return jax.shard_map(
                    fwd,
                    mesh=self.env.mesh,
                    in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                    out_specs=P(None, AXIS),
                    # pre-distributed per-device views
                    check_vma=False,
                )(state.weights, ids_r, len_r)

            def update(self, state, sb, d_tokens, learning_rate):
                F, B_loc, L = sb.ids.shape
                Lc = self.Lc

                def upd(w, opt, ids, lengths, d_out, lr):
                    my = lax.axis_index(AXIS)
                    h, l = my // Lc, my % Lc
                    ids_m, len_m, _, _, sr, off = self._acquire_inputs(
                        ids, lengths, None, h, False
                    )
                    return self._upd_tok_tail(
                        w, opt, l, d_out, ids_m, len_m, sr, off, lr, L
                    )

                new_w, new_opt = jax.shard_map(
                    upd,
                    mesh=self.env.mesh,
                    in_specs=(P(AXIS), self._opt_specs(sharded=True),
                              P(None, AXIS), P(None, AXIS), P(None, AXIS),
                              P()),
                    out_specs=(P(AXIS), self._opt_specs(sharded=True)),
                    check_vma=False,  # Pallas custom call opaque to VMA
                )(state.weights, state.opt, sb.ids, sb.lengths, d_tokens,
                  jnp.asarray(learning_rate, jnp.float32))
                return EmbeddingGroupState(weights=new_w, opt=new_opt)

            def update_from_dist(self, state, dist, d_tokens,
                                 learning_rate):
                ids_r, len_r, _ = dist
                L = ids_r.shape[3]
                Lc = self.Lc

                def upd(w, opt, ids_rl, len_rl, d_out, lr):
                    my = lax.axis_index(AXIS)
                    h, l = my // Lc, my % Lc
                    _, sr, off = self._host_meta(h)
                    return self._upd_tok_tail(
                        w, opt, l, d_out, ids_rl[0], len_rl[0], sr, off,
                        lr, L,
                    )

                new_w, new_opt = jax.shard_map(
                    upd,
                    mesh=self.env.mesh,
                    in_specs=(P(AXIS), self._opt_specs(sharded=True),
                              P(AXIS), P(AXIS), P(None, AXIS), P()),
                    out_specs=(P(AXIS), self._opt_specs(sharded=True)),
                    check_vma=False,  # Pallas custom call opaque to VMA
                )(state.weights, state.opt, ids_r, len_r, d_tokens,
                  jnp.asarray(learning_rate, jnp.float32))
                return EmbeddingGroupState(weights=new_w, opt=new_opt)

        return _Impl(env, meta, optim, optim_kwargs)


SEQUENCE_STRATEGY_REGISTRY = {
    ShardingType.DATA_PARALLEL: DpSequenceEmbeddingSharding,
    ShardingType.ROW_WISE: RwSequenceEmbeddingSharding,
    ShardingType.TABLE_WISE: TwSequenceEmbeddingSharding,
    ShardingType.TABLE_ROW_WISE: TwRwSequenceEmbeddingSharding,
}


def create_sequence_sharding_strategy(env, meta, optim, optim_kwargs=None):
    cls = SEQUENCE_STRATEGY_REGISTRY.get(meta.sharding_type)
    if cls is None:
        raise NotImplementedError(
            f"sequence sharding {meta.sharding_type} not implemented "
            f"(reference supports TW/RW/DP for EmbeddingCollection)"
        )
    return cls(env, meta, optim, optim_kwargs)
