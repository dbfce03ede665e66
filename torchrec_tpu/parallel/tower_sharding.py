"""Embedding-tower sharding: an embedding group co-located with its
interaction module on one device.

ref: torchrec/distributed/embedding_tower_sharding.py:100-177,429-833
(`ShardedEmbeddingTower(Collection)`): the reference routes each tower's
sparse features to its owning host (cross-node A2A), runs the tower's
embedding lookup + interaction there (interaction DDP'd intra-host), and
A2As the small interaction outputs back batch-sharded — moving [B, d_out]
across the wire instead of [F, B, D].

TPU re-design (SPMD over one mesh axis):

* Tower -> device placement (the reference's host granularity collapses
  to device granularity on a flat ICI mesh; hierarchical placement can
  combine this with a 2-D mesh later).
* One shard_map program runs on every device; per-device tower sets are
  data (`dev_tower_*[my]` lookups), and heterogeneous interaction modules
  are handled with `lax.switch` over per-tower branches — every branch is
  compiled once, each device executes only the branches of its towers.
* Interaction parameters are replicated; each tower's gradient is nonzero
  only on its owner, and a `psum` makes the (SGD) update identical on all
  replicas — the SPMD equivalent of the reference's intra-host DDP
  (ref :170-177).
* Output: interaction outputs padded to d_out_max, all_to_all'd into the
  batch-sharded layout (ref :297-325 builds the same thing from
  all_gathered dim sums), then sliced/concatenated per tower.

The embedding tables of all towers are stored TW-style: row-concatenated
per owning device into one [n_dev, rows_max, D] array (uniform
embedding_dim across towers is required — reference towers in practice
share dims; raise otherwise).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    PoolingType,
)
from torchrec_tpu.ops.embedding import pooled_lookup
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    FusedOptimizerState,
    apply_fused_update,
    init_fused_optimizer_state,
)
from torchrec_tpu.parallel.strategies import (
    EmbeddingGroupState,
    _pad_rows_tile,
    _pool_coeff,
    _token_mask,
    _uniform_init,
)
from torchrec_tpu.parallel.types import ShardingEnv
from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array
AXIS = ShardingEnv.AXIS


@dataclasses.dataclass
class TowerSpec:
    """One tower: its embedding tables + interaction module + placement.

    interaction: a flax module whose __call__ takes the tower's pooled
    embeddings [B, sum(table dims x features)] and returns [B, d_out]
    (ref: modules/embedding_tower.py:39 couples the same pair).
    """

    tables: Tuple[EmbeddingBagConfig, ...]
    interaction: Any
    device: int
    d_out: int


@struct.dataclass
class TowerCollectionState:
    emb: EmbeddingGroupState
    interaction_params: Tuple[Any, ...]  # one pytree per tower, replicated


class ShardedEmbeddingTowerCollection:
    """ref: ShardedEmbeddingTowerCollection
    (embedding_tower_sharding.py:429)."""

    def __init__(
        self,
        env: ShardingEnv,
        towers: Sequence[TowerSpec],
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
        interaction_lr: Optional[float] = None,
    ):
        self.env = env
        self.towers = list(towers)
        self.optim = optim
        self.optim_kwargs = dict(optim_kwargs or {})
        # device-strategy-only knobs plumbed through fused_params; not
        # apply_fused_update arguments
        self.optim_kwargs.pop("input_routing", None)
        self.emb_impl = self.optim_kwargs.pop("emb_impl", "auto")
        self.interaction_lr = interaction_lr
        n = env.world_size
        dims = {t.embedding_dim for tw in towers for t in tw.tables}
        if len(dims) != 1:
            raise ValueError(
                f"tower tables must share embedding_dim, got {sorted(dims)}"
            )
        self.dim = dims.pop()
        for tw in towers:
            if not (0 <= tw.device < n):
                raise ValueError(f"tower device {tw.device} outside mesh {n}")

        per_dev: List[List[int]] = [[] for _ in range(n)]
        for ti, tw in enumerate(self.towers):
            per_dev[tw.device].append(ti)
        self.per_dev = per_dev
        self.t_max = max((len(ts) for ts in per_dev), default=1) or 1
        self.f_max = max(
            (
                sum(len(t.feature_names) for t in tw.tables)
                for tw in self.towers
            ),
            default=1,
        )
        self.d_out_max = max(tw.d_out for tw in self.towers)

        # canonical feature order = declaration order across towers
        self.features: List[str] = [
            f for tw in self.towers for t in tw.tables for f in t.feature_names
        ]
        feat_pos = {f: i for i, f in enumerate(self.features)}

        # per-device rows layout (TW-style row concat over its towers),
        # ROW_TILE-padded: unaligned packed row counts make XLA give the
        # entry parameter a row-granular layout and materialize two
        # whole-operand layout copies per step (NOTES_r4.md)
        self.rows_max = _pad_rows_tile(max(
            (
                sum(t.num_embeddings for ti in ts for t in self.towers[ti].tables)
                for ts in per_dev
            ),
            default=1,
        ) or 1)

        # slot metadata: [n, t_max, f_max]
        self.slot_feats = np.zeros((n, self.t_max, self.f_max), np.int32)
        self.slot_valid = np.zeros((n, self.t_max, self.f_max), bool)
        self.slot_rowoff = np.zeros((n, self.t_max, self.f_max), np.int32)
        self.slot_mean = np.zeros((n, self.t_max, self.f_max), bool)
        self.slot_tower = np.zeros((n, self.t_max), np.int32)
        self.slot_used = np.zeros((n, self.t_max), bool)
        self.slot_pos = np.zeros((len(self.towers),), np.int32)
        self.table_rowoff: Dict[str, Tuple[int, int]] = {}  # name->(dev, off)
        for d, ts in enumerate(per_dev):
            rowoff = 0
            for s, ti in enumerate(ts):
                tw = self.towers[ti]
                self.slot_tower[d, s] = ti
                self.slot_used[d, s] = True
                self.slot_pos[ti] = d * self.t_max + s
                fslot = 0
                for t in tw.tables:
                    self.table_rowoff[t.name] = (d, rowoff)
                    for f in t.feature_names:
                        self.slot_feats[d, s, fslot] = feat_pos[f]
                        self.slot_valid[d, s, fslot] = True
                        self.slot_rowoff[d, s, fslot] = rowoff
                        self.slot_mean[d, s, fslot] = (
                            getattr(t, "pooling", PoolingType.SUM)
                            is PoolingType.MEAN
                        )
                        fslot += 1
                    rowoff += t.num_embeddings

        self.n = n
        self.total_d_out = sum(tw.d_out for tw in self.towers)
        self._out_offsets = np.concatenate(
            [[0], np.cumsum([tw.d_out for tw in self.towers])]
        ).astype(np.int64)

    # -- state --------------------------------------------------------------

    def _sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.env.mesh, spec)

    def init(self, key: jax.Array, batch_size: int = 2) -> TowerCollectionState:
        dense = {}
        for i, tw in enumerate(self.towers):
            for j, t in enumerate(tw.tables):
                dense[t.name] = np.asarray(
                    _uniform_init(
                        jax.random.fold_in(key, 1000 * i + j),
                        (t.num_embeddings, t.embedding_dim),
                        t.num_embeddings,
                    )
                )
        weights = self.shard_tables_from_dense(dense)
        opt = self._init_opt()
        params = []
        for i, tw in enumerate(self.towers):
            d_in = (
                sum(len(t.feature_names) for t in tw.tables) * self.dim
            )
            dummy = jnp.zeros((batch_size, d_in), jnp.float32)
            p = tw.interaction.init(
                jax.random.fold_in(key, 700_001 + i), dummy
            )["params"]
            params.append(
                jax.device_put(p, self._sharding(P()))
            )
        return TowerCollectionState(
            emb=EmbeddingGroupState(weights=weights, opt=opt),
            interaction_params=tuple(params),
        )

    def _init_opt(self) -> FusedOptimizerState:
        from torchrec_tpu.ops.fused_update import fused_state_shapes

        shd = self._sharding(P(AXIS))

        def make(kind):
            if kind == "row":
                return jax.device_put(
                    jnp.zeros((self.n, self.rows_max)), shd
                )
            if kind == "full":
                return jax.device_put(
                    jnp.zeros((self.n, self.rows_max, self.dim)), shd
                )
            return None

        k1, k2 = fused_state_shapes(self.optim)
        return FusedOptimizerState(
            momentum1=make(k1), momentum2=make(k2),
            step=jnp.zeros((), jnp.int32), optim=self.optim,
        )

    def shard_tables_from_dense(self, dense: Dict[str, np.ndarray]) -> Array:
        arr = np.zeros((self.n, self.rows_max, self.dim), np.float32)
        for i, tw in enumerate(self.towers):
            for t in tw.tables:
                d, off = self.table_rowoff[t.name]
                arr[d, off : off + t.num_embeddings] = np.asarray(
                    dense[t.name]
                )
        return jax.device_put(jnp.asarray(arr), self._sharding(P(AXIS)))

    def unshard_tables_to_dense(self, weights: Array) -> Dict[str, np.ndarray]:
        w = np.asarray(weights)
        out = {}
        for tw in self.towers:
            for t in tw.tables:
                d, off = self.table_rowoff[t.name]
                out[t.name] = w[d, off : off + t.num_embeddings]
        return out

    # DMP state-dict protocol (same surface as ShardedEmbeddingBagCollection)

    def unshard_to_dense(
        self, state: TowerCollectionState
    ) -> Dict[str, np.ndarray]:
        return self.unshard_tables_to_dense(state.emb.weights)

    def load_tables(
        self, state: TowerCollectionState, dense: Dict[str, np.ndarray]
    ) -> TowerCollectionState:
        """Reshard-on-load of (a subset of) table weights; interaction
        params are preserved, fused optimizer state restarts fresh."""
        merged = self.unshard_tables_to_dense(state.emb.weights)
        merged.update(dense)
        return state.replace(
            emb=EmbeddingGroupState(
                weights=self.shard_tables_from_dense(merged),
                opt=self._init_opt(),
            )
        )

    # -- compute ------------------------------------------------------------

    def _slot_pooled(self, w_loc, ids_g, len_g, psw_g, my, s, dtype):
        """Pooled embeddings of slot s on this device: [f_max, B, D]."""
        L = ids_g.shape[-1]
        feats = jnp.asarray(self.slot_feats)[my, s]
        fvalid = jnp.asarray(self.slot_valid)[my, s]
        rowoff = jnp.asarray(self.slot_rowoff)[my, s]
        mean_f = jnp.asarray(self.slot_mean)[my, s]
        ids_m = ids_g[feats] + rowoff[:, None, None]
        len_m = len_g[feats] * fvalid[:, None].astype(len_g.dtype)
        psw_m = None if psw_g is None else psw_g[feats]
        coeff = _token_mask(len_m, L).astype(dtype)
        if psw_m is not None:
            coeff = coeff * psw_m.astype(dtype)
        denom = jnp.maximum(len_m.astype(dtype), 1.0)[:, :, None]
        coeff = jnp.where(mean_f[:, None, None], coeff / denom, coeff)
        pooled = pooled_lookup(
            w_loc, ids_m, coeff, impl=self.emb_impl
        )  # [f_max, B, D]
        return pooled, ids_m, coeff, len_m

    def _interaction_branches(self) -> List[Callable]:
        branches = []
        for ti, tw in enumerate(self.towers):
            F_t = sum(len(t.feature_names) for t in tw.tables)

            def br(pooled_flat, params, _ti=ti, _F=F_t, _tw=tw):
                x = pooled_flat[:, : _F * self.dim]
                out = _tw.interaction.apply({"params": params[_ti]}, x)
                pad = self.d_out_max - _tw.d_out
                if pad:
                    out = jnp.pad(out, ((0, 0), (0, pad)))
                return out

            branches.append(br)
        return branches

    def forward(
        self, state: TowerCollectionState, sb: PaddedSparseBatch
    ) -> Array:
        """-> [B_loc (batch-sharded), sum(tower d_out)] in tower order."""
        has_w = sb.weights is not None
        branches = self._interaction_branches()
        B_total = sb.ids.shape[1]

        def fwd(w, params, ids, lengths, psw):
            my = lax.axis_index(AXIS)
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True)
                if has_w else None
            )
            outs = []
            for s in range(self.t_max):
                pooled, _, _, _ = self._slot_pooled(
                    w[0], ids_g, len_g, psw_g, my, s, w.dtype
                )
                # [f_max, B, D] -> [B, f_max*D]
                pooled_flat = jnp.transpose(pooled, (1, 0, 2)).reshape(
                    B_total, -1
                )
                ti = jnp.asarray(self.slot_tower)[my, s]
                used = jnp.asarray(self.slot_used)[my, s]
                out_s = lax.switch(ti, branches, pooled_flat, params)
                outs.append(out_s * used.astype(out_s.dtype))
            stacked = jnp.stack(outs, axis=0)  # [t_max, B, d_out_max]
            slots = lax.all_to_all(
                stacked, AXIS, split_axis=1, concat_axis=0, tiled=True
            )  # [n*t_max, B_loc, d_out_max]
            parts = [
                slots[int(self.slot_pos[ti])][:, : tw.d_out]
                for ti, tw in enumerate(self.towers)
            ]
            return jnp.concatenate(parts, axis=1)

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(
                P(AXIS),
                P(),  # replicated interaction params
                P(None, AXIS), P(None, AXIS),
                P(None, AXIS) if has_w else P(),
            ),
            out_specs=P(AXIS),
            check_vma=False,
        )(state.emb.weights, state.interaction_params, sb.ids, sb.lengths,
          psw)

    def update(
        self,
        state: TowerCollectionState,
        sb: PaddedSparseBatch,
        d_out: Array,
        learning_rate,
    ) -> TowerCollectionState:
        """One fused step from the output cotangent [B_loc, sum(d_out)].

        Embedding tables: fused sparse optimizer on the owner device.
        Interaction params: SGD with `interaction_lr` (defaults to
        learning_rate), gradient psum'd so replicas stay identical —
        the reference's intra-host DDP allreduce (ref :170-177).
        """
        has_w = sb.weights is not None
        branches = self._interaction_branches()
        L = sb.ids.shape[2]
        B_total = sb.ids.shape[1]
        D = self.dim
        inter_lr = (
            self.interaction_lr
            if self.interaction_lr is not None
            else learning_rate
        )

        def upd(w, opt, params, ids, lengths, psw, d_loc, lr, ilr):
            my = lax.axis_index(AXIS)
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True)
                if has_w else None
            )
            # route cotangent to owners: [B_loc, sum d_out] -> slot layout
            slot_d = jnp.zeros(
                (self.n * self.t_max, d_loc.shape[0], self.d_out_max),
                d_loc.dtype,
            )
            for ti, tw in enumerate(self.towers):
                lo, hi = self._out_offsets[ti], self._out_offsets[ti + 1]
                piece = d_loc[:, lo:hi]
                pad = self.d_out_max - tw.d_out
                if pad:
                    piece = jnp.pad(piece, ((0, 0), (0, pad)))
                slot_d = slot_d.at[int(self.slot_pos[ti])].set(piece)
            d_slots = lax.all_to_all(
                slot_d, AXIS, split_axis=0, concat_axis=1, tiled=True
            )  # [t_max, B, d_out_max]

            all_ids: List[Array] = []
            all_grads: List[Array] = []
            all_valid: List[Array] = []
            d_params = jax.tree.map(jnp.zeros_like, params)
            for s in range(self.t_max):
                pooled, ids_m, coeff, len_m = self._slot_pooled(
                    w[0], ids_g, len_g, psw_g, my, s, w.dtype
                )
                pooled_flat = jnp.transpose(pooled, (1, 0, 2)).reshape(
                    B_total, -1
                )
                ti = jnp.asarray(self.slot_tower)[my, s]
                used = jnp.asarray(self.slot_used)[my, s]

                def f(pf, pr):
                    return lax.switch(ti, branches, pf, pr)

                _, vjp = jax.vjp(f, pooled_flat, params)
                d_pf, d_pr = vjp(d_slots[s] * used.astype(w.dtype))
                d_params = jax.tree.map(jnp.add, d_params, d_pr)
                d_pooled = jnp.transpose(
                    d_pf.reshape(B_total, self.f_max, D), (1, 0, 2)
                )  # [f_max, B, D]
                row_grads = d_pooled[:, :, None, :] * coeff[:, :, :, None]
                all_ids.append(ids_m.reshape(-1))
                all_grads.append(row_grads.reshape(-1, D))
                all_valid.append(_token_mask(len_m, L).reshape(-1))

            opt_loc = FusedOptimizerState(
                momentum1=None if opt.momentum1 is None else opt.momentum1[0],
                momentum2=None if opt.momentum2 is None else opt.momentum2[0],
                step=opt.step, optim=opt.optim,
            )
            new_w, new_opt = apply_fused_update(
                w[0], opt_loc,
                jnp.concatenate(all_ids),
                jnp.concatenate(all_grads),
                jnp.concatenate(all_valid),
                lr, **self.optim_kwargs,
            )
            # interaction: psum grads (only the owner contributed) + SGD
            d_params = lax.psum(d_params, AXIS)
            new_params = jax.tree.map(
                lambda p, gq: p - ilr * gq, params, d_params
            )
            new_opt_out = FusedOptimizerState(
                momentum1=None if new_opt.momentum1 is None
                else new_opt.momentum1[None],
                momentum2=None if new_opt.momentum2 is None
                else new_opt.momentum2[None],
                step=new_opt.step, optim=new_opt.optim,
            )
            return new_w[None], new_opt_out, new_params

        opt_spec = FusedOptimizerState(
            momentum1=None if state.emb.opt.momentum1 is None else P(AXIS),
            momentum2=None if state.emb.opt.momentum2 is None else P(AXIS),
            step=P(), optim=self.optim,
        )
        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        new_w, new_opt, new_params = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(
                P(AXIS), opt_spec, P(),
                P(None, AXIS), P(None, AXIS),
                P(None, AXIS) if has_w else P(),
                P(AXIS), P(), P(),
            ),
            out_specs=(P(AXIS), opt_spec, P()),
            check_vma=False,
        )(state.emb.weights, state.emb.opt, state.interaction_params,
          sb.ids, sb.lengths, psw, d_out,
          jnp.asarray(learning_rate, jnp.float32),
          jnp.asarray(inter_lr, jnp.float32))
        return TowerCollectionState(
            emb=EmbeddingGroupState(weights=new_w, opt=new_opt),
            interaction_params=new_params,
        )


class ShardedEmbeddingTower(ShardedEmbeddingTowerCollection):
    """Single sharded tower (ref: ShardedEmbeddingTower,
    embedding_tower_sharding.py:100) — the one-tower special case of the
    collection; forward returns the tower's [B, d_out] directly."""

    def __init__(
        self,
        env: ShardingEnv,
        tower: TowerSpec,
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
        interaction_lr: Optional[float] = None,
    ):
        super().__init__(
            env, [tower], optim=optim, optim_kwargs=optim_kwargs,
            interaction_lr=interaction_lr,
        )
