"""Sharding strategies: DP / TW / RW / CW as shard_map collective programs.

ref: torchrec/distributed/sharding/{dp,tw,rw,cw}_sharding.py — but this is a
TPU-first re-design, NOT a port of the bucketize+all_to_all machinery:

* The reference redistributes sparse ids with a two-phase jagged all_to_all
  (lengths first, then values; ref dist_data.py:276-411) because each rank
  may receive a different number of ids. With the static padded [F, B, L]
  layout we instead ALL-GATHER the ids over the "dev" axis — ids are int32
  and tiny next to D-dim embedding rows, ICI all-gather is cheap, and every
  shape stays static. Each device then looks up only the rows/features it
  owns and the *output* collective carries the minimal traffic:

    ROW_WISE:    all_gather(ids) -> masked local lookup (partial sums)
                 -> psum_scatter over batch        (ref rw_sharding.py:314)
    TABLE_WISE:  all_gather(ids) -> own-features lookup
                 -> all_to_all batch<->feature     (ref tw_sharding.py:272)
    COLUMN_WISE: all_gather(ids) -> all-rows lookup on the local col shard
                 -> all_to_all batch<->columns     (ref cw_sharding.py:216)
    DATA_PARALLEL: local lookup, no collective     (ref dp_sharding.py:148)

* The backward issues the mirror collectives explicitly (all_gather of the
  pooled-output cotangent) and applies the FUSED sparse optimizer update to
  local shards only — the equivalent of FBGEMM's optimizer-in-backward
  (ref batched_embedding_kernel.py:604-647), with no dense [R, D] gradient
  ever materialized.

* Storage layout is unified: sharded groups hold [n_dev, rows_loc, cols_loc]
  with PartitionSpec("dev") on axis 0 (local view [1, rows_loc, cols_loc]
  inside shard_map); DATA_PARALLEL holds a replicated [rows, D]. Row counts
  are padded so every device's shard has identical (static) shape — the
  price of XLA's uniformity, bounded by n_dev-1 pad rows per table.
"""

from __future__ import annotations

import dataclasses
import logging
import warnings
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from torchrec_tpu.ops.embedding import (
    PoolingMode,
    pooled_lookup,
)
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    FusedOptimizerState,
    apply_fused_update,
)
from torchrec_tpu.parallel.embedding_sharding import GroupMeta
from torchrec_tpu.parallel.types import ShardingEnv, ShardingType
from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array
AXIS = ShardingEnv.AXIS
logger = logging.getLogger(__name__)


@struct.dataclass
class EmbeddingGroupState:
    """Sharded weights + fused optimizer state of one group."""

    weights: Array
    opt: FusedOptimizerState


def _uniform_init(key, shape, rows):
    bound = (1.0 / rows) ** 0.5
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# Packed group operands pad their per-device row count to this tile.
# WHY (measured on v5e, r4): XLA's entry-layout assignment gives a big
# [n, rows, D] parameter the row-granular {.., T(1,128)} layout while the
# in-step gather/scatter run in the standard T(8,128) tiling. The two
# layouts are BYTE-IDENTICAL when rows is a multiple of the sublane tile
# (8 f32 / 16 bf16 / 32 int8) — the "conversions" are free bitcasts — but
# at an unaligned row count XLA materializes two whole-operand copies per
# step (2 x 5 ms at the 1.52 GiB pod-shard operand: copy.49 +
# copy_bitcast_fusion in tools/trace_pod_r4.py; reproduced offline by
# tools/hlo_step_r4.py, where +7 pad rows removed both). 128 covers every
# dtype's sublane tile and keeps 1-D rowwise-momentum views whole-lane;
# the slack (< 128 rows) is unaddressable by construction, exactly like
# the existing per-shard pad rows.
ROW_TILE = 128


def _pad_rows_tile(rows: int) -> int:
    return -(-int(rows) // ROW_TILE) * ROW_TILE


def _mom_layout_share(entries, total_rows: int):
    """Worst-momentum-block expected load share for a packed layout.

    entries: [(row_offset, rows, frac_of_uid_slots)] per table in THIS
    device's packed operand; see ops/cost_model.mom_max_block_share.
    Returned value is passed statically into apply_fused_update so the
    rowwise streaming-momentum dispatch can see layout skew
    (heterogeneous tiny-table groups overflow the uniform-sized window
    every step and pay kernel + fallback — measured at the pod-shard
    mix, NOTES_r4.md).
    """
    fracs = _mom_layout_fracs(entries, total_rows)
    return max(fracs) if fracs else None


def _merge_dev_fracs(per_dev_fracs):
    """Elementwise max of per-device block-frac tuples: SPMD compiles
    ONE program, so the static skip/window choice must cover the worst
    device at every block."""
    per_dev_fracs = [f for f in per_dev_fracs if f]
    if not per_dev_fracs:
        return ()
    nb = max(len(f) for f in per_dev_fracs)
    padded = [tuple(f) + (0.0,) * (nb - len(f)) for f in per_dev_fracs]
    return tuple(max(col) for col in zip(*padded))


def _mom_layout_fracs(entries, total_rows: int):
    """Per-block load-fraction tuple for a packed layout (see
    _mom_layout_share); () when the layout carries no ids."""
    from torchrec_tpu.ops.cost_model import mom_block_fracs

    entries = [(o, r, f) for (o, r, f) in entries if r > 0 and f > 0]
    if not entries:
        return ()
    offs, rows, fr = zip(*entries)
    return mom_block_fracs(offs, rows, fr, total_rows)


def _uniq_entries(rows_fracs):
    """Static (rows_t, slot_frac_t) tuple for ops/cost_model.
    unique_slot_cap — slot_frac is the DETERMINISTIC fraction of update
    slots carrying table t's ids (feature count over slot count), not
    the expected per-device load `_mom_layout_fracs` uses."""
    return tuple(
        (int(r), float(f)) for (r, f) in rows_fracs if r > 0 and f > 0
    )


def _pad_tail(arr, total_rows: int, axis: int = 0):
    """Zero-pad `arr` along `axis` up to `total_rows` (ROW_TILE slack).

    Keeps the input's array kind (numpy stays numpy, jax stays jax).
    """
    tail = total_rows - arr.shape[axis]
    if not tail:
        return arr
    shape = arr.shape[:axis] + (tail,) + arr.shape[axis + 1 :]
    xp = np if isinstance(arr, np.ndarray) else jnp
    return xp.concatenate([arr, xp.zeros(shape, arr.dtype)], axis=axis)


class BaseEmbeddingShardingStrategy:
    """One table-group sharded one way on one mesh."""

    def __init__(
        self,
        env: ShardingEnv,
        meta: GroupMeta,
        optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs: Optional[dict] = None,
    ):
        self.env = env
        self.meta = meta
        self.optim = optim
        self.optim_kwargs = dict(optim_kwargs or {})
        # input id redistribution: "allgather" (default; ids are tiny over
        # ICI) or "a2a" (hierarchical strategies route each host only its
        # own features' ids over DCN — the scaling cure when the host
        # count grows; see NOTES_r2.md cost model and ref
        # dist_data.py:40-567 two-phase targeted exchange)
        self.input_routing = self.optim_kwargs.pop(
            "input_routing", "allgather"
        )
        # lookup kernel implementation ("auto" | "xla" | "pallas") — a
        # documented fused_params key (TORCHREC_TPU_EMB_IMPL env
        # overrides, ops/embedding._use_pallas)
        self.emb_impl = self.optim_kwargs.pop("emb_impl", "auto")
        if self.input_routing != "allgather" and not hasattr(
            self, "_route_inputs"
        ):
            warnings.warn(
                f"input_routing={self.input_routing!r} requested but "
                f"{type(self).__name__} has no routed input dist — flat "
                "strategies always all_gather ids; only hierarchical "
                "strategies (TWRW/TWCW and their sequence variants) "
                "implement a2a routing. Falling back to allgather.",
                stacklevel=2,
            )
            self.input_routing = "allgather"
        self.n = env.world_size
        self.dim = meta.dim
        # table storage dtype (fp32/fp16/bf16); optimizer state and pooled
        # outputs stay fp32 (ref: fbgemm weights_precision fused_param)
        from torchrec_tpu.modules.embedding_configs import (
            data_type_to_jnp_dtype,
        )

        self.w_dtype = data_type_to_jnp_dtype(meta.data_type)
        self._build()

    # -- layout ------------------------------------------------------------

    def _build(self) -> None:
        raise NotImplementedError

    def weights_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def weights_pspec(self) -> P:
        return P(AXIS)

    def _sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.env.mesh, spec)

    def init_weights(self, key: jax.Array) -> Array:
        """Init each table with its own uniform bound, then shard.

        Init + packing run INSIDE one jitted program whose output is
        already sharded, so XLA materializes each device's SHARD only —
        no host staging of full tables (at the 97 GiB MLPerf scale,
        host-side init would OOM one machine; the reference reaches the
        same property via meta-device init + per-shard reset,
        model_parallel.py:343-364). Also makes DMP.init fully traceable
        (jax.eval_shape) for AOT analysis tooling."""

        def build(k):
            dense = {
                t.name: _uniform_init(
                    jax.random.fold_in(k, i), (t.rows, t.dim), t.rows
                )
                for i, t in enumerate(self.meta.tables)
            }
            return self._pack_dense(dense)

        return jax.jit(
            build, out_shardings=self._sharding(self.weights_pspec())
        )(key)

    def init_opt(self) -> FusedOptimizerState:
        from torchrec_tpu.ops.fused_update import fused_state_shapes

        wshape = self.weights_shape()
        rep = self._sharding(P())
        shd = self._sharding(self.weights_pspec())
        is_dp = len(wshape) == 2
        put = rep if is_dp else shd

        def make(kind):
            if kind == "row":
                return jax.device_put(jnp.zeros(wshape[:-1]), put)
            if kind == "full":
                return jax.device_put(jnp.zeros(wshape), put)
            return None

        k1, k2 = fused_state_shapes(self.optim)
        return FusedOptimizerState(
            momentum1=make(k1),
            momentum2=make(k2),
            step=jnp.zeros((), jnp.int32),
            optim=self.optim,
        )

    def init_state(self, key: jax.Array) -> EmbeddingGroupState:
        return EmbeddingGroupState(
            weights=self.init_weights(key), opt=self.init_opt()
        )

    def _pack_dense(self, dense: Dict[str, Array], dtype=None) -> Array:
        """Traceable (pure-jnp) packing of per-table [R_t, D] arrays into
        this strategy's weights layout. Consumed by init_weights (traced,
        sharded out) and shard_from_dense (host arrays)."""
        raise NotImplementedError

    def shard_from_dense(
        self, dense: Dict[str, np.ndarray], dtype=None
    ) -> Array:
        """Sharded array from unsharded per-table arrays (checkpoint
        load / golden tests — the full tables already exist on host).
        `dtype` defaults to the table storage dtype; pass jnp.float32
        when sharding optimizer state (momentum never lives in bf16)."""
        return jax.jit(
            partial(self._pack_dense, dtype=dtype),
            out_shardings=self._sharding(self.weights_pspec()),
        )(dense)

    def unshard_to_dense(self, weights: Array) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    # -- optimizer-state reshard (canonical row space) ---------------------
    # ref: fused momenta are exposed as row-wise ShardedTensors reassembled
    # by table FQN so checkpoints reload under a different plan
    # (batched_embedding_kernel.py:71-118,204-246). Canonical forms here:
    #   "full"  momentum -> [R, D] per table (exact under ANY plan change)
    #   "row"   momentum -> [R] per table
    #   "cwrow" momentum -> [S, R]: column-sharded strategies keep one
    #           rowwise state per column shard (virtual-table semantics);
    #           S slices in column order (the ref concatenates these into
    #           one [S*R] row-wise ShardedTensor, same information).

    def rowwise_shards(self) -> int:
        """Column shards carrying independent rowwise momentum (1 = plain
        row space)."""
        return 1

    def unshard_rowwise(self, m: np.ndarray) -> Dict[str, np.ndarray]:
        """Canonical per-table view of a rowwise momentum array shaped
        weights_shape()[:-1]: [R], or [S, R] when rowwise_shards() > 1."""
        raise NotImplementedError

    def shard_rowwise(self, per_table: Dict[str, np.ndarray]) -> Array:
        """Inverse of unshard_rowwise: plan-shaped rowwise momentum array."""
        raise NotImplementedError

    def unshard_opt_to_tables(
        self, opt: "FusedOptimizerState"
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Canonical per-table optimizer state:
        {table: {"m1__row"|"m1__cwrow"|"m1__full": arr, ..., "step": s}}."""
        from torchrec_tpu.ops.fused_update import fused_state_shapes

        k1, k2 = fused_state_shapes(self.optim)
        out: Dict[str, Dict[str, np.ndarray]] = {
            t.name: {} for t in self.meta.tables
        }
        step = np.asarray(opt.step, np.int32)
        for kind, m, tag in ((k1, opt.momentum1, "m1"), (k2, opt.momentum2, "m2")):
            if kind == "none" or m is None:
                continue
            if kind == "full":
                per = self.unshard_to_dense(np.asarray(m))
                label = "full"
            else:
                per = self.unshard_rowwise(np.asarray(m))
                label = "row" if self.rowwise_shards() == 1 else "cwrow"
            for tname, arr in per.items():
                out[tname][f"{tag}__{label}"] = np.asarray(arr, np.float32)
        for tname in out:
            out[tname]["step"] = step
        return out

    @staticmethod
    def _convert_rowspace(arr: np.ndarray, s_target: int) -> np.ndarray:
        """Remap canonical rowwise momentum between plain row space and
        column-shard row space. The rowwise accumulator is mean(g²) over
        the shard's LOCAL columns (fused_update.py g_sq), and column
        shards are always equal-width (CW/TWCW enforce divisibility), so:
        exact when shard counts match; exact collapsing [S,R] -> [R] via
        the shard MEAN (the average of per-shard local-column means IS
        the full-row mean accumulator); approximate expanding
        [R] -> [S,R] by replication (per-column-shard history is not
        recoverable — each shard starts from the unbiased full-row mean;
        a logged warning fires). Output rank always matches the target:
        1-D for plain row space, 2-D [s_target, R] otherwise (a
        one-column-shard plan saves [1, R], which must flatten for
        row-space targets)."""
        arr = np.asarray(arr)
        if arr.ndim == 2 and arr.shape[0] == s_target and s_target > 1:
            return arr
        src_s = arr.shape[0] if arr.ndim == 2 else 1
        if arr.ndim == 2:
            arr = arr.mean(axis=0)
        if s_target == 1:
            return arr
        warnings.warn(
            f"Restoring rowwise optimizer state into a plan with "
            f"{s_target} column shards (checkpoint had {src_s}): "
            "per-column-shard accumulator history is not recoverable — "
            "each shard resumes from the full-row mean accumulator "
            "(unbiased, but not bit-identical to uninterrupted training).",
            stacklevel=2,
        )
        return np.tile(arr, (s_target, 1))

    def shard_opt_from_tables(
        self,
        per_table: Dict[str, Dict[str, np.ndarray]],
        template_opt: "FusedOptimizerState",
    ) -> Optional["FusedOptimizerState"]:
        """Plan-shaped optimizer state from canonical per-table arrays.
        Returns None (caller keeps fresh state, warning logged with the
        offending table/tag) when the stored momentum kinds don't match
        the current optimizer or any table is missing."""
        from torchrec_tpu.ops.fused_update import fused_state_shapes

        def _restart(table, tag, why):
            logger.warning(
                "Fused momentum restart for group %s: table %r tag %r %s "
                "— ALL momentum in this group resumes fresh.",
                [t.name for t in self.meta.tables], table, tag, why,
            )
            return None

        kinds = fused_state_shapes(self.optim)
        new_m = []
        for kind, tag in zip(kinds, ("m1", "m2")):
            if kind == "none":
                new_m.append(None)
                continue
            gathered: Dict[str, np.ndarray] = {}
            for t in self.meta.tables:
                entry = per_table.get(t.name, {})
                if kind == "full":
                    arr = entry.get(f"{tag}__full")
                    if arr is None:
                        return _restart(t.name, f"{tag}__full", "missing")
                    if arr.shape != (t.rows, t.dim):
                        return _restart(
                            t.name, f"{tag}__full",
                            f"shape {arr.shape} != {(t.rows, t.dim)}",
                        )
                else:
                    arr = entry.get(f"{tag}__row")
                    if arr is None:
                        arr = entry.get(f"{tag}__cwrow")
                    if arr is None:
                        return _restart(
                            t.name, f"{tag}__row|__cwrow", "missing"
                        )
                    if arr.shape[-1] != t.rows:
                        return _restart(
                            t.name, tag,
                            f"row count {arr.shape[-1]} != {t.rows}",
                        )
                    arr = self._convert_rowspace(arr, self.rowwise_shards())
                gathered[t.name] = np.asarray(arr, np.float32)
            if kind == "full":
                new_m.append(self.shard_from_dense(gathered, dtype=jnp.float32))
            else:
                new_m.append(self.shard_rowwise(gathered))
        steps = [
            int(per_table[t.name]["step"])
            for t in self.meta.tables
            if "step" in per_table.get(t.name, {})
        ]
        if len(steps) != len(self.meta.tables):
            return _restart(
                [t.name for t in self.meta.tables
                 if "step" not in per_table.get(t.name, {})],
                "step", "missing",
            )
        return FusedOptimizerState(
            momentum1=new_m[0],
            momentum2=new_m[1],
            step=jnp.asarray(max(steps), jnp.int32),
            optim=self.optim,
        )

    # -- compute -----------------------------------------------------------

    def forward(self, state: EmbeddingGroupState, sb: PaddedSparseBatch) -> Array:
        """Global batch-sharded pooled output [F, B, D]."""
        raise NotImplementedError

    def update(
        self,
        state: EmbeddingGroupState,
        sb: PaddedSparseBatch,
        d_pooled: Array,
        learning_rate,
    ) -> EmbeddingGroupState:
        raise NotImplementedError

    # -- shared kernel pieces ---------------------------------------------

    def _opt_specs(self, sharded: bool) -> FusedOptimizerState:
        """Spec pytree matching FusedOptimizerState structure."""
        from torchrec_tpu.ops.fused_update import fused_state_shapes

        spec = P(AXIS) if sharded else P()
        k1, k2 = fused_state_shapes(self.optim)
        return FusedOptimizerState(
            momentum1=None if k1 == "none" else spec,
            momentum2=None if k2 == "none" else spec,
            step=P(),
            optim=self.optim,
        )

    def _opt_local(self, opt: FusedOptimizerState) -> FusedOptimizerState:
        """Strip the leading device axis from local optimizer views."""
        return FusedOptimizerState(
            momentum1=None if opt.momentum1 is None else opt.momentum1[0],
            momentum2=None if opt.momentum2 is None else opt.momentum2[0],
            step=opt.step,
            optim=opt.optim,
        )

    def _opt_relocal(
        self, new: FusedOptimizerState
    ) -> FusedOptimizerState:
        return FusedOptimizerState(
            momentum1=None if new.momentum1 is None else new.momentum1[None],
            momentum2=None if new.momentum2 is None else new.momentum2[None],
            step=new.step,
            optim=new.optim,
        )

    # -- cross-batch input-dist prefetch ------------------------------------
    #
    # The id all_gather is the only collective of the step that depends
    # on NOTHING but the batch, so batch i+1's gather can be fused into
    # batch i's program with no data dependency — XLA then overlaps the
    # collective with batch i's dense compute. This is the TPU analogue of
    # the reference's pre-issued sparse input dist
    # (ref: train_pipeline.py:422-536, TrainPipelineSparseDist stage 2).
    # Strategies with supports_input_dist=True implement
    # forward_from_dist / update_from_dist consuming the pre-gathered
    # global-batch PaddedSparseBatch that input_dist() returns.

    supports_input_dist: bool = False

    def input_dist(self, sb: PaddedSparseBatch) -> PaddedSparseBatch:
        """All_gather ids/lengths/per-sample-weights over the batch axis,
        returning a REPLICATED global-batch PaddedSparseBatch (the
        prefetchable, parameter-independent part of forward+update)."""
        has_w = sb.weights is not None

        def dist(ids, lengths, psw):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True)
                if has_w
                else psw
            )
            return ids_g, len_g, psw_g

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        ids_g, len_g, psw_g = jax.shard_map(
            dist,
            mesh=self.env.mesh,
            in_specs=(P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=(P(), P(), P()),
            # a full-axis tiled all_gather is replicated by construction;
            # the static VMA check cannot prove that
            check_vma=False,
        )(sb.ids, sb.lengths, psw)
        return PaddedSparseBatch(
            ids=ids_g,
            lengths=len_g,
            keys=sb.keys,
            weights=psw_g if has_w else None,
        )

    def forward_from_dist(
        self, state: EmbeddingGroupState, sb_g: PaddedSparseBatch
    ) -> Array:
        """forward() consuming a pre-gathered batch from input_dist()."""
        raise NotImplementedError

    def update_from_dist(
        self,
        state: EmbeddingGroupState,
        sb_g: PaddedSparseBatch,
        d_pooled: Array,
        learning_rate,
    ) -> EmbeddingGroupState:
        """update() consuming a pre-gathered batch from input_dist()."""
        raise NotImplementedError


def _token_mask(lengths: Array, L: int) -> Array:
    """[..., L] bool validity mask from [...]-shaped lengths."""
    return jnp.arange(L)[None, None, :] < lengths[:, :, None]


def _pool_coeff(
    lengths: Array,
    L: int,
    mean_flags: np.ndarray,
    psw: Optional[Array],
    dtype,
) -> Array:
    """[F, B, L] pooling coefficient: mask * sample_weight / (len if MEAN)."""
    coeff = _token_mask(lengths, L).astype(dtype)
    if psw is not None:
        coeff = coeff * psw.astype(dtype)
    mean = jnp.asarray(mean_flags)[:, None, None]
    denom = jnp.maximum(lengths.astype(dtype), 1.0)[:, :, None]
    return jnp.where(mean, coeff / denom, coeff)


class DpEmbeddingSharding(BaseEmbeddingShardingStrategy):
    """Replicated tables, no dists (ref: dp_sharding.py:148-192).

    Gradient sync (the reference's DDP allreduce) is an all_gather of the
    per-device (ids, row-grad) lists followed by an identical fused update
    on every replica — stays sparse, deterministic, replicas in lockstep.
    """

    def _build(self) -> None:
        self.row_offsets = np.zeros((len(self.meta.tables),), np.int32)
        acc = 0
        for i, t in enumerate(self.meta.tables):
            self.row_offsets[i] = acc
            acc += t.rows
        self.total_rows = _pad_rows_tile(acc)
        ft = self.meta.feature_table
        self.feat_row_off = self.row_offsets[ft]  # [F]
        # uids = every feature's gathered slots: frac_t = feats_t / F
        F = max(len(ft), 1)
        cnt = np.bincount(ft, minlength=len(self.meta.tables))
        self.mom_fracs = _mom_layout_fracs(
            [
                (int(self.row_offsets[i]), t.rows, cnt[i] / F)
                for i, t in enumerate(self.meta.tables)
            ],
            self.total_rows,
        )
        self.mom_share = max(self.mom_fracs) if self.mom_fracs else None
        self.uniq_entries = (_uniq_entries(
            (t.rows, cnt[i] / F) for i, t in enumerate(self.meta.tables)
        ),)

    def weights_shape(self):
        return (self.total_rows, self.dim)

    def weights_pspec(self) -> P:
        return P()

    def _pack_dense(self, dense, dtype=None):
        arr = jnp.concatenate(
            [jnp.asarray(dense[t.name]) for t in self.meta.tables], axis=0
        )
        arr = _pad_tail(arr, self.total_rows)  # ROW_TILE alignment slack
        return arr.astype(dtype or self.w_dtype)

    def unshard_to_dense(self, weights):
        w = np.asarray(weights)
        out = {}
        for off, t in zip(self.row_offsets, self.meta.tables):
            out[t.name] = w[off : off + t.rows]
        return out

    def unshard_rowwise(self, m):
        out = {}
        for off, t in zip(self.row_offsets, self.meta.tables):
            out[t.name] = m[off : off + t.rows]
        return out

    def shard_rowwise(self, per_table):
        arr = np.concatenate(
            [np.asarray(per_table[t.name], np.float32)
             for t in self.meta.tables]
        )
        arr = _pad_tail(arr, self.total_rows)
        return jax.device_put(jnp.asarray(arr), self._sharding(P()))

    def _local_ids(self, sb: PaddedSparseBatch):
        return sb.ids + jnp.asarray(self.feat_row_off)[:, None, None]

    def forward(self, state, sb):
        F, B, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def fwd(w, ids, lengths, psw):
            gids = ids + jnp.asarray(self.feat_row_off)[:, None, None]
            coeff = _pool_coeff(
                lengths, L, self.meta.feature_pooling_mean,
                psw if has_w else None, w.dtype,
            )
            return pooled_lookup(w, gids, coeff, impl=self.emb_impl)

        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths,
          sb.weights if has_w else jnp.zeros((), sb.ids.dtype))

    def update(self, state, sb, d_pooled, learning_rate):
        F, B, L = sb.ids.shape
        mesh = self.env.mesh
        D = self.dim
        has_w = sb.weights is not None

        def upd(w, opt, ids, lengths, psw, d_out, lr):
            gids = ids + jnp.asarray(self.feat_row_off)[:, None, None]
            coeff = _pool_coeff(
                lengths, L, self.meta.feature_pooling_mean,
                psw if has_w else None, w.dtype,
            )
            row_grads = d_out[:, :, None, :] * coeff[:, :, :, None]
            valid = _token_mask(lengths, L)
            # gradient sync: gather every replica's sparse contribution
            ids_all = lax.all_gather(gids.reshape(-1), AXIS, tiled=True)
            grads_all = lax.all_gather(
                row_grads.reshape(-1, D), AXIS, tiled=True
            )
            valid_all = lax.all_gather(valid.reshape(-1), AXIS, tiled=True)
            new_w, new_opt = apply_fused_update(
                w, opt, ids_all, grads_all, valid_all, lr,
                mom_block_fracs=self.mom_fracs,
                unique_entries=self.uniq_entries,
                **self.optim_kwargs,
            )
            return new_w, new_opt

        psw = sb.weights if sb.weights is not None else jnp.zeros((), sb.ids.dtype)
        psw_spec = P(None, AXIS) if sb.weights is not None else P()
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
            in_specs=(P(), self._opt_specs(sharded=False), P(None, AXIS),
                      P(None, AXIS), psw_spec, P(None, AXIS), P()),
            out_specs=(P(), self._opt_specs(sharded=False)),
            # every replica computes the identical update from the same
            # all_gathered (ids, grads) — replicated by construction, which
            # the static VMA check cannot prove
            check_vma=False,
        )(state.weights, state.opt, sb.ids, sb.lengths, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class RwEmbeddingSharding(BaseEmbeddingShardingStrategy):
    """Row-wise: each table's rows split into n contiguous blocks
    (ref: rw_sharding.py:193-341). Input = all_gather(ids); compute =
    masked local lookup of owned rows (partial sums); output =
    psum_scatter over the batch axis (the reference's reduce-scatter).

    Unlike the reference's ceil-blocks ([3,3,3,1] for 10 rows / 4 ranks,
    ref planner/enumerators.py:277-311), blocks here are padded-even
    (shard_rows = ceil(R/n), last block padded) so shard shapes are
    uniform — pad rows are unaddressable by construction.
    """

    def _build(self) -> None:
        n = self.n
        self.shard_rows = np.asarray(
            [_cdiv(t.rows, n) for t in self.meta.tables], np.int32
        )
        self.local_offsets = np.zeros((len(self.meta.tables),), np.int32)
        acc = 0
        for i, sr in enumerate(self.shard_rows):
            self.local_offsets[i] = acc
            acc += int(sr)
        self.rows_loc = _pad_rows_tile(acc)
        ft = self.meta.feature_table
        self.feat_shard_rows = self.shard_rows[ft]
        self.feat_local_off = self.local_offsets[ft]
        # uids = ALL gathered slots [F, n*B, L]; ~1/n of each table's ids
        # land on this device: frac_t = feats_t / (F * n)
        F = max(len(ft), 1)
        cnt = np.bincount(ft, minlength=len(self.meta.tables))
        self.mom_fracs = _mom_layout_fracs(
            [
                (int(self.local_offsets[i]), int(self.shard_rows[i]),
                 cnt[i] / (F * n))
                for i in range(len(self.meta.tables))
            ],
            self.rows_loc,
        )
        self.mom_share = max(self.mom_fracs) if self.mom_fracs else None
        # slot fracs: the gathered list holds ALL of table t's global
        # slots (cnt/F of N), while only shard_rows of it live here
        self.uniq_entries = (_uniq_entries(
            (int(self.shard_rows[i]), cnt[i] / F)
            for i in range(len(self.meta.tables))
        ),)

    def weights_shape(self):
        return (self.n, self.rows_loc, self.dim)

    def _pack_dense(self, dense, dtype=None):
        n = self.n
        parts = []
        for sr, t in zip(self.shard_rows, self.meta.tables):
            w = jnp.asarray(dense[t.name])
            pad = int(sr) * n - t.rows
            if pad:
                w = jnp.concatenate(
                    [w, jnp.zeros((pad,) + w.shape[1:], w.dtype)], axis=0
                )
            parts.append(w.reshape(n, int(sr), *w.shape[1:]))
        arr = jnp.concatenate(parts, axis=1)  # [n, sum(shard_rows), D]
        arr = _pad_tail(arr, self.rows_loc, axis=1)  # ROW_TILE slack
        return arr.astype(dtype or self.w_dtype)

    def unshard_to_dense(self, weights):
        w = np.asarray(weights)  # [n, rows_loc, D]
        out = {}
        for sr, off, t in zip(
            self.shard_rows, self.local_offsets, self.meta.tables
        ):
            tbl = w[:, off : off + int(sr), :].reshape(-1, t.dim)
            out[t.name] = tbl[: t.rows]
        return out

    def unshard_rowwise(self, m):
        out = {}
        for sr, off, t in zip(
            self.shard_rows, self.local_offsets, self.meta.tables
        ):
            out[t.name] = m[:, off : off + int(sr)].reshape(-1)[: t.rows]
        return out

    def shard_rowwise(self, per_table):
        n = self.n
        parts = []
        for sr, t in zip(self.shard_rows, self.meta.tables):
            v = np.asarray(per_table[t.name], np.float32)
            pad = int(sr) * n - t.rows
            if pad:
                v = np.concatenate([v, np.zeros((pad,), v.dtype)])
            parts.append(v.reshape(n, int(sr)))
        arr = np.concatenate(parts, axis=1)  # [n, sum(shard_rows)]
        arr = _pad_tail(arr, self.rows_loc, axis=1)
        return jax.device_put(jnp.asarray(arr), self._sharding(P(AXIS)))

    def _route(self, ids_g: Array, lengths_g: Array, my: Array, L: int):
        """owner/local-row routing for gathered ids."""
        sr = jnp.asarray(self.feat_shard_rows)[:, None, None]
        off = jnp.asarray(self.feat_local_off)[:, None, None]
        owner = ids_g // sr
        local = ids_g % sr + off
        owned = (owner == my) & _token_mask(lengths_g, L)
        return local, owned

    supports_input_dist = True

    def _fwd_gathered(self, w, ids_g, len_g, psw_g, L):
        """Per-device forward body on pre-gathered global-batch inputs."""
        my = lax.axis_index(AXIS)
        local, owned = self._route(ids_g, len_g, my, L)
        coeff = _pool_coeff(
            len_g, L, self.meta.feature_pooling_mean, psw_g, w.dtype
        )
        coeff = coeff * owned.astype(w.dtype)
        partial = pooled_lookup(w[0], local, coeff, impl=self.emb_impl)
        return lax.psum_scatter(
            partial, AXIS, scatter_dimension=1, tiled=True
        )

    def _upd_gathered(self, w, opt, ids_g, len_g, psw_g, d_g, lr, L):
        """Per-device update body on pre-gathered global-batch inputs
        (d_g is the already-gathered [F, B, D] cotangent)."""
        my = lax.axis_index(AXIS)
        local, owned = self._route(ids_g, len_g, my, L)
        coeff = _pool_coeff(
            len_g, L, self.meta.feature_pooling_mean, psw_g, w.dtype
        )
        row_grads = d_g[:, :, None, :] * coeff[:, :, :, None]
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            local.reshape(-1), row_grads.reshape(-1, self.dim),
            owned.reshape(-1), lr,
            mom_block_fracs=self.mom_fracs,
            unique_entries=self.uniq_entries, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def fwd(w, ids, lengths, psw):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
            )
            return self._fwd_gathered(w, ids_g, len_g, psw_g, L)

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths, psw)

    def forward_from_dist(self, state, sb_g):
        F, B, L = sb_g.ids.shape
        has_w = sb_g.weights is not None

        def fwd(w, ids_g, len_g, psw_g):
            return self._fwd_gathered(
                w, ids_g, len_g, psw_g if has_w else None, L
            )

        psw = sb_g.weights if has_w else jnp.zeros((), sb_g.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(), P(), P()),
            out_specs=P(None, AXIS),
            # batch inputs are replicated (pre-gathered); mixing them with
            # the device-varying shard trips the static VMA check
            check_vma=False,
        )(state.weights, sb_g.ids, sb_g.lengths, psw)

    def update(self, state, sb, d_pooled, learning_rate):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def upd(w, opt, ids, lengths, psw, d_out, lr):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
            )
            d_g = lax.all_gather(d_out, AXIS, axis=1, tiled=True)  # [F,B,D]
            return self._upd_gathered(
                w, opt, ids_g, len_g, psw_g, d_g, lr, L
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        psw_spec = P(None, AXIS) if has_w else P()
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
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

    def update_from_dist(self, state, sb_g, d_pooled, learning_rate):
        F, B, L = sb_g.ids.shape
        has_w = sb_g.weights is not None

        def upd(w, opt, ids_g, len_g, psw_g, d_out, lr):
            # the cotangent depends on the loss — its gather stays in-step
            d_g = lax.all_gather(d_out, AXIS, axis=1, tiled=True)
            return self._upd_gathered(
                w, opt, ids_g, len_g, psw_g if has_w else None, d_g, lr, L
            )

        psw = sb_g.weights if has_w else jnp.zeros((), sb_g.ids.dtype)
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(), P(), P(),
                      P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # pre-gathered replicated inputs + Pallas custom call (above)
            check_vma=False,
        )(state.weights, state.opt, sb_g.ids, sb_g.lengths, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class TwEmbeddingSharding(BaseEmbeddingShardingStrategy):
    """Table-wise: whole tables placed on single devices
    (ref: tw_sharding.py:91-131,224-309). Input = all_gather(ids) then each
    device selects its own features; output = all_to_all turning
    feature-sharded [F_mine, B, D] into batch-sharded [F_all, B_loc, D]
    (the reference's pooled-embeddings A2A, dist_data.py:602-698)."""

    def _build(self) -> None:
        n = self.n
        per_dev: List[List[int]] = [[] for _ in range(n)]
        for ti, t in enumerate(self.meta.tables):
            if not (0 <= t.rank < n):
                raise ValueError(
                    f"table {t.name} placed on rank {t.rank} outside mesh "
                    f"of {n} devices"
                )
            per_dev[t.rank].append(ti)

        feats = self.meta.features
        ft = self.meta.feature_table
        feats_of_table: List[List[int]] = [[] for _ in self.meta.tables]
        for fi, ti in enumerate(ft):
            feats_of_table[ti].append(fi)

        self.f_max = max(
            (sum(len(feats_of_table[ti]) for ti in tids) for tids in per_dev),
            default=1,
        ) or 1
        self.rows_max = _pad_rows_tile(max(
            (sum(self.meta.tables[ti].rows for ti in tids) for tids in per_dev),
            default=1,
        ) or 1)

        # [n, f_max]: feature id per (device, slot); pad slot -> feature 0,
        # masked out via dev_feat_valid
        self.dev_feats = np.zeros((n, self.f_max), np.int32)
        self.dev_feat_valid = np.zeros((n, self.f_max), bool)
        self.dev_feat_rowoff = np.zeros((n, self.f_max), np.int32)
        # canonical feature -> (device*f_max + slot) for output reassembly
        self.out_pos = np.zeros((len(feats),), np.int32)
        self.table_dev_rowoff = np.zeros((len(self.meta.tables),), np.int32)
        for d, tids in enumerate(per_dev):
            slot = 0
            rowoff = 0
            for ti in tids:
                self.table_dev_rowoff[ti] = rowoff
                for fi in feats_of_table[ti]:
                    self.dev_feats[d, slot] = fi
                    self.dev_feat_valid[d, slot] = True
                    self.dev_feat_rowoff[d, slot] = rowoff
                    self.out_pos[fi] = d * self.f_max + slot
                    slot += 1
                rowoff += self.meta.tables[ti].rows
        self.per_dev = per_dev
        # uids per device = [f_max, n*B, L] slots of ITS features; the
        # window is one static compile constant for the SPMD program, so
        # the worst DEVICE's worst block gates everyone
        per_dev_fracs = [
            _mom_layout_fracs(
                [
                    (int(self.table_dev_rowoff[ti]),
                     self.meta.tables[ti].rows,
                     len(feats_of_table[ti]) / self.f_max)
                    for ti in tids
                ],
                self.rows_max,
            )
            for tids in per_dev
        ]
        self.mom_fracs = _merge_dev_fracs(per_dev_fracs)
        self.mom_share = max(self.mom_fracs) if self.mom_fracs else None
        self.uniq_entries = tuple(
            _uniq_entries(
                (self.meta.tables[ti].rows,
                 len(feats_of_table[ti]) / self.f_max)
                for ti in tids
            )
            for tids in per_dev
        )

    def weights_shape(self):
        return (self.n, self.rows_max, self.dim)

    def _pack_dense(self, dense, dtype=None):
        arr = jnp.zeros((self.n, self.rows_max, self.dim), jnp.float32)
        for d, tids in enumerate(self.per_dev):
            off = 0
            for ti in tids:
                t = self.meta.tables[ti]
                arr = arr.at[d, off : off + t.rows].set(
                    jnp.asarray(dense[t.name], jnp.float32)
                )
                off += t.rows
        return arr.astype(dtype or self.w_dtype)

    def unshard_to_dense(self, weights):
        w = np.asarray(weights)
        out = {}
        for d, tids in enumerate(self.per_dev):
            off = 0
            for ti in tids:
                t = self.meta.tables[ti]
                out[t.name] = w[d, off : off + t.rows]
                off += t.rows
        return out

    def unshard_rowwise(self, m):
        out = {}
        for d, tids in enumerate(self.per_dev):
            off = 0
            for ti in tids:
                t = self.meta.tables[ti]
                out[t.name] = m[d, off : off + t.rows]
                off += t.rows
        return out

    def shard_rowwise(self, per_table):
        arr = np.zeros((self.n, self.rows_max), np.float32)
        for d, tids in enumerate(self.per_dev):
            off = 0
            for ti in tids:
                t = self.meta.tables[ti]
                arr[d, off : off + t.rows] = np.asarray(
                    per_table[t.name], np.float32
                )
                off += t.rows
        return jax.device_put(jnp.asarray(arr), self._sharding(P(AXIS)))

    def _mine(self, ids_g, len_g, psw_g, my):
        feats = jnp.asarray(self.dev_feats)[my]  # [f_max]
        fvalid = jnp.asarray(self.dev_feat_valid)[my]
        rowoff = jnp.asarray(self.dev_feat_rowoff)[my]
        ids_m = ids_g[feats] + rowoff[:, None, None]
        len_m = len_g[feats] * fvalid[:, None].astype(len_g.dtype)
        psw_m = None if psw_g is None else psw_g[feats]
        mean_m = jnp.asarray(self.meta.feature_pooling_mean)[feats]
        return ids_m, len_m, psw_m, mean_m

    supports_input_dist = True

    def _fwd_gathered(self, w, ids_g, len_g, psw_g, L):
        """Per-device forward body on pre-gathered global-batch inputs."""
        my = lax.axis_index(AXIS)
        ids_m, len_m, psw_m, mean_m = self._mine(ids_g, len_g, psw_g, my)
        coeff = _token_mask(len_m, L).astype(w.dtype)
        if psw_m is not None:
            coeff = coeff * psw_m.astype(w.dtype)
        denom = jnp.maximum(len_m.astype(w.dtype), 1.0)[:, :, None]
        coeff = jnp.where(mean_m[:, None, None], coeff / denom, coeff)
        pooled = pooled_lookup(
            w[0], ids_m, coeff, impl=self.emb_impl
        )  # [f_max, B, D]
        slots = lax.all_to_all(
            pooled, AXIS, split_axis=1, concat_axis=0, tiled=True
        )  # [n*f_max, B_loc, D]
        return slots[jnp.asarray(self.out_pos)]  # [F, B_loc, D]

    def _upd_gathered(self, w, opt, ids_g, len_g, psw_g, d_out, lr, L):
        """Per-device update body on pre-gathered global-batch inputs
        (d_out is the batch-sharded canonical [F, B_loc, D] cotangent —
        its slot routing depends on the loss and stays in-step)."""
        my = lax.axis_index(AXIS)
        D = self.dim
        # route cotangent back: batch-sharded canonical [F, B_loc, D]
        # -> feature-slot layout -> a2a -> my features, global batch
        slots = jnp.zeros(
            (self.n * self.f_max, d_out.shape[1], D), d_out.dtype
        )
        slots = slots.at[jnp.asarray(self.out_pos)].set(d_out)
        d_m = lax.all_to_all(
            slots, AXIS, split_axis=0, concat_axis=1, tiled=True
        )  # [f_max, B, D]
        ids_m, len_m, psw_m, mean_m = self._mine(ids_g, len_g, psw_g, my)
        coeff = _token_mask(len_m, L).astype(w.dtype)
        if psw_m is not None:
            coeff = coeff * psw_m.astype(w.dtype)
        denom = jnp.maximum(len_m.astype(w.dtype), 1.0)[:, :, None]
        coeff = jnp.where(mean_m[:, None, None], coeff / denom, coeff)
        row_grads = d_m[:, :, None, :] * coeff[:, :, :, None]
        valid = _token_mask(len_m, L)
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            ids_m.reshape(-1), row_grads.reshape(-1, D),
            valid.reshape(-1), lr,
            mom_block_fracs=self.mom_fracs,
            unique_entries=self.uniq_entries, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def fwd(w, ids, lengths, psw):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
            )
            return self._fwd_gathered(w, ids_g, len_g, psw_g, L)

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths, psw)

    def forward_from_dist(self, state, sb_g):
        F, B, L = sb_g.ids.shape
        has_w = sb_g.weights is not None

        def fwd(w, ids_g, len_g, psw_g):
            return self._fwd_gathered(
                w, ids_g, len_g, psw_g if has_w else None, L
            )

        psw = sb_g.weights if has_w else jnp.zeros((), sb_g.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(), P(), P()),
            out_specs=P(None, AXIS),
            # batch inputs are replicated (pre-gathered); mixing them with
            # the device-varying shard trips the static VMA check
            check_vma=False,
        )(state.weights, sb_g.ids, sb_g.lengths, psw)

    def update(self, state, sb, d_pooled, learning_rate):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def upd(w, opt, ids, lengths, psw, d_out, lr):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
            )
            return self._upd_gathered(
                w, opt, ids_g, len_g, psw_g, d_out, lr, L
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        psw_spec = P(None, AXIS) if has_w else P()
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
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

    def update_from_dist(self, state, sb_g, d_pooled, learning_rate):
        F, B, L = sb_g.ids.shape
        has_w = sb_g.weights is not None

        def upd(w, opt, ids_g, len_g, psw_g, d_out, lr):
            return self._upd_gathered(
                w, opt, ids_g, len_g, psw_g if has_w else None, d_out, lr, L
            )

        psw = sb_g.weights if has_w else jnp.zeros((), sb_g.ids.dtype)
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(), P(), P(),
                      P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # pre-gathered replicated inputs + Pallas custom call (above)
            check_vma=False,
        )(state.weights, state.opt, sb_g.ids, sb_g.lengths, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)


class CwEmbeddingSharding(BaseEmbeddingShardingStrategy):
    """Column-wise: every table's embedding dim split evenly over devices
    (ref: cw_sharding.py:126-234). Each device owns cols
    [my*D/n, (my+1)*D/n) of EVERY row; ids are all_gathered, lookup yields
    full pooling of the local column shard, and an all_to_all swaps
    batch-sharding for column-concat (the reference's A2A + column permute
    restore, cw_sharding.py:216-234 — here columns come back in natural
    order by construction, no permute needed).

    Each column shard keeps its own rowwise optimizer state, matching the
    reference's CW-shards-as-virtual-tables semantics."""

    def _build(self) -> None:
        n = self.n
        if self.dim % n != 0:
            raise ValueError(
                f"COLUMN_WISE requires embedding_dim {self.dim} divisible "
                f"by world size {n}"
            )
        self.cols_loc = self.dim // n
        self.row_offsets = np.zeros((len(self.meta.tables),), np.int32)
        acc = 0
        for i, t in enumerate(self.meta.tables):
            self.row_offsets[i] = acc
            acc += t.rows
        self.total_rows = _pad_rows_tile(acc)
        self.feat_row_off = self.row_offsets[self.meta.feature_table]
        # uids = every feature's gathered slots; all rows on each device
        ft = self.meta.feature_table
        F = max(len(ft), 1)
        cnt = np.bincount(ft, minlength=len(self.meta.tables))
        self.mom_fracs = _mom_layout_fracs(
            [
                (int(self.row_offsets[i]), t.rows, cnt[i] / F)
                for i, t in enumerate(self.meta.tables)
            ],
            self.total_rows,
        )
        self.mom_share = max(self.mom_fracs) if self.mom_fracs else None
        self.uniq_entries = (_uniq_entries(
            (t.rows, cnt[i] / F) for i, t in enumerate(self.meta.tables)
        ),)

    def weights_shape(self):
        return (self.n, self.total_rows, self.cols_loc)

    def _pack_dense(self, dense, dtype=None):
        arr = jnp.concatenate(
            [jnp.asarray(dense[t.name]) for t in self.meta.tables], axis=0
        )  # [R, D]
        arr = _pad_tail(arr, self.total_rows)  # ROW_TILE alignment slack
        # [n, R, D/n]: column block j of every row -> device j
        arr = jnp.stack(jnp.split(arr, self.n, axis=1), axis=0)
        return arr.astype(dtype or self.w_dtype)

    def unshard_to_dense(self, weights):
        w = np.asarray(weights)  # [n, R, D/n]
        full = np.concatenate(list(w), axis=1)  # [R, D]
        out = {}
        for off, t in zip(self.row_offsets, self.meta.tables):
            out[t.name] = full[off : off + t.rows]
        return out

    def rowwise_shards(self):
        return self.n

    def unshard_rowwise(self, m):
        # m [n, total_rows]: one independent rowwise state per column
        # shard (virtual-table semantics) -> canonical [S=n, R] per table
        out = {}
        for off, t in zip(self.row_offsets, self.meta.tables):
            out[t.name] = m[:, off : off + t.rows]
        return out

    def shard_rowwise(self, per_table):
        arr = np.concatenate(
            [np.atleast_2d(np.asarray(per_table[t.name], np.float32))
             for t in self.meta.tables],
            axis=1,
        )  # [n, sum rows]  (1-D input = the n == 1 plain-row case)
        arr = _pad_tail(arr, self.total_rows, axis=1)
        return jax.device_put(jnp.asarray(arr), self._sharding(P(AXIS)))

    supports_input_dist = True

    def _fwd_gathered(self, w, ids_g, len_g, psw_g, L):
        """Per-device forward body on pre-gathered global-batch inputs."""
        gids = ids_g + jnp.asarray(self.feat_row_off)[:, None, None]
        coeff = _pool_coeff(
            len_g, L, self.meta.feature_pooling_mean, psw_g, w.dtype
        )
        pooled = pooled_lookup(
            w[0], gids, coeff, impl=self.emb_impl
        )  # [F,B,D/n]
        return lax.all_to_all(
            pooled, AXIS, split_axis=1, concat_axis=2, tiled=True
        )  # [F, B_loc, D]

    def _upd_gathered(self, w, opt, ids_g, len_g, psw_g, d_out, lr, L):
        """Per-device update body on pre-gathered global-batch inputs
        (d_out is the batch-sharded [F, B_loc, D] cotangent — its a2a
        depends on the loss and stays in-step)."""
        d_g = lax.all_to_all(
            d_out, AXIS, split_axis=2, concat_axis=1, tiled=True
        )  # [F, B, D/n]
        gids = ids_g + jnp.asarray(self.feat_row_off)[:, None, None]
        coeff = _pool_coeff(
            len_g, L, self.meta.feature_pooling_mean, psw_g, w.dtype
        )
        row_grads = d_g[:, :, None, :] * coeff[:, :, :, None]
        valid = _token_mask(len_g, L)
        new_w, new_opt = apply_fused_update(
            w[0], self._opt_local(opt),
            gids.reshape(-1), row_grads.reshape(-1, self.cols_loc),
            valid.reshape(-1), lr,
            mom_block_fracs=self.mom_fracs,
            unique_entries=self.uniq_entries, **self.optim_kwargs,
        )
        return new_w[None], self._opt_relocal(new_opt)

    def forward(self, state, sb):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def fwd(w, ids, lengths, psw):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
            )
            return self._fwd_gathered(w, ids_g, len_g, psw_g, L)

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS) if has_w else P()),
            out_specs=P(None, AXIS),
        )(state.weights, sb.ids, sb.lengths, psw)

    def forward_from_dist(self, state, sb_g):
        F, B, L = sb_g.ids.shape
        has_w = sb_g.weights is not None

        def fwd(w, ids_g, len_g, psw_g):
            return self._fwd_gathered(
                w, ids_g, len_g, psw_g if has_w else None, L
            )

        psw = sb_g.weights if has_w else jnp.zeros((), sb_g.ids.dtype)
        return jax.shard_map(
            fwd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), P(), P(), P()),
            out_specs=P(None, AXIS),
            # batch inputs are replicated (pre-gathered); mixing them with
            # the device-varying shard trips the static VMA check
            check_vma=False,
        )(state.weights, sb_g.ids, sb_g.lengths, psw)

    def update_from_dist(self, state, sb_g, d_pooled, learning_rate):
        F, B, L = sb_g.ids.shape
        has_w = sb_g.weights is not None

        def upd(w, opt, ids_g, len_g, psw_g, d_out, lr):
            return self._upd_gathered(
                w, opt, ids_g, len_g, psw_g if has_w else None, d_out, lr, L
            )

        psw = sb_g.weights if has_w else jnp.zeros((), sb_g.ids.dtype)
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=self.env.mesh,
            in_specs=(P(AXIS), self._opt_specs(sharded=True), P(), P(), P(),
                      P(None, AXIS), P()),
            out_specs=(P(AXIS), self._opt_specs(sharded=True)),
            # pre-gathered replicated inputs + Pallas custom call
            check_vma=False,
        )(state.weights, state.opt, sb_g.ids, sb_g.lengths, psw, d_pooled,
          jnp.asarray(learning_rate, jnp.float32))
        return EmbeddingGroupState(weights=new_w, opt=new_opt)

    def update(self, state, sb, d_pooled, learning_rate):
        F, B_loc, L = sb.ids.shape
        mesh = self.env.mesh
        has_w = sb.weights is not None

        def upd(w, opt, ids, lengths, psw, d_out, lr):
            ids_g = lax.all_gather(ids, AXIS, axis=1, tiled=True)
            len_g = lax.all_gather(lengths, AXIS, axis=1, tiled=True)
            psw_g = (
                lax.all_gather(psw, AXIS, axis=1, tiled=True) if has_w else None
            )
            return self._upd_gathered(
                w, opt, ids_g, len_g, psw_g, d_out, lr, L
            )

        psw = sb.weights if has_w else jnp.zeros((), sb.ids.dtype)
        psw_spec = P(None, AXIS) if has_w else P()
        new_w, new_opt = jax.shard_map(
            upd,
            mesh=mesh,
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


STRATEGY_REGISTRY = {
    ShardingType.DATA_PARALLEL: DpEmbeddingSharding,
    ShardingType.ROW_WISE: RwEmbeddingSharding,
    ShardingType.TABLE_WISE: TwEmbeddingSharding,
    ShardingType.COLUMN_WISE: CwEmbeddingSharding,
}


def _register_hierarchical():
    # deferred to avoid a circular import at module load
    from torchrec_tpu.parallel.hierarchical_strategies import (
        TwCwEmbeddingSharding,
        TwRwEmbeddingSharding,
    )

    STRATEGY_REGISTRY.setdefault(
        ShardingType.TABLE_ROW_WISE, TwRwEmbeddingSharding
    )
    STRATEGY_REGISTRY.setdefault(
        ShardingType.TABLE_COLUMN_WISE, TwCwEmbeddingSharding
    )


def create_sharding_strategy(
    env: ShardingEnv,
    meta: GroupMeta,
    optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
    optim_kwargs: Optional[dict] = None,
) -> BaseEmbeddingShardingStrategy:
    if meta.sharding_type in (
        ShardingType.TABLE_ROW_WISE, ShardingType.TABLE_COLUMN_WISE
    ):
        _register_hierarchical()
    cls = STRATEGY_REGISTRY.get(meta.sharding_type)
    if cls is None:
        raise NotImplementedError(
            f"sharding type {meta.sharding_type} not implemented yet"
        )
    return cls(env, meta, optim, optim_kwargs)
