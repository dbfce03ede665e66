"""DistributedModelParallel — the model-parallel engine.

ref: torchrec/distributed/model_parallel.py:127. The reference walks the
authored module, swaps every EmbeddingBagCollection for a sharded version
per the plan, wraps the dense remainder in DDP, and combines the fused
optimizers (ref :200-341).

TPU re-design (same architecture, compiler-native mechanisms):

* Module swap: each flax EmbeddingBagCollection submodule is replaced by a
  parameter-less `InjectedEmbeddingBagCollection` stub. The sharded lookup
  runs OUTSIDE the flax graph (ShardedEmbeddingBagCollection over shard_map
  collectives) and its pooled output is injected through a flax variable
  collection ("injected"). Differentiating the dense apply w.r.t. that
  collection yields exactly the pooled-output cotangent the fused update
  needs — the JAX equivalent of the reference's
  `compute_and_output_dist` + backward-A2A split (ref embeddingbag.py:
  362-402, comm_ops.py:566-605).

* DDP replacement: dense params are replicated and batch inputs are
  sharded over the mesh; inside one jit XLA inserts the gradient
  all-reduce itself — no wrapper module (ref model_parallel.py:65-111).

* Combined optimizer: dense params step with any optax transform; each
  embedding group steps with its fused optimizer inside `update` — the
  analogue of CombinedOptimizer(fused + dense) (ref model_parallel.py:222,
  optim/keyed.py:236-325).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import freeze, unfreeze
from jax.sharding import NamedSharding, PartitionSpec as P

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel.sharded_ebc import ShardedEmbeddingBagCollection
from torchrec_tpu.parallel.types import (
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedTensor, PaddedSparseBatch

Array = jax.Array


class InjectedEmbeddingBagCollection(nn.Module):
    """Parameter-less stand-in for an EBC inside the swapped model: returns
    the pooled KeyedTensor injected via the "injected" collection. Carries
    the original table configs so parent modules that introspect them
    (e.g. DLRM's dim validation) keep working."""

    keys: Tuple[str, ...]
    length_per_key: Tuple[int, ...]
    tables: Tuple = ()
    is_weighted: bool = False
    feature_processor: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, features: PaddedSparseBatch) -> KeyedTensor:
        if self.feature_processor is not None:
            # Creates the processor params inside the dense tree; the
            # processed weights feed the sharded lookup OUTSIDE this graph
            # (the DMP train step chains vjp(pooled, weights) into
            # vjp(weights, params) for exact gradients), so the value
            # itself is unused here.
            _ = self.feature_processor(features)
        B = features.ids.shape[1]
        total = sum(self.length_per_key)
        pooled = self.variable(
            "injected",
            "pooled",
            lambda: jnp.zeros((B, total), jnp.float32),
        )
        return KeyedTensor(
            values=pooled.value,
            keys=self.keys,
            length_per_key=self.length_per_key,
        )


class InjectedEmbeddingTowerCollection(nn.Module):
    """Parameter-less stand-in for an EmbeddingTower(Collection): returns
    the concatenated tower interaction outputs [B, sum d_out] injected by
    the sharded tower collection (towers run entirely outside the dense
    graph — lookup AND interaction live on the owning device, only the
    small [B, d_out] output crosses back; ref:
    embedding_tower_sharding.py:429-833)."""

    total_d_out: int

    @nn.compact
    def __call__(self, features: PaddedSparseBatch) -> Array:
        """Call Args: features padded sparse batch (batch-size source)."""
        B = features.ids.shape[1]
        out = self.variable(
            "injected",
            "pooled",
            lambda: jnp.zeros((B, self.total_d_out), jnp.float32),
        )
        return out.value


class InjectedEmbeddingCollection(nn.Module):
    """Parameter-less stand-in for an EmbeddingCollection: returns the
    per-token embeddings injected as a stacked [F, B, L, D] variable."""

    keys: Tuple[str, ...]
    embedding_dim: int
    tables: Tuple = ()

    @nn.compact
    def __call__(self, features: PaddedSparseBatch, as_jagged: bool = False):
        """Call Args: features padded sparse batch (shape source only);
        as_jagged accepted for EmbeddingCollection API compatibility."""
        del as_jagged
        F = len(self.keys)
        B, L = features.ids.shape[1], features.ids.shape[2]
        stacked = self.variable(
            "injected",
            "tokens",
            lambda: jnp.zeros((F, B, L, self.embedding_dim), jnp.float32),
        )
        return {k: stacked.value[i] for i, k in enumerate(self.keys)}


def _tower_d_in(tower) -> int:
    """Interaction input width: one pooled [D] block per (table, feature)."""
    return sum(
        t.embedding_dim * len(t.feature_names)
        for t in tower.embedding_module.tables
    )


def _tower_d_out(tower) -> int:
    """Interaction output width, inferred shape-only (no compute)."""
    out = jax.eval_shape(
        lambda r, x: tower.interaction_module.init_with_output(r, x)[0],
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, _tower_d_in(tower)), jnp.float32),
    )
    return int(out.shape[1])


def _swap_ebcs(
    module: nn.Module, path: Tuple[str, ...] = ()
) -> Tuple[nn.Module, Dict[Tuple[str, ...], nn.Module]]:
    """Recursively replace EBC/EC fields with injection stubs.

    Returns (swapped module, {attribute path -> original module}).
    Attribute paths match flax scope paths for field-declared submodules.
    """
    from torchrec_tpu.modules.embedding_modules import EmbeddingCollection
    from torchrec_tpu.modules.embedding_tower import (
        EmbeddingTower,
        EmbeddingTowerCollection,
    )
    from torchrec_tpu.modules.feature_processor import (
        FeatureProcessedEmbeddingBagCollection,
    )

    found: Dict[Tuple[str, ...], nn.Module] = {}
    if isinstance(module, (EmbeddingTower, EmbeddingTowerCollection)):
        towers = (
            module.towers
            if isinstance(module, EmbeddingTowerCollection)
            else (module,)
        )
        stub = InjectedEmbeddingTowerCollection(
            total_d_out=sum(_tower_d_out(tw) for tw in towers)
        )
        found[path] = module
        return stub, found
    if isinstance(module, FeatureProcessedEmbeddingBagCollection):
        from torchrec_tpu.modules.embedding_modules import (
            embedding_names_by_table,
        )

        inner = module.embedding_bag_collection
        enames: List[str] = []
        dims: List[int] = []
        for cfg, names in zip(
            inner.tables, embedding_names_by_table(inner.tables)
        ):
            for n in names:
                enames.append(n)
                dims.append(cfg.embedding_dim)
        stub = InjectedEmbeddingBagCollection(
            keys=tuple(enames),
            length_per_key=tuple(dims),
            tables=tuple(inner.tables),
            is_weighted=True,
            feature_processor=module.feature_processor,
        )
        found[path] = module
        return stub, found
    if isinstance(module, EmbeddingCollection):
        from torchrec_tpu.modules.embedding_modules import (
            embedding_names_by_table,
        )

        enames = [
            n
            for names in embedding_names_by_table(module.tables)
            for n in names
        ]
        stub = InjectedEmbeddingCollection(
            keys=tuple(enames),
            embedding_dim=module.tables[0].embedding_dim,
            tables=tuple(module.tables),
        )
        found[path] = module
        return stub, found
    if isinstance(module, EmbeddingBagCollection):
        enames: List[str] = []
        dims: List[int] = []
        from torchrec_tpu.modules.embedding_modules import (
            embedding_names_by_table,
        )

        for cfg, names in zip(
            module.tables, embedding_names_by_table(module.tables)
        ):
            for n in names:
                enames.append(n)
                dims.append(cfg.embedding_dim)
        stub = InjectedEmbeddingBagCollection(
            keys=tuple(enames),
            length_per_key=tuple(dims),
            tables=tuple(module.tables),
            is_weighted=module.is_weighted,
        )
        found[path] = module
        return stub, found

    replacements: Dict[str, Any] = {}
    for field in dataclasses.fields(module):
        if field.name in ("name", "parent"):
            continue
        value = getattr(module, field.name, None)
        if isinstance(value, nn.Module):
            new, sub = _swap_ebcs(value, path + (field.name,))
            if sub:
                replacements[field.name] = new
                found.update(sub)
        elif isinstance(value, (tuple, list)):
            new_items = []
            changed = False
            for i, item in enumerate(value):
                if isinstance(item, nn.Module):
                    new, sub = _swap_ebcs(
                        item, path + (f"{field.name}_{i}",)
                    )
                    if sub:
                        changed = True
                        found.update(sub)
                        new_items.append(new)
                        continue
                new_items.append(item)
            if changed:
                replacements[field.name] = type(value)(new_items)
    if replacements:
        module = module.clone(**replacements)
    return module, found


@struct.dataclass
class DMPState:
    """The full distributed train state."""

    dense_params: Any
    dense_opt: Any
    emb_states: Dict[str, Tuple]  # path-key -> tuple[EmbeddingGroupState]
    step: Array


def _default_plan(
    tables, env: ShardingEnv, sharder, dependencies: Optional[dict] = None
) -> Dict[str, ParameterSharding]:
    """No explicit plan: run the cost-model planner constrained to the
    module's sharder capabilities (the reference plans via
    EmbeddingShardingPlanner.collective_plan when DMP gets no plan,
    model_parallel.py:200-212). `dependencies` maps table names to
    co-location tags (one per embedding tower, ref planner/
    enumerators.py:130-135). Falls back to a RW/DP heuristic when the
    planner cannot find a feasible layout for the toy topology."""
    from torchrec_tpu.planner import (
        EmbeddingShardingPlanner,
        ParameterConstraints,
        Topology,
    )
    from torchrec_tpu.planner.types import PlannerError

    dependencies = dependencies or {}
    try:
        topo = Topology(world_size=env.world_size)
        constraints = {
            t.name: ParameterConstraints(
                sharding_types=sharder.sharding_types(),
                dependency=dependencies.get(t.name),
            )
            for t in tables
        }
        planner = EmbeddingShardingPlanner(topo, constraints=constraints)
        return planner.plan(tables, module_path="m").plan["m"]
    except PlannerError:
        if dependencies:
            # co-located fallback: whole dependency groups round-robin
            tags = sorted({dependencies.get(t.name, t.name) for t in tables})
            rank_of = {
                tag: i % env.world_size for i, tag in enumerate(tags)
            }
            return {
                t.name: ParameterSharding(
                    ShardingType.TABLE_WISE,
                    ranks=[rank_of[dependencies.get(t.name, t.name)]],
                )
                for t in tables
            }
        plan = {}
        for cfg in tables:
            if cfg.num_embeddings < 64:
                plan[cfg.name] = ParameterSharding(
                    ShardingType.DATA_PARALLEL
                )
            else:
                plan[cfg.name] = ParameterSharding(ShardingType.ROW_WISE)
        return plan


class DistributedModelParallel:
    """Entry point: wrap an authored flax model, shard its embedding
    collections per plan, and expose functional init / forward /
    train-step (ref: model_parallel.py:127-364)."""

    def __init__(
        self,
        module: nn.Module,
        env: Optional[ShardingEnv] = None,
        plan: Optional[ShardingPlan] = None,
        fused_optim: EmbOptimType = EmbOptimType.ROWWISE_ADAGRAD,
        fused_params: Optional[dict] = None,
        dense_optimizer: Optional[optax.GradientTransformation] = None,
        sharders: Optional[list] = None,
    ):
        self.env = env or ShardingEnv.from_devices()
        self.module = module
        self.swapped, self._ebcs = _swap_ebcs(module)
        if not self._ebcs:
            raise ValueError(
                "no EmbeddingBagCollection/EmbeddingCollection found in "
                "module (embedding modules must be declared dataclass "
                "fields, not created inside setup(), to be shardable)"
            )
        # sharders carry per-module-kind fused_params and constrain the
        # default plan (ref: DMP(sharders=[EBCSharder(fused_params=...)]),
        # model_parallel.py:43-47 + dlrm_main.py:524-535). Explicit
        # fused_params override sharder-provided entries.
        self._sharders = list(sharders or [])
        merged: dict = {}
        for sh in self._sharders:
            merged.update(getattr(sh, "fused_params", {}) or {})
        merged.update(fused_params or {})
        fused_params = merged
        self.learning_rate = fused_params.pop("learning_rate", 0.01)
        # optional step -> lr schedule for the fused embedding optimizer
        # (the reference syncs lr into the TBE per step — set_learning_rate
        # via EmbeddingFusedOptimizer.step(), batched_embedding_kernel.py
        # :250-257 — driven by e.g. the DLRM lr-change schedule,
        # dlrm_main.py:346-353). Evaluated in-graph on state.step.
        self.fused_lr_schedule = fused_params.pop("lr_schedule", None)
        self.sharded_ebcs: Dict[str, Any] = {}
        self._kinds: Dict[str, str] = {}  # "ebc" (pooled) | "ec" (sequence)
        self._paths: Dict[str, Tuple[str, ...]] = {}
        self._fps: Dict[str, nn.Module] = {}  # key -> feature processor
        self._uvm_split: Dict[str, dict] = {}  # key -> UVM partition info
        self._uvm_mods: Dict[str, Any] = {}  # key -> UvmEBC (built at init)
        from torchrec_tpu.modules.embedding_modules import EmbeddingCollection
        from torchrec_tpu.modules.feature_processor import (
            FeatureProcessedEmbeddingBagCollection,
        )
        from torchrec_tpu.parallel.sharded_ec import ShardedEmbeddingCollection

        from torchrec_tpu.modules.embedding_tower import (
            EmbeddingTower,
            EmbeddingTowerCollection,
        )

        for path, mod in self._ebcs.items():
            key = "/".join(path) if path else "<root>"
            if isinstance(mod, (EmbeddingTower, EmbeddingTowerCollection)):
                # a tower = its tables + interaction module co-located on
                # one device; the sharded collection owns BOTH (interaction
                # params update with SGD at the fused learning rate inside
                # the collection — ref: interaction modules DDP'd on the
                # owner host, embedding_tower_sharding.py:170-177)
                self._init_tower_module(key, path, mod, plan, fused_optim,
                                        fused_params)
                continue
            if isinstance(mod, FeatureProcessedEmbeddingBagCollection):
                # shard the inner EBC; the processor stays dense (its
                # params live replicated in dense_params via the stub)
                self._fps[key] = mod.feature_processor
                mod = mod.embedding_bag_collection
            module_plan = None
            if plan is not None:
                module_plan = plan.get_plan_for_module("/".join(path))
            if module_plan is None:
                from torchrec_tpu.parallel.sharders import (
                    EmbeddingBagCollectionSharder,
                    EmbeddingCollectionSharder,
                )

                kind = (
                    "ec" if isinstance(mod, EmbeddingCollection) else "ebc"
                )
                sharder = next(
                    (s for s in self._sharders
                     if getattr(s, "module_kind", None) == kind),
                    None,
                ) or (
                    EmbeddingCollectionSharder()
                    if kind == "ec"
                    else EmbeddingBagCollectionSharder()
                )
                module_plan = _default_plan(mod.tables, self.env, sharder)
            if isinstance(mod, EmbeddingCollection):
                self.sharded_ebcs[key] = ShardedEmbeddingCollection(
                    self.env,
                    mod.tables,
                    module_plan,
                    optim=fused_optim,
                    optim_kwargs=fused_params,
                )
                self._kinds[key] = "ec"
            else:
                # FUSED_UVM_CACHING tables are host-offloaded: split them
                # out to a host-driven UvmEmbeddingBagCollection; the rest
                # stay in the jitted sharded EBC (ref: per-table
                # EmbeddingLocation.MANAGED_CACHING inside one TBE,
                # batched_embedding_kernel.py:410-421).
                from torchrec_tpu.parallel.types import ComputeKernel

                uvm_names = {
                    t.name
                    for t in mod.tables
                    if getattr(
                        module_plan.get(t.name), "compute_kernel", None
                    )
                    is ComputeKernel.FUSED_UVM_CACHING
                }
                dev_tables = tuple(
                    t for t in mod.tables if t.name not in uvm_names
                )
                if uvm_names:
                    if key in self._fps:
                        raise NotImplementedError(
                            "FeatureProcessedEmbeddingBagCollection with "
                            "FUSED_UVM_CACHING tables is not supported"
                        )
                    uvm_tables = tuple(
                        t for t in mod.tables if t.name in uvm_names
                    )
                    self._uvm_split[key] = self._build_uvm_split(
                        mod.tables, dev_tables, uvm_tables,
                        fused_optim, dict(fused_params),
                    )
                self.sharded_ebcs[key] = (
                    ShardedEmbeddingBagCollection(
                        self.env,
                        dev_tables,
                        module_plan,
                        is_weighted=mod.is_weighted or key in self._fps,
                        optim=fused_optim,
                        optim_kwargs=fused_params,
                    )
                    if dev_tables
                    else None
                )
                self._kinds[key] = "ebc"
            self._paths[key] = path
        self.dense_optimizer = dense_optimizer or optax.sgd(self.learning_rate)

    def _init_tower_module(self, key, path, mod, plan, fused_optim,
                           fused_params):
        """Build a ShardedEmbeddingTowerCollection for an authored
        EmbeddingTower(Collection) per the plan (ref: DMP swaps towers via
        EmbeddingTower(Collection)Sharder, model_parallel.py:310-341 +
        embedding_tower_sharding.py:835-941)."""
        from torchrec_tpu.modules.embedding_tower import (
            EmbeddingTowerCollection,
        )
        from torchrec_tpu.parallel.sharders import (
            EmbeddingTowerCollectionSharder,
        )
        from torchrec_tpu.parallel.tower_sharding import (
            ShardedEmbeddingTowerCollection,
            TowerSpec,
        )

        towers = (
            mod.towers
            if isinstance(mod, EmbeddingTowerCollection)
            else (mod,)
        )
        all_tables = tuple(
            t for tw in towers for t in tw.embedding_module.tables
        )
        module_plan = None
        if plan is not None:
            module_plan = plan.get_plan_for_module("/".join(path))
        if module_plan is None:
            deps = {
                t.name: f"tower_{i}"
                for i, tw in enumerate(towers)
                for t in tw.embedding_module.tables
            }
            sharder = next(
                (s for s in self._sharders
                 if getattr(s, "module_kind", None) == "tower"),
                None,
            ) or EmbeddingTowerCollectionSharder()
            module_plan = _default_plan(
                all_tables, self.env, sharder, dependencies=deps
            )
        specs = []
        for i, tw in enumerate(towers):
            ranks = set()
            for t in tw.embedding_module.tables:
                ps = module_plan[t.name]
                if ps.sharding_type is not ShardingType.TABLE_WISE:
                    raise ValueError(
                        f"tower table {t.name} planned "
                        f"{ps.sharding_type}; tower tables must be "
                        f"TABLE_WISE (co-located with their interaction "
                        f"module on one device)"
                    )
                ranks.add(ps.ranks[0] if ps.ranks else 0)
            if len(ranks) != 1:
                raise ValueError(
                    f"tower {i} tables placed on multiple ranks "
                    f"{sorted(ranks)}; a tower must be co-located"
                )
            specs.append(
                TowerSpec(
                    tables=tuple(tw.embedding_module.tables),
                    interaction=tw.interaction_module,
                    device=ranks.pop(),
                    d_out=_tower_d_out(tw),
                )
            )
        self.sharded_ebcs[key] = ShardedEmbeddingTowerCollection(
            self.env,
            specs,
            optim=fused_optim,
            optim_kwargs=fused_params,
            interaction_lr=self.learning_rate,
        )
        self._kinds[key] = "tower"
        self._paths[key] = path

    @staticmethod
    def _build_uvm_split(tables, dev_tables, uvm_tables, optim, optim_kwargs):
        """Column bookkeeping for a module with host-offloaded tables.

        The stub injects the FULL [B, sum D] pooled array in the module's
        declared feature order; device and UVM parts are computed
        separately and interleaved back with a static column permutation.
        """
        col_id = []  # (table, feature_idx) per output column block
        dims = []
        for t in tables:
            for j in range(len(t.feature_names)):
                col_id.append((t.name, j))
                dims.append(t.embedding_dim)
        starts: Dict[Tuple[str, int], int] = {}
        off = 0
        for ts in (dev_tables, uvm_tables):
            for t in ts:
                for j in range(len(t.feature_names)):
                    starts[(t.name, j)] = off
                    off += t.embedding_dim
        perm = np.concatenate(
            [
                np.arange(starts[cid], starts[cid] + d)
                for cid, d in zip(col_id, dims)
            ]
        ).astype(np.int32)
        inv_perm = np.argsort(perm).astype(np.int32)
        dev_width = sum(
            t.embedding_dim * len(t.feature_names) for t in dev_tables
        )
        return {
            "dev_tables": dev_tables,
            "uvm_tables": uvm_tables,
            "perm": jnp.asarray(perm),
            "inv_perm": jnp.asarray(inv_perm),
            "dev_width": dev_width,
            "optim": optim,
            "optim_kwargs": optim_kwargs,
        }

    def _merge_uvm(self, key: str, dev_values, uvm_values):
        """Interleave device + UVM pooled columns into module order."""
        sp = self._uvm_split[key]
        if dev_values is None:
            B = uvm_values.shape[0]
            dev_values = jnp.zeros((B, 0), uvm_values.dtype)
        return jnp.concatenate(
            [dev_values, uvm_values.astype(dev_values.dtype)], axis=1
        )[:, sp["perm"]]

    def _split_uvm_grad(self, key: str, d_full):
        """Inverse of _merge_uvm on the cotangent: (d_device, d_uvm)."""
        sp = self._uvm_split[key]
        d_concat = d_full[:, sp["inv_perm"]]
        return d_concat[:, : sp["dev_width"]], d_concat[:, sp["dev_width"]:]

    def _uvm_forward_values(self, key: str, sb):
        """Host-driven UVM lookup -> [B, sum D_uvm] device array."""
        return self._uvm_mods[key].forward(sb).values

    def _host_lr(self, state: DMPState):
        if self.fused_lr_schedule is not None:
            return self.fused_lr_schedule(state.step)
        return self.learning_rate

    # -- state -------------------------------------------------------------

    def init(self, rng: jax.Array, *example_args) -> DMPState:
        variables = self.swapped.init(rng, *example_args)
        variables = unfreeze(variables)
        dense_params = variables.get("params", {})
        # replicate dense params over the mesh
        rep = NamedSharding(self.env.mesh, P())
        dense_params = jax.tree.map(
            lambda x: jax.device_put(x, rep), dense_params
        )
        emb_states = {
            key: ebc.init(jax.random.fold_in(rng, i + 1)) if ebc else ()
            for i, (key, ebc) in enumerate(self.sharded_ebcs.items())
        }
        # host-offloaded (UVM) tables: host-side init, state lives in the
        # UvmEmbeddingBagCollection (the analogue of optimizer/cache state
        # living inside the fbgemm TBE module, not the train-state pytree)
        for i, (key, sp) in enumerate(self._uvm_split.items()):
            from torchrec_tpu.parallel.uvm_ebc import UvmEmbeddingBagCollection

            weights = {}
            for j, t in enumerate(sp["uvm_tables"]):
                k = jax.random.fold_in(rng, 90_001 + 131 * i + j)
                weights[t.name] = np.asarray(
                    jax.random.uniform(
                        k,
                        (t.num_embeddings, t.embedding_dim),
                        minval=t.get_weight_init_min(),
                        maxval=t.get_weight_init_max(),
                    )
                )
            self._uvm_mods[key] = UvmEmbeddingBagCollection(
                sp["uvm_tables"],
                weights,
                optim=sp["optim"],
                optim_kwargs=sp["optim_kwargs"],
            )
        state = DMPState(
            dense_params=dense_params,
            dense_opt=self.dense_optimizer.init(dense_params),
            emb_states=emb_states,
            step=jnp.zeros((), jnp.int32),
        )

        # Commit every leaf to an explicit mesh sharding so the first
        # train-step compilation signature matches all later ones (an
        # uncommitted scalar otherwise triggers a full second compile when
        # it comes back NamedSharding'd after step 1).
        def commit(x):
            # getattr: tracers have no .sharding (init may run under
            # eval_shape/jit for AOT analysis — constrain instead)
            if isinstance(x, jax.Array) and isinstance(
                getattr(x, "sharding", None), NamedSharding
            ):
                return x
            return jax.device_put(x, rep)

        return jax.tree.map(commit, state)

    def _injected(self, pooled: Dict[str, Array]) -> Dict:
        """Build the 'injected' collection dict from per-module values
        (EBC stubs read 'pooled' [B, sum D]; EC stubs 'tokens'
        [F, B, L, D])."""
        inj: Dict = {}
        for key, values in pooled.items():
            var = "tokens" if self._kinds[key] == "ec" else "pooled"
            node = inj
            path = self._paths[key]
            for p in path[:-1]:
                node = node.setdefault(p, {})
            if path:
                node[path[-1]] = {var: values}
            else:
                inj[var] = values
        return inj

    def _forward_values(self, state: DMPState, key: str, sb, dist=None):
        ebc = self.sharded_ebcs[key]
        if self._kinds[key] == "ec":
            return ebc.forward_stacked(state.emb_states[key], sb, dist=dist)
        if self._kinds[key] == "tower":
            return ebc.forward(state.emb_states[key], sb)  # [B, sum d_out]
        return ebc.forward(state.emb_states[key], sb, dist=dist).values

    def _update_module(self, state_emb, key: str, sb, d_values, step,
                       dist=None):
        ebc = self.sharded_ebcs[key]
        lr = (
            self.fused_lr_schedule(step)
            if self.fused_lr_schedule is not None
            else self.learning_rate
        )
        if self._kinds[key] == "ec":
            return ebc.update_stacked(state_emb, sb, d_values, lr, dist=dist)
        if self._kinds[key] == "tower":
            return ebc.update(state_emb, sb, d_values, lr)
        return ebc.update(state_emb, sb, d_values, lr, dist=dist)

    def _find_sparse_arg(self, args) -> PaddedSparseBatch:
        for a in args:
            if isinstance(a, PaddedSparseBatch):
                return a
        raise ValueError("no PaddedSparseBatch argument found")

    def _fp_weights(self, dense_params, key: str, sb):
        """Run module `key`'s feature processor on its replicated dense
        params and return the per-sample weights [F, B, L]."""
        sub = dense_params
        for p in self._paths[key]:
            sub = sub[p]
        return self._fps[key].apply(
            {"params": sub["feature_processor"]}, sb
        ).weights

    def _forward_core(self, state: DMPState, uvm_vals, *args):
        """Traceable eval forward; uvm_vals maps UVM module keys to their
        host-staged pooled arrays (empty when no UVM tables planned)."""
        sb = self._find_sparse_arg(args)
        pooled = {}
        for key in self.sharded_ebcs:
            sbk = sb
            if key in self._fps:
                sbk = sb.replace(
                    weights=self._fp_weights(state.dense_params, key, sb)
                )
            if key in self._uvm_split:
                dev = (
                    self._forward_values(state, key, sbk)
                    if self.sharded_ebcs[key] is not None
                    else None
                )
                pooled[key] = self._merge_uvm(key, dev, uvm_vals[key])
            else:
                pooled[key] = self._forward_values(state, key, sbk)
        return self.swapped.apply(
            {"params": state.dense_params, "injected": self._injected(pooled)},
            *args,
        )

    def forward(self, state: DMPState, *args):
        """Inference/eval forward. Jit-compatible UNLESS the plan holds
        FUSED_UVM_CACHING tables (their rows are host-staged, which cannot
        trace) — wrap eval in `make_eval_fn()` instead, which splits the
        host staging out of the jitted region like the train step does."""
        sb = self._find_sparse_arg(args)
        uvm_vals = {
            k: self._uvm_forward_values(k, sb) for k in self._uvm_split
        }
        return self._forward_core(state, uvm_vals, *args)

    def make_eval_fn(self, jit: bool = True):
        """Build a jit-safe eval forward: (state, *args) -> model output.

        With FUSED_UVM_CACHING tables the host-side row staging runs
        OUTSIDE the jitted executable (the same host/device split as
        `make_train_step`); without them this is simply jit(forward)."""
        if not self._uvm_split:
            fn = lambda state, *args: self._forward_core(state, {}, *args)
            return jax.jit(fn) if jit else fn
        inner = jax.jit(self._forward_core) if jit else self._forward_core
        uvm_keys = tuple(self._uvm_split)

        def eval_fn(state: DMPState, *args):
            sb = self._find_sparse_arg(args)
            uvm_vals = {
                k: self._uvm_forward_values(k, sb) for k in uvm_keys
            }
            return inner(state, uvm_vals, *args)

        return eval_fn

    def make_train_step(
        self,
        loss_fn: Optional[Callable] = None,
        donate: bool = True,
        jit: bool = True,
        _return_core: bool = False,
    ):
        """Build a jittable train step.

        The wrapped module must return (loss, aux) (DLRMTrain-style) unless
        `loss_fn(model_output) -> (loss, aux)` is given. `jit=False`
        returns the raw traceable function so callers can fuse it into a
        larger jitted program (e.g. on-device batch generation + step in
        ONE executable — switching executables per iteration is expensive
        on remote-attached TPUs).
        """

        def train_step_core(state: DMPState, uvm_vals, dists, *args):
            """Traceable core; uvm_vals maps UVM module keys to their
            host-staged pooled [B, sum D_uvm] arrays (empty when no
            FUSED_UVM_CACHING tables are planned); dists maps module keys
            to pre-gathered input dists (see make_prefetched_train_step).
            Returns the UVM slice of the pooled cotangent for the
            host-side update."""
            sb = self._find_sparse_arg(args)
            pooled = {}
            sb_mod = {}  # per-module batch (FP modules carry live weights)
            pool_vjps = {}
            fp_vjps = {}
            for key in self.sharded_ebcs:
                if key in self._uvm_split:
                    dev = (
                        self._forward_values(state, key, sb)
                        if self.sharded_ebcs[key] is not None
                        else None
                    )
                    pooled[key] = self._merge_uvm(key, dev, uvm_vals[key])
                    sb_mod[key] = sb
                elif key in self._fps:
                    # Pooling is LINEAR in the per-sample weights, so
                    # chaining vjp(pooled, w) . vjp(w, dense_params) gives
                    # the processor params their EXACT gradient even though
                    # the sharded lookup runs outside the flax autodiff
                    # region (closes the reference's position-weighted
                    # pooled path, grouped_position_weighted.py:52-77).
                    w, fp_vjps[key] = jax.vjp(
                        lambda dp, key=key: self._fp_weights(dp, key, sb),
                        state.dense_params,
                    )
                    pooled[key], pool_vjps[key] = jax.vjp(
                        lambda ww, key=key: self._forward_values(
                            state, key, sb.replace(weights=ww)
                        ),
                        w,
                    )
                    sb_mod[key] = sb.replace(weights=w)
                else:
                    pooled[key] = self._forward_values(
                        state, key, sb, dist=dists.get(key)
                    )
                    sb_mod[key] = sb

            def f(dense_params, injected_pooled):
                out = self.swapped.apply(
                    {
                        "params": dense_params,
                        "injected": self._injected(injected_pooled),
                    },
                    *args,
                )
                if loss_fn is not None:
                    loss, aux = loss_fn(out)
                else:
                    loss, aux = out
                return loss, aux

            (loss, aux), (d_dense, d_pooled) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(state.dense_params, pooled)

            # route pooled cotangents back into feature-processor params
            for key, vjp_pool in pool_vjps.items():
                (d_w,) = vjp_pool(d_pooled[key])
                (dd,) = fp_vjps[key](d_w)
                d_dense = jax.tree.map(jnp.add, d_dense, dd)

            updates, new_dense_opt = self.dense_optimizer.update(
                d_dense, state.dense_opt, state.dense_params
            )
            new_dense = optax.apply_updates(state.dense_params, updates)
            new_emb = {}
            d_uvm_out = {}
            for key in self.sharded_ebcs:
                if key in self._uvm_split:
                    d_dev, d_uvm = self._split_uvm_grad(key, d_pooled[key])
                    d_uvm_out[key] = d_uvm
                    new_emb[key] = (
                        self._update_module(
                            state.emb_states[key], key, sb_mod[key], d_dev,
                            state.step,
                        )
                        if self.sharded_ebcs[key] is not None
                        else ()
                    )
                else:
                    new_emb[key] = self._update_module(
                        state.emb_states[key], key, sb_mod[key],
                        d_pooled[key], state.step,
                        dist=dists.get(key),
                    )
            new_state = DMPState(
                dense_params=new_dense,
                dense_opt=new_dense_opt,
                emb_states=new_emb,
                step=state.step + 1,
            )
            return new_state, loss, aux, d_uvm_out

        if _return_core:
            # raw traceable core (state, uvm_vals, dists, *args) for the
            # prefetched-step wrapper
            return train_step_core

        if self._uvm_split:
            # Host-orchestrated step: stage UVM rows (host) -> ONE jitted
            # device step -> host-side UVM table update. This is the price
            # UVM pays on any architecture (CUDA hides the same staging in
            # page faults); everything device-side stays one executable.
            if not jit:
                raise ValueError(
                    "jit=False is not supported with FUSED_UVM_CACHING "
                    "tables: the step is host-orchestrated"
                )
            inner = (
                jax.jit(train_step_core, donate_argnums=(0,))
                if donate
                else jax.jit(train_step_core)
            )
            uvm_keys = tuple(self._uvm_split)

            def uvm_step(state: DMPState, *args):
                sb = self._find_sparse_arg(args)
                uvm_vals = {
                    k: self._uvm_forward_values(k, sb) for k in uvm_keys
                }
                lr = self._host_lr(state)
                new_state, loss, aux, d_uvm = inner(
                    state, uvm_vals, {}, *args
                )
                for k in uvm_keys:
                    self._uvm_mods[k].update(sb, d_uvm[k], lr)
                return new_state, loss, aux

            return uvm_step

        def train_step(state: DMPState, *args):
            out = train_step_core(state, {}, {}, *args)
            return out[0], out[1], out[2]

        if not jit:
            return train_step
        if donate:
            return jax.jit(train_step, donate_argnums=(0,))
        return jax.jit(train_step)

    # -- cross-batch input-dist prefetch ------------------------------------

    def _dist_keys(self) -> Tuple[str, ...]:
        """Module keys whose sparse input dist is prefetchable: plain
        sharded EBCs/ECs without feature processors (their per-sample
        weights are computed in-step from live dense params) or UVM
        staging."""
        return tuple(
            k
            for k, ebc in self.sharded_ebcs.items()
            if ebc is not None
            and self._kinds[k] in ("ebc", "ec")
            and k not in self._fps
            and k not in self._uvm_split
        )

    def input_dist(self, sb: PaddedSparseBatch) -> Dict[str, tuple]:
        """Batch i+1's prefetchable sparse input dist (jittable,
        parameter-independent): {module key -> per-group pre-gathered
        batches}. Groups/modules that must gather in-step are absent.
        ref: the pre-issued input_dist of TrainPipelineSparseDist
        (train_pipeline.py:422-536)."""
        out = {}
        for key in self._dist_keys():
            dist = self.sharded_ebcs[key].input_dist(sb)
            if any(d is not None for d in dist):
                out[key] = dist
        return out

    def make_prefetched_train_step(
        self,
        loss_fn: Optional[Callable] = None,
        donate: bool = True,
        jit: bool = True,
    ):
        """Build the 3-stage pipelined step: batch i+1's sparse input dist
        is fused INTO batch i's program with no data dependency on it, so
        XLA overlaps the id all_gathers with batch i's dense compute (the
        reference's cross-batch input-dist overlap,
        ref train_pipeline.py:422-536, without streams or FX rewrites).

        Returns step(state, dists, next_sb, *args) ->
        (new_state, loss, aux, next_dists) where `dists` comes from
        `input_dist` (prime with input_dist(batch_0)) and *args are batch
        i's model args. Numerics are identical to make_train_step."""
        if self._uvm_split:
            raise ValueError(
                "prefetched train step does not support FUSED_UVM_CACHING "
                "tables (the step is host-orchestrated)"
            )
        core = self.make_train_step(
            loss_fn=loss_fn, donate=donate, jit=False, _return_core=True
        )

        def step(state: DMPState, dists, next_sb, *args):
            new_state, loss, aux, _ = core(state, {}, dists, *args)
            next_dists = self.input_dist(next_sb)
            return new_state, loss, aux, next_dists

        if not jit:
            return step
        if donate:
            return jax.jit(step, donate_argnums=(0, 1))
        return jax.jit(step)

    # -- checkpoint-ish helpers (ref: model_parallel.py:392-513) -----------

    def state_dict(self, state: DMPState) -> Dict[str, Any]:
        """Flat dict with ORIGINAL (unsharded) table names — re-shardable
        by key (ref: model_parallel.py:392-456)."""
        out: Dict[str, Any] = {"dense": state.dense_params}
        for key, ebc in self.sharded_ebcs.items():
            dense = (
                ebc.unshard_to_dense(state.emb_states[key]) if ebc else {}
            )
            if key in self._uvm_mods:
                dense = {**dense, **self._uvm_mods[key].state_dict()}
                mom = self._uvm_mods[key].momentum_dict()
                if mom:
                    out[f"uvm_momentum/{key}"] = mom
            out[f"embeddings/{key}"] = dense
        return out

    def load_tables(
        self,
        state: DMPState,
        tables: Dict[str, Dict[str, Any]],
        uvm_momentum: Optional[Dict[str, Dict[str, Any]]] = None,
    ) -> DMPState:
        """Load unsharded per-table weights (resharding on load).

        uvm_momentum: optional {module key -> {table -> momentum}} from
        `state_dict()['uvm_momentum/<key>']` for exact host-offloaded
        optimizer resume (weights-only load restarts momentum fresh)."""
        new_emb = dict(state.emb_states)
        for key, dense in tables.items():
            uvm_names = (
                {t.name for t in self._uvm_split[key]["uvm_tables"]}
                if key in self._uvm_split
                else set()
            )
            if uvm_names & set(dense):
                if key not in self._uvm_mods:
                    raise ValueError(
                        "call init() before load_tables() when the plan "
                        "holds FUSED_UVM_CACHING tables"
                    )
                from torchrec_tpu.parallel.uvm_ebc import (
                    UvmEmbeddingBagCollection,
                )

                # rebuild with the loaded weights: fresh cache + optimizer
                # state (same semantics as cross-plan checkpoint load)
                sp = self._uvm_split[key]
                weights = self._uvm_mods[key].state_dict()
                weights.update(
                    {
                        n: np.asarray(dense[n], np.float32)
                        for n in uvm_names & set(dense)
                    }
                )
                self._uvm_mods[key] = UvmEmbeddingBagCollection(
                    sp["uvm_tables"],
                    weights,
                    optim=sp["optim"],
                    optim_kwargs=sp["optim_kwargs"],
                )
                if uvm_momentum and key in uvm_momentum:
                    self._uvm_mods[key].load_momentum(uvm_momentum[key])
            dev_dense = {
                k: v for k, v in dense.items() if k not in uvm_names
            }
            if dev_dense:
                if self._kinds.get(key) == "tower":
                    # preserve interaction params; tables reshard, fused
                    # optimizer state restarts (as on any cross-plan load)
                    new_emb[key] = self.sharded_ebcs[key].load_tables(
                        state.emb_states[key], dev_dense
                    )
                else:
                    new_emb[key] = self.sharded_ebcs[key].shard_from_dense(
                        dev_dense
                    )
        return state.replace(emb_states=new_emb)
