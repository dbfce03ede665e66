"""Inference stack: quantized predict modules.

ref: torchrec/inference/modules.py — `quantize_embeddings` (:18, eager
dynamic quantization mapping EBC -> quant EBC), `PredictModule` (:48)
and `PredictFactory` (:78) serving contracts; torch.package-based
`PredictFactoryPackager` (model_packager.py:46-99).

TPU re-design: a PredictModule is a jitted pure function closed over
(dense params, quantized tables). `quantize_embeddings` consumes a
trained DistributedModelParallel state — it unshards each embedding
collection and row-wise-quantizes per table. Export is an npz + JSON
manifest directory (the torch.package equivalent: everything needed to
re-load given the model-building code)."""

from __future__ import annotations

import abc
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import DataType
from torchrec_tpu.quant.embedding_modules import QuantEmbeddingBagCollection
from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array


class PredictModule:
    """Serving wrapper: dense fp32 graph + int-N embedding lookups
    (ref: inference/modules.py:48-133)."""

    def __init__(
        self,
        dmp,
        dense_params: Any,
        quant_ebcs: Dict[str, QuantEmbeddingBagCollection],
    ):
        self._dmp = dmp
        self._dense_params = dense_params
        self._quant_ebcs = quant_ebcs
        self._jitted = jax.jit(self._forward)

    def _forward(self, quant_tables, dense_params, *args):
        sb = self._dmp._find_sparse_arg(args)
        pooled = {}
        for key, qebc in self._quant_ebcs.items():
            qebc = QuantEmbeddingBagCollection(
                qebc.tables, quant_tables[key], qebc.is_weighted,
                qebc.max_feature_length,
            )
            if self._dmp._kinds[key] == "ebc":
                pooled[key] = qebc(sb).values
            else:
                raise NotImplementedError(
                    "quantized EmbeddingCollection inference not yet supported"
                )
        return self._dmp.swapped.apply(
            {"params": dense_params, "injected": self._dmp._injected(pooled)},
            *args,
        )

    def predict(self, *args):
        """ref contract: inference_mode forward (modules.py:100-133)."""
        quant_tables = {
            key: q.quantized for key, q in self._quant_ebcs.items()
        }
        return self._jitted(quant_tables, self._dense_params, *args)

    __call__ = predict

    def batching_metadata(self) -> Dict[str, str]:
        """ref: PredictModule.batching_metadata (modules.py:100)."""
        out = {}
        for key, q in self._quant_ebcs.items():
            for t in q.tables:
                for f in t.feature_names:
                    out[f] = "sparse"
        return out

    def result_metadata(self) -> str:
        """ref: PredictModule.result_metadata."""
        return "dense"

    # -- export (the torch.package equivalent) ---------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat: Dict[str, np.ndarray] = {}
        from torchrec_tpu.optim.keyed import flatten_with_fqns

        for k, v in flatten_with_fqns(self._dense_params).items():
            flat[f"dense/{k}"] = np.asarray(v)
        manifest = {"quant": {}}
        for key, q in self._quant_ebcs.items():
            manifest["quant"][key] = {}
            for name, tab in q.quantized.items():
                flat[f"quant/{key}/{name}/data"] = np.asarray(tab.data)
                flat[f"quant/{key}/{name}/scale"] = np.asarray(tab.scale)
                flat[f"quant/{key}/{name}/shift"] = np.asarray(tab.shift)
                manifest["quant"][key][name] = {
                    "bits": tab.bits, "dim": tab.dim
                }
        np.savez(os.path.join(path, "arrays.npz"), **flat)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @staticmethod
    def load(path: str, dmp) -> "PredictModule":
        from torchrec_tpu.ops.quant import QuantizedTable
        from torchrec_tpu.optim.keyed import unflatten_from_fqns

        data = np.load(os.path.join(path, "arrays.npz"))
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        quant_ebcs = {}
        for key, tabs in manifest["quant"].items():
            quantized = {}
            for name, meta in tabs.items():
                quantized[name] = QuantizedTable(
                    data=jnp.asarray(data[f"quant/{key}/{name}/data"]),
                    scale=jnp.asarray(data[f"quant/{key}/{name}/scale"]),
                    shift=jnp.asarray(data[f"quant/{key}/{name}/shift"]),
                    bits=int(meta["bits"]),
                    dim=int(meta["dim"]),
                )
            ebc = dmp.sharded_ebcs[key]
            quant_ebcs[key] = QuantEmbeddingBagCollection(
                ebc.tables, quantized, ebc.is_weighted
            )
        # rebuild the dense param tree from the stored FQNs (flax param
        # trees are nested string-keyed dicts, so FQNs reconstruct exactly)
        dense_params: Dict[str, Any] = {}
        for k in data.files:
            if not k.startswith("dense/"):
                continue
            node = dense_params
            parts = k[len("dense/"):].split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(data[k])
        return PredictModule(dmp, dense_params, quant_ebcs)


class ShardedPredictModule(PredictModule):
    """Distributed quantized serving: each quant EBC runs as a
    `ShardedQuantEmbeddingBagCollection` over the inference mesh
    (TW-planned placements), the reference's §3.5 flow
    `DistributedModelParallel(quantized, env=ShardingEnv.from_local(...))`
    -> ShardedQuantEmbeddingBagCollection (quant_embeddingbag.py:62-256,
    model_parallel.py:43-47)."""

    def __init__(
        self,
        dmp,
        dense_params: Any,
        quant_ebcs: Dict[str, QuantEmbeddingBagCollection],
        env,
        table_ranks: Optional[Dict[str, Dict[str, int]]] = None,
    ):
        from torchrec_tpu.parallel.quant_sharded import (
            ShardedQuantEmbeddingBagCollection,
        )

        from jax.sharding import NamedSharding, PartitionSpec

        self._env = env
        self._sharded: Dict[str, ShardedQuantEmbeddingBagCollection] = {}
        for key, q in quant_ebcs.items():
            self._sharded[key] = ShardedQuantEmbeddingBagCollection(
                env,
                q.tables,
                q.quantized,
                table_ranks=(table_ranks or {}).get(key),
                is_weighted=q.is_weighted,
                max_feature_length=q.max_feature_length,
            )
        # dense params replicate onto the INFERENCE mesh (which may be a
        # different device set than the training mesh)
        rep = NamedSharding(env.mesh, PartitionSpec())
        dense_params = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), rep), dense_params
        )
        super().__init__(dmp, dense_params, quant_ebcs)

    def _forward(self, quant_arrays, dense_params, *args):
        sb = self._dmp._find_sparse_arg(args)
        pooled = {}
        for key, sq in self._sharded.items():
            pooled[key] = sq(sb, arrays=quant_arrays[key]).values
        return self._dmp.swapped.apply(
            {"params": dense_params, "injected": self._dmp._injected(pooled)},
            *args,
        )

    def predict(self, *args):
        quant_arrays = {
            key: (sq.data, sq.scale, sq.shift)
            for key, sq in self._sharded.items()
        }
        return self._jitted(quant_arrays, self._dense_params, *args)

    __call__ = predict


def _plan_quant_ranks(env, quant_ebcs) -> Dict[str, Dict[str, int]]:
    """Planned TABLE_WISE placement for quantized serving tables via the
    cost-model planner under the quant sharder's capability (TW only);
    round-robin fallback for toy topologies."""
    from torchrec_tpu.parallel.sharders import (
        QuantEmbeddingBagCollectionSharder,
    )
    from torchrec_tpu.planner import (
        EmbeddingShardingPlanner,
        ParameterConstraints,
        Topology,
    )
    from torchrec_tpu.planner.types import PlannerError

    sharder = QuantEmbeddingBagCollectionSharder()
    out: Dict[str, Dict[str, int]] = {}
    for key, q in quant_ebcs.items():
        try:
            topo = Topology(world_size=env.world_size)
            constraints = {
                t.name: ParameterConstraints(
                    sharding_types=sharder.sharding_types()
                )
                for t in q.tables
            }
            plan = EmbeddingShardingPlanner(
                topo, constraints=constraints
            ).plan(q.tables, module_path="m").plan["m"]
            out[key] = {
                name: (ps.ranks[0] if ps.ranks else 0)
                for name, ps in plan.items()
            }
        except PlannerError:
            out[key] = {
                t.name: i % env.world_size
                for i, t in enumerate(q.tables)
            }
    return out


def shard_quantized(
    pm: PredictModule,
    env,
    table_ranks: Optional[Dict[str, Dict[str, int]]] = None,
) -> ShardedPredictModule:
    """Shard a quantized PredictModule over an inference mesh — the
    explicit-entry equivalent of the reference's
    `DistributedModelParallel(quantized_model,
    env=ShardingEnv.from_local(world_size))` (ref SURVEY §3.5 call stack;
    quant_embeddingbag.py:62). Placements come from the planner
    constrained by QuantEmbeddingBagCollectionSharder unless given."""
    if table_ranks is None:
        table_ranks = _plan_quant_ranks(env, pm._quant_ebcs)
    return ShardedPredictModule(
        pm._dmp, pm._dense_params, pm._quant_ebcs, env, table_ranks
    )


class PredictFactory(abc.ABC):
    """ref: inference/modules.py:78 — the serving entry contract."""

    @abc.abstractmethod
    def create_predict_module(self) -> PredictModule: ...

    def batching_metadata(self) -> Dict[str, str]:
        return {}

    def result_metadata(self) -> str:
        return "dense"


def quantize_embeddings(
    dmp,
    state,
    data_type: DataType = DataType.INT8,
) -> PredictModule:
    """Trained DMP state -> quantized PredictModule
    (ref: inference/modules.py:18-46 quantize_embeddings +
    examples/dlrm/dlrm_predict.py)."""
    quant_ebcs: Dict[str, QuantEmbeddingBagCollection] = {}
    for key, ebc in dmp.sharded_ebcs.items():
        if dmp._kinds[key] != "ebc":
            continue
        weights = ebc.unshard_to_dense(state.emb_states[key])
        quant_ebcs[key] = QuantEmbeddingBagCollection.from_float(
            ebc.tables, weights, data_type, ebc.is_weighted
        )
    return PredictModule(dmp, state.dense_params, quant_ebcs)


class PredictFactoryPackager:
    """ref: inference/model_packager.py:46-99 — the reference exports a
    PredictFactory + configs through torch.package for torch.deploy.
    Here the archive is a directory: the factory's predict module saved
    as npz + manifest, plus a small factory manifest naming the factory
    class (the loading code is expected to be importable, exactly as the
    reference externs its interface modules)."""

    @classmethod
    def save_predict_factory(
        cls, factory: PredictFactory, path: str
    ) -> None:
        module = factory.create_predict_module()
        module.save(path)
        meta = {
            "factory_class": type(factory).__qualname__,
            "factory_module": type(factory).__module__,
            "batching_metadata": factory.batching_metadata(),
            "result_metadata": factory.result_metadata(),
        }
        with open(os.path.join(path, "factory.json"), "w") as f:
            json.dump(meta, f)

    @staticmethod
    def load_metadata(path: str) -> Dict[str, Any]:
        with open(os.path.join(path, "factory.json")) as f:
            return json.load(f)
