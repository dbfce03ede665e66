"""Author + execute examples/Sharding_And_UVM.ipynb.

Role parity with the reference's examples/sharding/uvm.ipynb (distributed
setup -> UVM -> UVM caching), widened into the sharding tour that
notebook assumes: explicit per-table plans across the sharding types,
the cost-model planner's placement stats, then host-offloaded tables
via FUSED_UVM_CACHING with cache statistics. Outputs are baked on the
virtual 8-device CPU mesh by nbclient; regenerate by running this file.
"""

import os

import nbformat as nbf
from nbclient import NotebookClient

md_top = """\
# Sharding & UVM tour

How torchrec_tpu places embedding tables across a device mesh, and how
tables larger than HBM stay trainable via host offload (the reference's
UVM / UVM-caching story, re-designed for TPU).

Sections:

1. explicit plans — pick a `ShardingType` per table
2. the planner — cost-model placement + stats table
3. UVM: `FUSED_UVM_CACHING` — host-resident rows, device cache

Runs on a virtual 8-device CPU mesh (identical code on real TPUs)."""

setup = """\
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.models.dlrm import DLRM, DLRMTrain
from torchrec_tpu.parallel import (
    DistributedModelParallel, ParameterSharding, ShardingEnv,
    ShardingPlan, ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

len(jax.devices())
"""

md_types = """\
## 1. Explicit plans

A `ShardingPlan` maps each table to a `ParameterSharding`. The six types
are the reference's vocabulary: `TABLE_WISE` (whole table on one
device), `ROW_WISE` (rows split across all), `COLUMN_WISE` (columns
split), `DATA_PARALLEL` (replicated, gradient-synced), and the
host-hierarchical `TABLE_ROW_WISE` / `TABLE_COLUMN_WISE`. Collectives
differ per type — RW pools partial sums with a `reduce_scatter`, TW
ships pooled slabs with an `all_to_all` — but all of them live inside
the one jitted step."""

types_cell = """\
F, B, L, D = 4, 16, 2, 32
keys = [f"f{i}" for i in range(F)]
tables = tuple(
    EmbeddingBagConfig(name=f"t{i}", embedding_dim=D,
                       num_embeddings=512 * (i + 1),
                       feature_names=[keys[i]])
    for i in range(F)
)
model = DLRMTrain(dlrm=DLRM(
    embedding_bag_collection=EmbeddingBagCollection(
        tables=tables, max_feature_length=L),
    dense_in_features=8,
    dense_arch_layer_sizes=(16, D),
    over_arch_layer_sizes=(16, 1),
))

plan = ShardingPlan({"dlrm/embedding_bag_collection": {
    "t0": ParameterSharding(ShardingType.TABLE_WISE, ranks=[3]),
    "t1": ParameterSharding(ShardingType.ROW_WISE),
    "t2": ParameterSharding(ShardingType.COLUMN_WISE),
    "t3": ParameterSharding(ShardingType.DATA_PARALLEL),
}})
env = ShardingEnv.from_devices(jax.devices())
dmp = DistributedModelParallel(
    model, env=env, plan=plan,
    fused_params={"learning_rate": 0.05},
    dense_optimizer=optax.adam(1e-3),
)

def batch(seed):
    rng = np.random.RandomState(seed)
    sb = KeyedJaggedTensor.from_lengths(
        keys=keys,
        values=jnp.asarray(
            np.concatenate([rng.randint(0, t.num_embeddings, B * L)
                            for t in tables]).astype(np.int32)),
        lengths=jnp.full((F * B,), L, jnp.int32),
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, 8).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    return dense, sb, labels

state = dmp.init(jax.random.PRNGKey(0), *batch(0))
step = dmp.make_train_step()
for i in range(3):
    state, loss, _ = step(state, *batch(i))
print("3 steps, loss", round(float(loss), 4))
for sebc in dmp.sharded_ebcs.values():
    for g in sebc.groups:
        print(f"  {[t.name for t in g.tables]} -> {g.sharding_type.value}")
"""

md_planner = """\
## 2. The planner

Without an explicit plan, `EmbeddingShardingPlanner` enumerates
candidate shardings per table, rates them with a **measured** cost model
(gather/scatter/collective constants benchmarked on v5e —
`ops/cost_model.py`), packs them onto the topology, and prints the same
placement/memory stats table the reference's `EmbeddingStats` does."""

planner_cell = """\
from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology

big_tables = tuple(
    EmbeddingBagConfig(name=f"big{i}", embedding_dim=64,
                       num_embeddings=n, feature_names=[f"bf{i}"])
    for i, n in enumerate([4_000_000, 120_000, 9_000, 64])
)
topo = Topology(world_size=8, tpu_gen="v5e", batch_size=4096)
planner = EmbeddingShardingPlanner(topo)
auto_plan = planner.plan(big_tables, module_path="m")
print(planner.last_stats)
"""

md_uvm = """\
## 3. UVM: tables bigger than HBM

The reference parks huge tables in host memory via CUDA unified memory
(`EmbeddingLocation.MANAGED`) and caches hot rows on-device
(`MANAGED_CACHING`). The TPU redesign keeps the same contract with
explicit machinery: a `FUSED_UVM_CACHING` table lives in host RAM; each
step stages the batch's rows through a device-side cache
(`ops/uvm_cache.py`), the fused update writes back, and `cache_stats()`
reports hit rates. Planner support, checkpointing and `state_dict`
treat UVM tables like any other."""

uvm_cell = """\
from torchrec_tpu.parallel.types import ComputeKernel

uvm_plan = ShardingPlan({"dlrm/embedding_bag_collection": {
    "t0": ParameterSharding(ShardingType.ROW_WISE),
    "t1": ParameterSharding(         # host-resident + device cache
        ShardingType.TABLE_WISE,
        compute_kernel=ComputeKernel.FUSED_UVM_CACHING, ranks=[0],
    ),
    "t2": ParameterSharding(ShardingType.ROW_WISE),
    "t3": ParameterSharding(ShardingType.ROW_WISE),
}})
dmp_uvm = DistributedModelParallel(
    model, env=env, plan=uvm_plan,
    fused_params={"learning_rate": 0.05},
    dense_optimizer=optax.adam(1e-3),
)
state_u = dmp_uvm.init(jax.random.PRNGKey(0), *batch(0))
step_u = dmp_uvm.make_train_step()
for i in range(5):
    state_u, loss_u, _ = step_u(state_u, *batch(i))
print("5 UVM steps, loss", round(float(loss_u), 4))
for key, mod in dmp_uvm._uvm_mods.items():
    for t, stats in mod.cache_stats().items():
        print(f"  uvm cache[{t}]:", stats)
"""

md_close = """\
On real hardware the planner decides this for you: its storage
estimator reserves HBM, and tables that do not fit are planned onto
`FUSED_UVM_CACHING` automatically (`--uvm` paths in
`examples/dlrm_main.py`). See `tests/test_uvm_cache.py` for the cache's
eviction/writeback semantics and `utils/checkpoint.py` for UVM-aware
save/restore."""


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [
        nbf.v4.new_markdown_cell(md_top),
        nbf.v4.new_code_cell(setup),
        nbf.v4.new_markdown_cell(md_types),
        nbf.v4.new_code_cell(types_cell),
        nbf.v4.new_markdown_cell(md_planner),
        nbf.v4.new_code_cell(planner_cell),
        nbf.v4.new_markdown_cell(md_uvm),
        nbf.v4.new_code_cell(uvm_cell),
        nbf.v4.new_markdown_cell(md_close),
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    client = NotebookClient(
        nb, timeout=1200, kernel_name="python3",
        resources={"metadata": {"path": repo}},
    )
    client.execute()
    out = os.path.join(repo, "examples", "Sharding_And_UVM.ipynb")
    nbf.write(nb, out)
    print("wrote", out)


if __name__ == "__main__":
    main()
