"""Author + execute the introduction notebook (repo-root
Torchrec_TPU_Introduction.ipynb).

Role parity with the reference's root-level Torchrec_Introduction.ipynb
(same tour: setup -> EmbeddingBagCollection -> KJT minibatch -> planner +
DistributedModelParallel -> querying the sharded model), retold for the
TPU design: device mesh instead of ProcessGroups, to_padded() instead of
offsets, one jitted step instead of pipelined streams, plus the quantized
serving epilogue. Run me to regenerate: outputs are baked by nbclient on
the virtual 8-device CPU mesh so the notebook renders complete without a
TPU attached.
"""

import os

import nbformat as nbf
from nbclient import NotebookClient

md = """\
# Intro to torchrec_tpu

**torchrec_tpu** is a TPU-native recommendation-systems framework: the
capabilities of TorchRec (sharded embedding tables, sparse-feature
plumbing, planners, quantized inference) re-designed around JAX, XLA and
`jax.sharding` instead of CUDA streams and ProcessGroups.

This tour mirrors the upstream *Intro to TorchRec* notebook:

1. distributed setup (a device **Mesh**, not process groups)
2. `EmbeddingBagCollection` — tables own features
3. minibatches as `KeyedJaggedTensor` → padded device layout
4. `DistributedModelParallel` — plan + shard + query
5. one jitted train step
6. epilogue: quantize + serve

No installation cell is needed: the repo is import-ready. Everything
below runs on a **virtual 8-device CPU mesh**, the same environment the
test suite uses; on real TPU hardware the identical code runs unchanged
(drop the two env vars).
"""

setup = """\
import os
# virtual 8-device mesh BEFORE importing jax (on a real TPU pod slice,
# skip these two lines)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

jax.devices()
"""

md_ebc = """\
## From EmbeddingBag to EmbeddingBagCollection

An `EmbeddingBagConfig` declares a pooled table and the features that
look it up; an `EmbeddingBagCollection` (EBC) owns a set of tables. This
is the same vocabulary as the reference — configs are dataclasses, the
module is flax."""

ebc = """\
from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection

ebc = EmbeddingBagCollection(
    tables=(
        EmbeddingBagConfig(
            name="product_table", embedding_dim=64, num_embeddings=4096,
            feature_names=["product"],
        ),
        EmbeddingBagConfig(
            name="user_table", embedding_dim=64, num_embeddings=4096,
            feature_names=["user"],
        ),
    )
)
[(t.name, t.num_embeddings, t.embedding_dim) for t in ebc.tables]
"""

md_kjt = """\
## Minibatches: KeyedJaggedTensor → padded device layout

Sparse features are ragged: each example has a variable number of ids
per feature. `KeyedJaggedTensor` (KJT) is the host-side container
(values + lengths, exactly the reference's layout). The TPU twist:
before a batch goes near `jit`, `.to_padded(L)` converts it to a
`PaddedSparseBatch` — a dense `[F, B, L]` id block plus a length mask —
so every step has **static shapes** and compiles exactly once. That
replaces the reference's two-phase (lengths-then-values) collective
machinery."""

kjt = """\
from torchrec_tpu.sparse import KeyedJaggedTensor

#        "product"             "user"
# ex0    [101, 202]            [7]
# ex1    [303]                 [8, 9]
kjt = KeyedJaggedTensor.from_lengths(
    keys=["product", "user"],
    values=jnp.asarray([101, 202, 303, 7, 8, 9], jnp.int32),
    lengths=jnp.asarray([2, 1, 1, 2], jnp.int32),
)
sb = kjt.to_padded(2)  # L budget = 2 ids per (feature, example)
print("ids [F, B, L]:\\n", sb.ids)
print("lengths [F, B]:\\n", sb.lengths)
"""

md_fwd = """\
Querying the (unsharded) EBC: flax `init` builds the tables, `apply`
pools each feature's ids. The result is a `KeyedTensor` view: one
`[B, D]` slab per feature."""

fwd = """\
params = ebc.init(jax.random.PRNGKey(0), sb)
pooled = ebc.apply(params, sb)           # KeyedTensor
print(pooled.to_dict()["product"].shape)  # [B=2, D=64]
"""

md_dmp = """\
## DistributedModelParallel

`DistributedModelParallel` (DMP) is the entry point, same as upstream:
give it a model + a `ShardingEnv` (here: a Mesh over all 8 devices) and
it plans and shards every embedding table — table-wise, row-wise,
column-wise, host-hierarchical, or data-parallel, chosen per-table by
the planner's cost model. Dense params are replicated (data-parallel).

The reference mutates your module tree in place (swapping sharded
modules under DDP); here sharding is **functional** — `dmp.init`
returns a sharded state pytree, and every update returns a new one."""

dmp_cell = """\
import optax
from torchrec_tpu.parallel import DistributedModelParallel, ShardingEnv
from torchrec_tpu.models.dlrm import DLRM, DLRMTrain

model = DLRMTrain(dlrm=DLRM(
    embedding_bag_collection=ebc,
    dense_in_features=13,
    dense_arch_layer_sizes=(32, 64),
    over_arch_layer_sizes=(32, 1),
))
env = ShardingEnv.from_devices(jax.devices())
dmp = DistributedModelParallel(
    model, env=env,
    fused_params={"learning_rate": 0.02},   # optimizer-in-backward
    dense_optimizer=optax.adam(1e-3),
)

B = 16  # GLOBAL batch (split over the 8 devices by the input dist)
def batch(seed):
    rng = np.random.RandomState(seed)
    dense = jnp.asarray(rng.randn(B, 13).astype(np.float32))
    sb = KeyedJaggedTensor.from_lengths(
        keys=["product", "user"],
        values=jnp.asarray(rng.randint(0, 4096, 2 * B), jnp.int32),
        lengths=jnp.ones((2 * B,), jnp.int32),
    ).to_padded(2)
    # learnable ground truth: click iff the first dense features agree
    labels = jnp.asarray(
        ((dense[:, 0] + dense[:, 1]) > 0).astype(np.float32)
    )
    return dense, sb, labels

state = dmp.init(jax.random.PRNGKey(0), *batch(0))
for key, sebc in dmp.sharded_ebcs.items():
    for g in sebc.groups:
        print(f"{key}: {list(g.features)} -> {g.sharding_type.value}")
"""

md_train = """\
## One jitted train step

The reference hides collectives in autograd-wrapped comm ops and
overlapping CUDA streams; here the whole step — input dist, lookups,
dense forward, loss, backward collectives, fused optimizer-in-backward
update — is **one jitted SPMD program**, and XLA's scheduler overlaps
the collectives with compute."""

train = """\
step = dmp.make_train_step()
losses = []
for i in range(40):
    state, loss, _ = step(state, *batch(i))
    losses.append(float(loss))
print([round(x, 4) for x in losses[::8]], "->", round(losses[-1], 4))
assert losses[-1] < losses[0]
"""

md_quant = """\
## Epilogue: quantize + serve

Trained tables quantize to int8/int4 rows (per-row scale+shift, the
IntNBit layout) and serve through `shard_quantized` over an inference
mesh — the reference's `DistributedModelParallel(quantized,
env=ShardingEnv.from_local(...))` flow. A native C++ batching queue
(`csrc/serving_queue.cpp`) coalesces ragged client requests into the
one static server batch the compiled predict program expects."""

quant = """\
from torchrec_tpu.inference import quantize_embeddings
from torchrec_tpu.modules.embedding_configs import DataType

predict_module = quantize_embeddings(dmp, state, DataType.INT8)
type(predict_module).__name__
"""

md_more = """\
## More resources

* `README.md` — architecture map and the design deltas vs the reference
* `MIGRATION.md` — coming from TorchRec: API-by-API translation,
  checkpoint import (`utils/torch_interop.py`)
* `examples/dlrm_main.py`, `examples/bert4rec_main.py` — full training
  CLIs (synthetic, Criteo, MovieLens)
* `examples/dlrm_predict.py` — quantized serving, `--serve_native` for
  the C++ TCP front
"""


def main():
    nb = nbf.v4.new_notebook()
    cells = [
        nbf.v4.new_markdown_cell(md),
        nbf.v4.new_code_cell(setup),
        nbf.v4.new_markdown_cell(md_ebc),
        nbf.v4.new_code_cell(ebc),
        nbf.v4.new_markdown_cell(md_kjt),
        nbf.v4.new_code_cell(kjt),
        nbf.v4.new_markdown_cell(md_fwd),
        nbf.v4.new_code_cell(fwd),
        nbf.v4.new_markdown_cell(md_dmp),
        nbf.v4.new_code_cell(dmp_cell),
        nbf.v4.new_markdown_cell(md_train),
        nbf.v4.new_code_cell(train),
        nbf.v4.new_markdown_cell(md_quant),
        nbf.v4.new_code_cell(quant),
        nbf.v4.new_markdown_cell(md_more),
    ]
    nb.cells = cells
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    client = NotebookClient(
        nb, timeout=1200, kernel_name="python3",
        resources={"metadata": {"path": repo}},
    )
    client.execute()
    out = os.path.join(repo, "Torchrec_TPU_Introduction.ipynb")
    nbf.write(nb, out)
    print("wrote", out)


if __name__ == "__main__":
    main()
