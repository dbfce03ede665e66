"""Chip-scale learning check: DLRM learns a synthetic click function at
B=8192 with the fused on-device generation pattern."""
import jax, jax.numpy as jnp, numpy as np, optax
from functools import partial
from torchrec_tpu.models import DLRM, DLRMTrain
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (DistributedModelParallel, ParameterSharding, ShardingEnv, ShardingPlan, ShardingType)
from torchrec_tpu.sparse import KeyedJaggedTensor, PaddedSparseBatch
from torchrec_tpu.utils.metrics import auroc
from torchrec_tpu.datasets.utils import Batch

F, B, ROWS, D = 8, 8192, 50_000, 64
keys_ = [f"f{i}" for i in range(F)]
tables = tuple(EmbeddingBagConfig(num_embeddings=ROWS, embedding_dim=D, name=f"t{i}", feature_names=[keys_[i]]) for i in range(F))
model = DLRMTrain(dlrm=DLRM(
    embedding_bag_collection=EmbeddingBagCollection(tables=tables, max_feature_length=1),
    dense_in_features=4, dense_arch_layer_sizes=(64, D), over_arch_layer_sizes=(128, 64, 1),
    dense_dtype=jnp.bfloat16))
env = ShardingEnv.from_devices(jax.devices()[:1])
plan = ShardingPlan({"dlrm/embedding_bag_collection": {t.name: ParameterSharding(ShardingType.ROW_WISE) for t in tables}})
dmp = DistributedModelParallel(model, env=env, plan=plan,
    fused_optim=EmbOptimType.ROWWISE_ADAGRAD, fused_params={"learning_rate": 0.05},
    dense_optimizer=optax.adam(2e-3))

# hidden per-id scores drive clicks (uploaded once)
rng = np.random.RandomState(0)
bias = jnp.asarray(rng.randn(F, ROWS).astype(np.float32) * 1.2)

def gen(key):
    k1, k2, k3 = jax.random.split(key, 3)
    ids = jax.random.randint(k1, (F, B, 1), 0, ROWS, dtype=jnp.int32)
    logit = jnp.sum(bias[jnp.arange(F)[:, None], ids[:, :, 0]], axis=0)
    labels = (jax.random.uniform(k2, (B,)) < jax.nn.sigmoid(logit)).astype(jnp.float32)
    dense = jax.random.normal(k3, (B, 4), jnp.float32)
    sb = PaddedSparseBatch(ids=ids, lengths=jnp.ones((F, B), jnp.int32), keys=tuple(keys_))
    return dense, sb, labels

raw = dmp.make_train_step(jit=False)

@partial(jax.jit, donate_argnums=(0,))
def step(state, key):
    d, sb, lab = gen(jax.random.fold_in(key, state.step))
    return raw(state, d, sb, lab)

d0, sb0, lab0 = jax.jit(gen)(jax.random.PRNGKey(1))
state = dmp.init(jax.random.PRNGKey(0), d0, sb0, lab0)
key = jax.device_put(jax.random.PRNGKey(42))
import time
state, loss, _ = step(state, key); float(loss)
t0 = time.perf_counter()
for i in range(800):
    state, loss, _ = step(state, key)
float(loss)
dt = time.perf_counter() - t0
# held-out eval
dh, sbh, labh = jax.jit(gen)(jax.random.PRNGKey(777))
_, (_, logits, _) = dmp.forward(state, dh, sbh, labh)
score = auroc(np.asarray(jax.nn.sigmoid(logits)), np.asarray(labh))
print(f"800 steps @ {800*B/dt:,.0f} ex/s; final loss {float(loss):.4f}; held-out AUROC {score:.4f}")
