#!/usr/bin/env python3
"""Installation smoke check (role parity with the reference's root
test_installation.py: build a small DLRM, shard it with
DistributedModelParallel, train a few steps on random batches, print
throughput). Runs anywhere: with no TPU attached it uses a virtual
8-device CPU mesh.

    python test_installation.py
"""

import os
import sys
import time


def main() -> int:
    # fall back to a virtual CPU mesh unless a TPU plugin is actually
    # wired up (JAX_PLATFORMS may name a plugin whose transport is absent)
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from torchrec_tpu.models.dlrm import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.parallel import DistributedModelParallel, ShardingEnv
    from torchrec_tpu.sparse import KeyedJaggedTensor

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")

    B, F, L, D, E = 128, 8, 3, 32, 10_000
    keys = [f"feature{i}" for i in range(F)]
    tables = tuple(
        EmbeddingBagConfig(
            name=f"table{i}", embedding_dim=D, num_embeddings=E,
            feature_names=[keys[i]],
        )
        for i in range(F)
    )
    model = DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=tables, max_feature_length=L
            ),
            dense_in_features=16,
            dense_arch_layer_sizes=(64, D),
            over_arch_layer_sizes=(64, 1),
        )
    )
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(devices),
        fused_params={"learning_rate": 0.05},
        dense_optimizer=optax.adam(1e-3),
    )

    def batch(seed):
        rng = np.random.RandomState(seed)
        sb = KeyedJaggedTensor.from_lengths(
            keys,
            jnp.asarray(rng.randint(0, E, F * B * L).astype(np.int32)),
            jnp.full((F * B,), L, jnp.int32),
        ).to_padded(L)
        dense = jnp.asarray(rng.randn(B, 16).astype(np.float32))
        labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
        return dense, sb, labels

    state = dmp.init(jax.random.PRNGKey(0), *batch(0))
    step = dmp.make_train_step()
    state, loss0, _ = step(state, *batch(0))  # compile
    float(loss0)
    t0 = time.perf_counter()
    n_steps = 10
    for i in range(1, n_steps + 1):
        state, loss, _ = step(state, *batch(i))
    loss = float(loss)
    dt = time.perf_counter() - t0
    if not np.isfinite(loss):
        print(f"FAILED: non-finite loss {loss}")
        return 1
    print(
        f"trained {n_steps} steps, loss {loss:.4f}, "
        f"{n_steps * B / dt:,.0f} examples/s"
    )
    print("Installation OK: torchrec_tpu trains a sharded DLRM.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
