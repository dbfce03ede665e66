"""Benchmark: DLRM training throughput (examples/sec) on the local chip.

Config mirrors the reference's MLPerf DLRM shape (26 sparse features,
embedding_dim 128, dense 13 -> [512,256,128], over [1024,1024,512,256,1],
local batch 8192, Criteo L=1; ref examples/dlrm/README.MD:37-45).

Baseline: the reference's 8x A100-40GB MLPerf run = 5,497,159.68 rec/s
(BASELINE.md) = 687,145 rec/s per GPU. vs_baseline = ours_per_chip / that.
Optimizer parity note: the reference's MLPerf fused_params carry only
learning_rate (dlrm_main.py:524-528) -> fbgemm TBE default EXACT_SGD on
embeddings; the headline matches that. The suite ALSO measures:

  rowwise_adagrad  the TorchRec flagship optimizer at the same shapes
  zipf             Zipf(1.05) ids (duplicate-rich realistic batches)
  hbm_scale        tables grown to ~10 GiB total (~65% of chip HBM) --
                   page-locality-free row access; proves/refutes the
                   row-count-insensitivity claim
  lookup_roofline  achieved TBE fwd+update GB/s vs the 819 GB/s HBM
                   roofline (the BASELINE.md north-star kernel metric;
                   random 512B-row access is DISPATCH-bound on v5e, so
                   the fraction is far below the stream roofline -- the
                   number reported is the honest one)

Prints ONE JSON line (extra suites as nested keys). TORCHREC_BENCH_FAST=1
runs only the headline.
"""

import json
import os
import time

import numpy as np

NUM_TABLES = 26
ROWS = 100_000
HBM_ROWS = 700_000  # 26 x 700k x 128 x 4B = 8.7 GiB of tables
DIM = 128
DENSE_IN = 13
B = 8192
L = 1  # Criteo: exactly one id per feature
STEPS = 60
BASELINE_PER_GPU = 5_497_159.68 / 8.0


def _build(optim_name, rows):
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

    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=rows, embedding_dim=DIM, name=f"t{i}",
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
    optim = {
        "exact_sgd": EmbOptimType.EXACT_SGD,
        "rowwise_adagrad": EmbOptimType.ROWWISE_ADAGRAD,
    }[optim_name]
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_optim=optim,
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.05),
    )
    return dmp


def _throughput(dmp, rows, zipf_a=None):
    """Best-of-3 windows of STEPS fused generate+train steps."""
    import jax
    from functools import partial

    from torchrec_tpu.datasets.random import RandomRecDataset

    feats = [f"f{i}" for i in range(NUM_TABLES)]
    gen_fn = RandomRecDataset(
        keys=feats, batch_size=B, hash_sizes=[rows] * NUM_TABLES,
        ids_per_feature=L, num_dense=DENSE_IN, on_device=True,
        zipf_a=zipf_a,
    ).device_batch_fn()
    raw_step = dmp.make_train_step(jit=False)

    @partial(jax.jit, donate_argnums=(0,))
    def fused_step(state, key):
        b = gen_fn(jax.random.fold_in(key, state.step))
        return raw_step(
            state, b.dense_features, b.sparse_features, b.labels
        )

    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    from torchrec_tpu.sparse import KeyedJaggedTensor

    sb = KeyedJaggedTensor.from_lengths(
        feats,
        jnp.asarray(rng.randint(0, rows, NUM_TABLES * B).astype(np.int32)),
        jnp.asarray(np.ones((NUM_TABLES * B,), np.int32)),
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)

    key = jax.device_put(jax.random.PRNGKey(7))
    for _ in range(3):  # warmup / compile
        state, loss, _ = fused_step(state, key)
    float(loss)  # hard host sync (block_until_ready unreliable via relay)

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, loss, _ = fused_step(state, key)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    del state
    return STEPS * B / best_dt


def _lookup_roofline():
    """Achieved GB/s of the TBE fwd-gather + fused-update sequence at
    bench shapes vs the HBM roofline. Traffic = fwd row reads + update
    row RMW = 3 x N x D x 4 bytes (momentum side bytes negligible)."""
    import jax
    import jax.numpy as jnp

    from tools.tpu_timing import bench_chain
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    R = NUM_TABLES * ROWS
    N = NUM_TABLES * B
    rng = np.random.RandomState(0)
    ids0 = np.sort(rng.randint(0, R, N).astype(np.int32))
    w0 = jnp.zeros((R, DIM), jnp.float32) + 0.01
    ids_d = jnp.asarray(ids0)
    valid = jnp.ones((N,), bool)
    opt0 = init_fused_optimizer_state(R, DIM, EmbOptimType.ROWWISE_ADAGRAD)

    def step(c):
        w, opt, ids = c
        rows = w.at[ids].get(
            mode="fill", fill_value=0.0, indices_are_sorted=True
        )  # fwd gather
        g = rows * jnp.float32(1e-4)  # stand-in cotangent
        new_w, new_opt = apply_fused_update(
            w, opt, ids, g, valid, jnp.float32(0.01),
            stochastic_rounding=False,
        )
        bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
        return (new_w, new_opt, (ids + bump) % R)

    t = bench_chain(step, (w0, opt0, ids_d), k1=5, k2=25, donate=True)
    traffic = 3.0 * N * DIM * 4
    gbps = traffic / t / 1e9
    return {
        "tbe_fwd_update_gbps": round(gbps, 2),
        "hbm_roofline_gbps": 819.0,
        "fraction_of_roofline": round(gbps / 819.0, 4),
        "stream_copy_gbps_measured": 630.0,  # tools/bench_kernels.py r1
        "note": "random 512B-row access is per-row dispatch-bound on "
                "v5e (~26ns/row scatter, ~8.6ns/row gather), not "
                "bandwidth-bound",
    }


def main():
    fast = os.environ.get("TORCHREC_BENCH_FAST") == "1"
    # full-suite guard: always print the JSON line even if a harness
    # timeout looms — each extra suite only starts inside the budget
    # (the HBM config alone costs ~3 min of Pallas compile + 9 GiB of
    # relay uploads; full suite ~40 min measured r2)
    budget_s = float(os.environ.get("TORCHREC_BENCH_BUDGET_S", 3000))
    t_start = time.time()
    out = {}

    dmp = _build("exact_sgd", ROWS)
    ex_s = _throughput(dmp, ROWS)
    out.update(
        {
            "metric": "dlrm_train_examples_per_sec_per_chip",
            "value": round(ex_s, 1),
            "unit": "examples/s",
            "vs_baseline": round(ex_s / BASELINE_PER_GPU, 4),
        }
    )

    def in_budget(need_s):
        return not fast and time.time() - t_start < budget_s - need_s

    def suite(name, need_s, fn):
        """Optional suites never lose the already-measured headline:
        skipped out of budget, and exceptions are reported in-line."""
        if not in_budget(need_s):
            return
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)[:300]}

    def _rw():
        rw = _throughput(_build("rowwise_adagrad", ROWS), ROWS)
        return {
            "value": round(rw, 1),
            "vs_baseline": round(rw / BASELINE_PER_GPU, 4),
        }

    def _zipf():
        z = _throughput(_build("exact_sgd", ROWS), ROWS, zipf_a=1.05)
        return {
            "value": round(z, 1),
            "vs_baseline": round(z / BASELINE_PER_GPU, 4),
            "zipf_a": 1.05,
        }

    def _hbm():
        # (hbm_scale with Zipf ids measured within noise of uniform —
        # r2: 227k vs 229k — so only the uniform HBM suite runs)
        hbm = _throughput(_build("exact_sgd", HBM_ROWS), HBM_ROWS)
        return {
            "value": round(hbm, 1),
            "vs_baseline": round(hbm / BASELINE_PER_GPU, 4),
            "table_gib": round(
                NUM_TABLES * HBM_ROWS * DIM * 4 / 1024**3, 2
            ),
        }

    suite("rowwise_adagrad", 360, _rw)
    suite("zipf", 360, _zipf)
    suite("hbm_scale", 1200, _hbm)
    suite("lookup_roofline", 300, _lookup_roofline)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
