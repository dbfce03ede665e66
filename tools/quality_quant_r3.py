"""Quantized-serving accuracy evidence (VERDICT r2 item 7).

Trains DLRM on the calibrated synthetic-Criteo stream, quantizes the
embedding tables to INT8 and INT4 (`quantize_embeddings`), serves each
through `shard_quantized`, and reports AUROC of fp32 / int8 / int4 on
the SAME held-out eval stream — the accuracy cost of the serving path
(ref flow §3.5: train -> quantize -> shard -> serve,
quant_embeddingbag.py:62-256).

Usage (CPU smoke):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/quality_quant_r3.py --batch_size 256 --num_batches 50 \
      --max_ind_range 20000 --eval_batches 10
Real chip: drop the env overrides and raise the sizes
(tools/run_quality_r3.sh).

Prints a markdown table + one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=8192)
    p.add_argument("--num_batches", type=int, default=2000)
    p.add_argument("--eval_batches", type=int, default=40)
    p.add_argument("--max_ind_range", type=int, default=1_000_000)
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=1.0)
    p.add_argument("--dense_learning_rate", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from torchrec_tpu.datasets.synthetic_criteo import (
        CRITEO_KAGGLE_CARDINALITIES,
        INT_FEATURE_COUNT,
        SyntheticCriteoDataset,
    )
    from torchrec_tpu.inference.modules import (
        quantize_embeddings,
        shard_quantized,
    )
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.modules.embedding_configs import DataType
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.utils.metrics import auroc

    rows = [min(c, args.max_ind_range) for c in CRITEO_KAGGLE_CARDINALITIES]
    keys = [f"cat_{i}" for i in range(len(rows))]
    D = args.embedding_dim

    tables = tuple(
        EmbeddingBagConfig(num_embeddings=r, embedding_dim=D,
                           name=f"t{i}", feature_names=[keys[i]])
        for i, r in enumerate(rows)
    )
    model = DLRMTrain(dlrm=DLRM(
        embedding_bag_collection=EmbeddingBagCollection(
            tables=tables, max_feature_length=1),
        dense_in_features=INT_FEATURE_COUNT,
        dense_arch_layer_sizes=(512, 256, D),
        over_arch_layer_sizes=(1024, 1024, 512, 256, 1),
    ))
    env = ShardingEnv.from_devices()
    dmp = DistributedModelParallel(
        model, env=env,
        plan=ShardingPlan({"dlrm/embedding_bag_collection": {
            f"t{i}": ParameterSharding(ShardingType.ROW_WISE)
            for i in range(len(rows))
        }}),
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": args.learning_rate},
        dense_optimizer=optax.adagrad(args.dense_learning_rate),
    )

    def ds(seed):
        return SyntheticCriteoDataset(
            batch_size=args.batch_size, max_ind_range=args.max_ind_range,
            manual_seed=seed, keys=keys,
        )

    gen_fn = ds(args.seed).device_batch_fn()

    first = next(iter(ds(args.seed)))
    import jax.numpy as jnp  # noqa: F811

    b0 = (
        jnp.asarray(first.dense_features),
        first.sparse_features,
        jnp.asarray(first.labels),
    )
    state = dmp.init(jax.random.PRNGKey(args.seed), *b0)
    raw = dmp.make_train_step(jit=False)

    @partial(jax.jit, donate_argnums=(0,))
    def fused_step(state, key):
        b = gen_fn(jax.random.fold_in(key, state.step))
        return raw(state, b.dense_features, b.sparse_features, b.labels)

    key = jax.device_put(jax.random.PRNGKey(args.seed + 99))
    t0 = time.time()
    for i in range(args.num_batches):
        state, loss, _ = fused_step(state, key)
        if i % 25 == 24:
            # periodic host sync: an unbounded async dispatch queue
            # deadlocks the CPU backend's in-process collectives
            # (AwaitAndLogIfStuck); harmless on TPU
            float(loss)
    lf = float(loss)
    print(f"trained {args.num_batches} x {args.batch_size} in "
          f"{time.time() - t0:.0f}s, final loss {lf:.4f}", flush=True)

    # one held-out eval stream (different seed, same latent ground truth)
    eval_batches = []
    it = iter(ds(args.seed + 1000))
    for _ in range(args.eval_batches):
        b = next(it)
        eval_batches.append((
            jnp.asarray(b.dense_features),
            b.sparse_features,
            np.asarray(b.labels),
        ))

    def eval_auroc(predict_fn, tag):
        scores, labs = [], []
        for dense, sb, lab in eval_batches:
            logits = predict_fn(dense, sb)
            scores.append(np.asarray(jax.nn.sigmoid(logits)))
            labs.append(lab)
        a = auroc(np.concatenate(scores), np.concatenate(labs))
        print(f"{tag}: AUROC {a:.5f}", flush=True)
        return a

    labels0 = jnp.zeros((args.batch_size,), jnp.float32)
    fwd = jax.jit(lambda s, d, sb: dmp.forward(s, d, sb, labels0))

    def fp32_predict(dense, sb):
        _, (_, logits, _) = fwd(state, dense, sb)
        return logits

    out = {"fp32": eval_auroc(fp32_predict, "fp32")}

    for dt, tag in ((DataType.INT8, "int8"), (DataType.INT4, "int4")):
        pm = quantize_embeddings(dmp, state, dt)
        spm = shard_quantized(pm, ShardingEnv.from_local(env.world_size))

        def q_predict(dense, sb, spm=spm):
            _, (_, logits, _) = spm.predict(dense, sb, labels0)
            return logits

        out[tag] = eval_auroc(q_predict, f"{tag} served (sharded)")

    print("\n| serving path | AUROC | delta vs fp32 |")
    print("|---|---|---|")
    for tag in ("fp32", "int8", "int4"):
        print(f"| {tag} | {out[tag]:.5f} | "
              f"{out[tag] - out['fp32']:+.5f} |")
    print(json.dumps({
        "quality_quant_r3": {k: round(v, 5) for k, v in out.items()},
        "config": {"batch_size": args.batch_size,
                   "num_batches": args.num_batches,
                   "max_ind_range": args.max_ind_range,
                   "embedding_dim": D},
    }), flush=True)


if __name__ == "__main__":
    main()
