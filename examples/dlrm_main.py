"""DLRM training CLI.

ref: examples/dlrm/dlrm_main.py:448 — argparse CLI launched one process
per accelerator under torchrun; here ONE process drives the whole mesh
(JAX SPMD), so there is no launcher, no process group init, no
LOCAL_WORLD_SIZE plumbing.

Usage (synthetic smoke run):
  python examples/dlrm_main.py --synthetic --batch_size 256 --num_batches 50

Criteo (preprocessed npys, see torchrec_tpu/datasets/criteo.py):
  python examples/dlrm_main.py --in_memory_binary_criteo_path DIR \
      --num_embeddings_per_feature 45833188,36746,... --batch_size 8192
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from typing import List, Optional

import numpy as np


def parse_args(argv) -> argparse.Namespace:
    # flag names follow the reference CLI (dlrm_main.py:61-206)
    p = argparse.ArgumentParser(description="torchrec_tpu DLRM")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--num_batches", type=int, default=100,
                   help="synthetic batches per epoch")
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--dense_arch_layer_sizes", type=str, default="512,256,64")
    p.add_argument("--over_arch_layer_sizes", type=str,
                   default="512,512,256,1")
    p.add_argument("--num_embeddings", type=int, default=100_000)
    p.add_argument("--num_embeddings_per_feature", type=str, default=None)
    p.add_argument("--learning_rate", type=float, default=1.0)
    p.add_argument("--dense_learning_rate", type=float, default=0.1)
    p.add_argument("--lr_change_point", type=int, default=None,
                   help="step at which the embedding lr drops "
                        "(ref: dlrm_main.py:346-353)")
    p.add_argument("--lr_after_change_point", type=float, default=None)
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_criteo", action="store_true",
                   help="Criteo-Kaggle-calibrated synthetic stream: "
                        "published per-feature cardinalities, Zipf ids, "
                        "logistic ground truth at the published CTR "
                        "(datasets/synthetic_criteo.py; real Criteo is "
                        "unreachable without network egress)")
    p.add_argument("--max_ind_range", type=int, default=1_000_000,
                   help="cap per-feature cardinality (ref dlrm CLI flag)")
    p.add_argument("--zipf_a", type=float, default=1.05)
    p.add_argument("--in_memory_binary_criteo_path", type=str, default=None)
    p.add_argument("--undersampled_rate", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tpu_gen", type=str, default="v5e")
    p.add_argument("--dense_dtype", type=str, default="fp32",
                   choices=["fp32", "bf16"],
                   help="compute dtype of the dense arches (bf16 = the "
                        "TPU analogue of the reference's TF32)")
    p.add_argument("--shuffle_batches", action="store_true")
    p.add_argument("--mmap_mode", action="store_true",
                   help="memory-map the Criteo npy files instead of "
                        "loading them into RAM (ref dlrm CLI flag)")
    p.add_argument("--validation_freq_within_epoch", type=int, default=None)
    p.add_argument("--train_pipeline", type=str, default="base",
                   choices=["base", "sparse_dist"],
                   help="loader-path pipeline: 'sparse_dist' fuses batch "
                        "i+1's sparse input dist into batch i's step (the "
                        "reference's TRAIN_PIPELINE_STAGES=3 overlap, ref "
                        "examples/dlrm/dlrm_main.py:58)")
    p.add_argument("--save_dir", type=str, default=None,
                   help="write a re-shardable checkpoint after training "
                        "(ref: state_dict checkpointing)")
    p.add_argument("--package_dir", type=str, default=None,
                   help="export a quantized int8 serving package "
                        "(ref: examples/dlrm/dlrm_packager.py)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host launch: jax.distributed.initialize() "
                        "in every per-host process, host-contiguous mesh "
                        "over all hosts' chips, local_size = "
                        "jax.local_device_count() (ref: the torchrun "
                        "env-driven launch, comm.py:31-99)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for --multihost (TPU "
                        "pods auto-discover when omitted)")
    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> dict:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp
    import optax

    from torchrec_tpu.datasets.criteo import (
        CAT_FEATURE_COUNT,
        DEFAULT_CAT_NAMES,
        INT_FEATURE_COUNT,
        InMemoryBinaryCriteoIterDataPipe,
    )
    from torchrec_tpu.datasets.random import RandomRecDataset
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import DistributedModelParallel, ShardingEnv
    from torchrec_tpu.parallel.train_pipeline import TrainPipeline
    from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology
    from torchrec_tpu.utils.metrics import accuracy, auroc

    if args.multihost:
        env = ShardingEnv.from_distributed(
            coordinator_address=args.coordinator_address
        )
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}"
            f" up, {env.num_hosts} hosts x {env.local_size} chips"
        )
    else:
        env = ShardingEnv.from_devices()
    world = env.world_size

    if args.num_embeddings_per_feature:
        rows_per_feature = [
            int(x) for x in args.num_embeddings_per_feature.split(",")
        ]
    elif args.synthetic_criteo:
        from torchrec_tpu.datasets.synthetic_criteo import (
            CRITEO_KAGGLE_CARDINALITIES,
        )

        rows_per_feature = [
            min(c, args.max_ind_range) for c in CRITEO_KAGGLE_CARDINALITIES
        ]
    else:
        rows_per_feature = [args.num_embeddings] * CAT_FEATURE_COUNT

    keys = DEFAULT_CAT_NAMES[: len(rows_per_feature)]
    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=rows_per_feature[i],
            embedding_dim=args.embedding_dim,
            name=f"t_{keys[i]}",
            feature_names=[keys[i]],
        )
        for i in range(len(keys))
    )
    dense_sizes = tuple(int(x) for x in args.dense_arch_layer_sizes.split(","))
    over_sizes = tuple(int(x) for x in args.over_arch_layer_sizes.split(","))
    model = DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=tables, max_feature_length=1
            ),
            dense_in_features=INT_FEATURE_COUNT,
            dense_arch_layer_sizes=dense_sizes,
            over_arch_layer_sizes=over_sizes,
            dense_dtype=jnp.bfloat16 if args.dense_dtype == "bf16" else None,
        )
    )

    # plan via the cost-model planner (ref: DMP's collective_plan default)
    topo = Topology(
        world_size=world, tpu_gen=args.tpu_gen, batch_size=args.batch_size
    )
    planner = EmbeddingShardingPlanner(topo)
    plan = planner.plan(
        tables, module_path="dlrm/embedding_bag_collection"
    )
    if planner.last_stats:
        # placement/memory table (ref: planner EmbeddingStats,
        # planner/stats.py:30-332 prints the same at plan time)
        print(planner.last_stats)
    dmp = DistributedModelParallel(
        model,
        env=env,
        plan=plan,
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={
            "learning_rate": args.learning_rate,
            "eps": args.eps,
            # step-function lr schedule (ref: dlrm_main.py:346-353)
            **(
                {
                    "lr_schedule": lambda step: jnp.where(
                        step < args.lr_change_point,
                        args.learning_rate,
                        args.lr_after_change_point,
                    )
                }
                if args.lr_change_point is not None
                else {}
            ),
        },
        dense_optimizer=optax.sgd(args.dense_learning_rate),
    )

    def make_loader(stage: str):
        if args.in_memory_binary_criteo_path:
            import glob
            import os

            d = sorted(glob.glob(os.path.join(
                args.in_memory_binary_criteo_path, "*_dense.npy")))
            s = sorted(glob.glob(os.path.join(
                args.in_memory_binary_criteo_path, "*_sparse.npy")))
            l = sorted(glob.glob(os.path.join(
                args.in_memory_binary_criteo_path, "*_labels.npy")))
            return InMemoryBinaryCriteoIterDataPipe(
                d, s, l,
                batch_size=args.batch_size,
                hashes=rows_per_feature,
                shuffle_batches=args.shuffle_batches and stage == "train",
                seed=args.seed,
                mmap_mode=args.mmap_mode,
                undersampling_rate=(
                    args.undersampled_rate if stage == "train" else None
                ),
            )
        if args.synthetic_criteo:
            from torchrec_tpu.datasets.synthetic_criteo import (
                SyntheticCriteoDataset,
            )

            return SyntheticCriteoDataset(
                batch_size=args.batch_size,
                cardinalities=rows_per_feature,
                keys=keys,
                zipf_a=args.zipf_a,
                num_batches=(
                    args.num_batches if stage == "train"
                    else max(args.num_batches // 10, 4)
                ),
                manual_seed=args.seed + (0 if stage == "train" else 7919),
            )
        return RandomRecDataset(
            keys=keys,
            batch_size=args.batch_size,
            hash_sizes=rows_per_feature,
            ids_per_feature=1,
            num_dense=INT_FEATURE_COUNT,
            num_batches=args.num_batches,
            manual_seed=args.seed + (0 if stage == "train" else 1),
            on_device=True,  # synthetic data straight into device memory
        )

    def batch_args(batch):
        return (batch.dense_features, batch.sparse_features, batch.labels)

    # make_eval_fn keeps UVM host staging outside the jitted region, so
    # eval works on plans that offload tables to host RAM
    _eval_inner = dmp.make_eval_fn()
    eval_fwd = lambda state, batch: _eval_inner(state, *batch_args(batch))

    first = next(iter(make_loader("train")))
    state = dmp.init(jax.random.PRNGKey(args.seed), *batch_args(first))

    if args.synthetic or args.synthetic_criteo:
        # batch generation fused INTO the train step: one executable per
        # iteration (executable switches are expensive on remote TPUs)
        gen_fn = make_loader("train").device_batch_fn()
        raw = dmp.make_train_step(jit=False)

        @partial(jax.jit, donate_argnums=(0,))
        def fused_step(state, key):
            # derive the batch from the CARRIED step counter: every
            # argument is device-resident, zero per-iteration transfers
            batch = gen_fn(jax.random.fold_in(key, state.step))
            return raw(state, *batch_args(batch))

    else:
        jit_step = dmp.make_train_step()

        def train_step(state, batch):
            return jit_step(state, *batch_args(batch))

    # compile warmup outside the throughput window (first call compiles)
    if args.synthetic or args.synthetic_criteo:
        _k0 = jax.device_put(jax.random.PRNGKey(args.seed - 1))
        state, _l, _ = fused_step(state, _k0)
        float(_l)

    def run_validation(cur_state, tag):
        scores, labels = [], []
        for batch in make_loader("val"):
            _, (_, logits, lab) = eval_fwd(cur_state, batch)
            scores.append(np.asarray(jax.nn.sigmoid(logits)))
            labels.append(np.asarray(lab))
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        res = {
            "auroc": auroc(scores, labels),
            "accuracy": accuracy(scores, labels),
        }
        print(f"{tag}: val AUROC {res['auroc']:.5f} "
              f"accuracy {res['accuracy']:.5f}")
        return res

    vfreq = args.validation_freq_within_epoch
    results = {}
    pipe = None
    if not (args.synthetic or args.synthetic_criteo):
        # ONE pipeline across epochs: its jitted step compiles once (a
        # fresh pipeline per epoch would retrace + recompile the fused
        # program every epoch); it carries the train state itself
        if args.train_pipeline == "sparse_dist":
            from torchrec_tpu.parallel.train_pipeline import (
                SparseDistPipeline,
            )

            pipe = SparseDistPipeline(dmp, state)
        else:
            pipe = TrainPipeline(train_step, state)
    for epoch in range(args.epochs):
        n, t0 = 0, time.perf_counter()
        losses = []
        if args.synthetic or args.synthetic_criteo:
            key = jax.device_put(jax.random.PRNGKey(args.seed + 17 * epoch))
            for i in range(args.num_batches):
                state, loss, _ = fused_step(state, key)
                n += 1
                if n % 50 == 0:
                    losses.append(float(loss))
                if vfreq and n % vfreq == 0:
                    run_validation(state, f"epoch {epoch} it {n}")
            float(loss)  # hard sync before timing
        else:
            it = (
                (batch_args(b) for b in make_loader("train"))
                if args.train_pipeline == "sparse_dist"
                else iter(make_loader("train"))
            )
            while True:
                try:
                    loss, _ = pipe.progress(it)
                except StopIteration:
                    break
                n += 1
                if n % 50 == 0:
                    losses.append(float(loss))
                if vfreq and n % vfreq == 0:
                    run_validation(pipe.state, f"epoch {epoch} it {n}")
            state = pipe.state
            float(loss)
        dt = time.perf_counter() - t0
        throughput = n * args.batch_size / dt
        print(
            f"epoch {epoch}: {n} it, {throughput:,.0f} examples/s, "
            f"loss tail {losses[-3:] if losses else [float(loss)]}"
        )

        # evaluation (ref: _evaluate, dlrm_main.py:209-269)
        results = run_validation(state, f"epoch {epoch}")
        results["throughput"] = throughput

    if args.save_dir:
        from torchrec_tpu.utils.checkpoint import save_reshardable

        save_reshardable(args.save_dir, dmp, state)
        print(f"checkpoint written to {args.save_dir}")

    if args.package_dir:
        from torchrec_tpu.inference import quantize_embeddings
        from torchrec_tpu.modules.embedding_configs import DataType

        pm = quantize_embeddings(dmp, state, DataType.INT8)
        pm.save(args.package_dir)
        print(f"serving package written to {args.package_dir}")
    return results


if __name__ == "__main__":
    main()
