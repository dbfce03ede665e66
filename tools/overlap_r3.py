"""Input-dist overlap evidence (VERDICT r2 item 6).

The reference hides batch i+1's sparse input dist behind batch i's
compute with a dedicated CUDA stream + a 3-stage pipeline
(train_pipeline.py:422-536). Our design fuses everything into ONE jitted
step and asserts "XLA schedules the collectives asynchronously". This
tool turns that assertion into evidence, two ways:

mode=hlo (runs anywhere, incl. the 8-device CPU mesh):
  compile the full distributed train step, walk the optimized HLO, and
  for every async collective pair (all-gather-start/-done, etc.) count
  the non-collective instructions scheduled BETWEEN start and done —
  i.e. compute available to hide the collective's latency. Reports
  per-collective overlap-window sizes.

mode=trace (real chip):
  profile STEPS fused steps, parse the XLA Ops lane (deduped by
  (name, ts) — events duplicate across rows), and report the fraction
  of step time in embedding/input-dist ops vs dense MXU ops vs
  overlapped DMA.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/overlap_r3.py --mode hlo
  python tools/overlap_r3.py --mode trace   # on the chip
"""

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _build_step(n_devices):
    import jax
    import optax

    import __graft_entry__ as ge
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )

    env = ShardingEnv.from_devices(jax.devices()[:n_devices])
    num_tables, dim, dense_in, L = 5, 8 * n_devices, 13, 2
    rows = [max(64, 16 * n_devices), 50, 40, 30, max(64, 16 * n_devices)]
    B = 2 * n_devices
    model, _ = ge._make_model(num_tables, rows, dim, dense_in, L)
    plan = ShardingPlan({
        "dlrm/embedding_bag_collection": {
            "t0": ParameterSharding(ShardingType.ROW_WISE),
            "t1": ParameterSharding(
                ShardingType.TABLE_WISE, ranks=[n_devices - 1]
            ),
            "t2": ParameterSharding(ShardingType.COLUMN_WISE),
            "t3": ParameterSharding(ShardingType.DATA_PARALLEL),
            "t4": ParameterSharding(ShardingType.TABLE_ROW_WISE, host=0),
        }
    })
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.05),
    )
    batch = ge._make_batch(num_tables, rows, dense_in, B, L)
    import jax as _j

    state = dmp.init(_j.random.PRNGKey(0), *batch)
    step = dmp.make_train_step(donate=False, jit=False)
    return step, state, batch, dmp


def mode_hlo(n_devices, prefetch=False):
    import jax

    step, state, batch, dmp = _build_step(n_devices)
    if prefetch:
        # the fused two-batch program: batch i's step + batch i+1's id
        # all_gather with NO dependency between them — the start..done
        # window of the prefetch gathers should span the dense compute
        sb = batch[1]
        dists = jax.jit(dmp.input_dist)(sb)
        pstep = dmp.make_prefetched_train_step(donate=False, jit=False)
        lowered = jax.jit(pstep).lower(state, dists, sb, *batch)
    else:
        lowered = jax.jit(step).lower(state, *batch)
    hlo = lowered.compile().as_text()
    lines = hlo.splitlines()

    # map async start/done pairs by result name: HLO lines read
    #   %name = TYPE all-gather-start(...), and later
    #   %other = TYPE all-gather-done(%name)
    # result types of async starts are TUPLES — '(f32[...], f32[...])'
    # contains spaces, so match lazily up to the op name
    start_re = re.compile(
        r"%?([\w.\-]+)\s*=\s*.*?\s(all-gather-start|all-reduce-start|"
        r"all-to-all-start|reduce-scatter-start|"
        r"collective-permute-start|async-start)\b"
    )
    done_re = re.compile(
        r"(all-gather-done|all-reduce-done|all-to-all-done|"
        r"reduce-scatter-done|collective-permute-done|"
        r"async-done)\(\s*%?([\w.\-]+)"
    )
    pairs = []  # (start_line_idx, done_line_idx, kind)
    starts = {}
    for i, ln in enumerate(lines):
        m = start_re.search(ln)
        if m:
            starts[m.group(1)] = (i, m.group(2))
        dm = done_re.search(ln)
        if dm and dm.group(2) in starts:
            si, kind = starts.pop(dm.group(2))
            pairs.append((si, i, kind))

    n_coll = len(
        [ln for ln in lines
         if re.search(r"\s(all-gather|all-reduce|all-to-all|"
                      r"reduce-scatter|collective-permute)[\w\-]*\(", ln)]
    )
    print(f"optimized HLO: {len(lines)} lines, "
          f"{n_coll} collective instructions, "
          f"{len(pairs)} async start/done pairs")
    if not pairs:
        print("NO async collective pairs found — collectives are "
              "synchronous in this HLO (CPU backend lowers collectives "
              "synchronously; rerun on TPU for the scheduled form).")
        return
    windows = []
    for si, di, kind in pairs:
        between = di - si - 1
        windows.append(between)
        print(f"  {kind}: {between} instructions scheduled inside the "
              "start..done window")
    print(f"median overlap window: {int(np.median(windows))} "
          "instructions — nonzero windows mean XLA hides collective "
          "latency behind compute, the TPU-native replacement for the "
          "reference's comms stream")


def mode_trace(steps=20):
    import glob
    import os
    import tempfile
    import time

    import jax

    step, state, batch, _ = _build_step(1)
    jstep = jax.jit(step)
    state, loss, _ = jstep(state, *batch)
    float(loss)

    tmp = tempfile.mkdtemp(prefix="overlap_r3_")
    with jax.profiler.trace(tmp):
        for _ in range(steps):
            state, loss, _ = jstep(state, *batch)
        float(loss)
    time.sleep(1)
    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print(f"no trace found under {tmp}")
        return
    from tools.parse_trace import load_ops

    ops = load_ops(tmp)  # deduped (name, ts) XLA Ops lane (DIR arg)
    tot = sum(d for _, d in ops)
    if not tot:
        print(f"trace parsed but no XLA Ops lane events under {tmp}")
        return
    emb = sum(d for n, d in ops
              if re.search(r"gather|scatter|sort|dynamic", n, re.I))
    dense = sum(d for n, d in ops
                if re.search(r"dot|conv|fusion.*dot", n, re.I))
    print(f"trace: {len(ops)} ops, total {tot/1e3:.2f} ms over {steps} "
          f"steps")
    print(f"  embedding/input ops: {emb/tot:.1%}")
    print(f"  dense MXU ops:       {dense/tot:.1%}")
    print(f"  other:               {(tot-emb-dense)/tot:.1%}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["hlo", "trace"], default="hlo")
    p.add_argument("--n_devices", type=int, default=8)
    p.add_argument(
        "--prefetch", action="store_true",
        help="analyze the prefetched (fused two-batch) step instead",
    )
    args = p.parse_args()
    if args.mode == "hlo":
        mode_hlo(args.n_devices, prefetch=args.prefetch)
    else:
        mode_trace()


if __name__ == "__main__":
    main()
