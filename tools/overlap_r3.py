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
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _build_step(n_devices, devices=None, do_init=True, local_size=None):
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

    env = ShardingEnv.from_devices(
        (list(devices) if devices is not None else jax.devices())[:n_devices],
        **({"local_size": local_size} if local_size else {}),
    )
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

    state = (
        dmp.init(_j.random.PRNGKey(0), *batch) if do_init else None
    )
    step = dmp.make_train_step(donate=False, jit=False)
    return step, state, batch, dmp


def _build_bench_step(n_devices, devices=None, do_init=True,
                      local_size=None, rows=None, hier_a2a=False):
    """The BENCH config (bench.py shapes: 26 tables x ROWS x 128, B=8192,
    L=1, the MLPerf dense/over archs) RW-sharded over n_devices — the
    flagship program whose collectives are big enough for the TPU
    compiler's async heuristics to engage (the toy config's collectives
    are a few KB and stay synchronous)."""
    import jax
    import jax.numpy as jnp
    import optax

    import bench as bench_mod
    from torchrec_tpu.models import DLRM, DLRMTrain
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.ops.fused_update import EmbOptimType
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rows = rows or bench_mod.ROWS
    NT, DIM, DENSE_IN, B, L = (
        bench_mod.NUM_TABLES, bench_mod.DIM, bench_mod.DENSE_IN,
        bench_mod.B, bench_mod.L,
    )
    tables = tuple(
        EmbeddingBagConfig(num_embeddings=rows, embedding_dim=DIM,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i in range(NT)
    )
    model = DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=tables, max_feature_length=L
            ),
            dense_in_features=DENSE_IN,
            dense_arch_layer_sizes=(512, 256, DIM),
            over_arch_layer_sizes=(1024, 1024, 512, 256, 1),
            dense_dtype=jnp.bfloat16,
        )
    )
    env = ShardingEnv.from_devices(
        (list(devices) if devices is not None else jax.devices())[:n_devices],
        **({"local_size": local_size} if local_size else {}),
    )
    if hier_a2a:
        # host-hierarchical sharding with the ROUTED (a2a) input dist —
        # the config whose cross-host DCN leg the prefetch pipeline
        # exists to hide
        plan = ShardingPlan({
            "dlrm/embedding_bag_collection": {
                f"t{i}": ParameterSharding(
                    ShardingType.TABLE_ROW_WISE,
                    host=i % max(1, env.num_hosts),
                )
                for i in range(NT)
            }
        })
        fused = {"learning_rate": 0.1, "input_routing": "a2a"}
    else:
        plan = ShardingPlan({
            "dlrm/embedding_bag_collection": {
                f"t{i}": ParameterSharding(ShardingType.ROW_WISE)
                for i in range(NT)
            }
        })
        fused = {"learning_rate": 0.1}
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params=fused,
        dense_optimizer=optax.sgd(0.05),
    )
    rng = np.random.RandomState(0)
    feats = [f"f{i}" for i in range(NT)]
    sb = KeyedJaggedTensor.from_lengths(
        feats,
        jnp.asarray(
            np.concatenate([rng.randint(0, rows, B) for _ in range(NT)])
            .astype(np.int32)
        ),
        jnp.asarray(np.ones((NT * B,), np.int32)),
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    batch = (dense, sb, labels)
    state = dmp.init(jax.random.PRNGKey(0), *batch) if do_init else None
    step = dmp.make_train_step(donate=False, jit=False)
    return step, state, batch, dmp


def _abstractify(tree, tmesh):
    """Concrete (CPU-mesh) arrays -> ShapeDtypeStructs carrying the SAME
    PartitionSpecs re-bound to the abstract TPU topology mesh. Specs
    transfer because both DMPs are built from the same model + plan, so
    every leaf's layout is identical by construction."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def f(x):
        if isinstance(x, (jax.Array, jax.ShapeDtypeStruct)):
            sh = getattr(x, "sharding", None)
            spec = (
                sh.spec if isinstance(sh, NamedSharding)
                else PartitionSpec()
            )
            return jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(tmesh, spec)
            )
        return x

    return jax.tree.map(f, tree)


def mode_hlo(n_devices, prefetch=False, topology=None, config="toy",
             rows=None):
    """topology (e.g. "v5e:2x4"): AOT-compile the SAME n_devices program
    against an abstract TPU topology (jax.experimental.topologies) — no
    TPU hardware needed — so the analyzed HLO is the TPU compiler's
    scheduled form (async start/done pairs + latency-hiding windows),
    not the CPU backend's synchronous lowering."""
    import jax

    t_local = None
    if topology:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(topology, "tpu")
        tdevs = list(topo.devices)
        if len(tdevs) < n_devices:
            raise SystemExit(
                f"topology {topology} has {len(tdevs)} devices < "
                f"--n_devices {n_devices}"
            )
        # the topology may span several real hosts: the CPU twin must be
        # built with the SAME local_size so the two DMPs agree on host
        # boundaries (and thus on every table layout / collective group)
        t_local = sum(
            1 for d in tdevs[:n_devices]
            if d.process_index == tdevs[0].process_index
        )
    import functools

    if config in ("bench", "hier"):
        builder = functools.partial(
            _build_bench_step, rows=rows, hier_a2a=config == "hier"
        )
    else:
        builder = _build_step

    # PartitionSpecs depend only on the plan, never on table rows — when
    # AOT-targeting a topology at bench/HBM scale, read the specs off a
    # SMALL concrete twin and take full-rows shapes from eval_shape, so
    # the host never materializes GB-scale tables it immediately discards.
    shrink = bool(topology) and config in ("bench", "hier")
    spec_builder = (
        functools.partial(
            _build_bench_step, rows=2048, hier_a2a=config == "hier"
        )
        if shrink else builder
    )
    step, state, batch, dmp = spec_builder(n_devices, local_size=t_local)
    # concrete dists carry the REAL output NamedShardings of the jitted
    # input_dist (plain eval_shape would drop them -> silently-replicated
    # prefetch inputs and a different collective schedule than the
    # pipeline actually runs); shapes don't depend on table rows
    dists = jax.jit(dmp.input_dist)(batch[1]) if prefetch else None
    state_abs = None
    if shrink:
        _, _, batch_full, dmp_full = builder(
            n_devices, local_size=t_local, do_init=False
        )
        try:
            state_abs = jax.eval_shape(
                dmp_full.init, jax.random.PRNGKey(0), *batch_full
            )
            batch = batch_full
        except Exception as e:  # init not traceable -> concrete fallback
            print(f"eval_shape(init) failed ({e!r}); materializing "
                  f"full-rows state concretely")
            step, state, batch, dmp = builder(
                n_devices, local_size=t_local
            )
            dists = jax.jit(dmp.input_dist)(batch[1]) if prefetch else None
    if topology:
        from jax.sharding import NamedSharding, PartitionSpec

        step_t, _, _, dmp_t = builder(
            n_devices, devices=tdevs, do_init=False, local_size=t_local
        )
        tmesh = dmp_t.env.mesh
        if state_abs is not None:
            def _spec(c):
                sh = getattr(c, "sharding", None)
                return (sh.spec if isinstance(sh, NamedSharding)
                        else PartitionSpec())

            state = jax.tree.map(
                lambda a, c: jax.ShapeDtypeStruct(
                    a.shape, a.dtype,
                    sharding=NamedSharding(tmesh, _spec(c)),
                ),
                state_abs, state,
            )
        else:
            state = _abstractify(state, tmesh)
        batch = tuple(_abstractify(b, tmesh) for b in batch)
        if dists is not None:
            dists = _abstractify(dists, tmesh)
        step, dmp = step_t, dmp_t
        print(f"AOT target: {topology} "
              f"({tdevs[0].device_kind}, first {n_devices} devices)")
    if prefetch:
        # the fused two-batch program: batch i's step + batch i+1's id
        # all_gather with NO dependency between them — the start..done
        # window of the prefetch gathers should span the dense compute
        sb = batch[1]
        pstep = dmp.make_prefetched_train_step(donate=False, jit=False)
        lowered = jax.jit(pstep).lower(state, dists, sb, *batch)
    else:
        lowered = jax.jit(step).lower(state, *batch)
    hlo = lowered.compile().as_text()
    import os

    dump = os.environ.get("OVERLAP_R3_DUMP")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)
        print(f"scheduled HLO dumped to {dump}")
    _analyze_schedule(hlo)


def _analyze_schedule(hlo):
    """Walk the SCHEDULED entry computation (is_scheduled=true: line
    order IS the schedule) and report, for every async collective, how
    many instructions the scheduler placed inside its start..done window
    (= compute hiding the collective's latency). Handles both spellings:
    opcode pairs (`all-gather-start`/`-done`) and the TPU pipeline's
    NAMED async fusions (`%async-collective-start... = ... fusion(...)`,
    whose done consumes the start through get-tuple-elements)."""
    lines = hlo.splitlines()

    # entry computation slice (fusion subcomputations aren't scheduled)
    try:
        e0 = next(i for i, ln in enumerate(lines)
                  if ln.startswith("ENTRY "))
    except StopIteration:
        e0 = 0
    entry = lines[e0:]

    def_re = re.compile(r"^\s*%?(?P<name>[\w.\-]+)\s*=\s*(?P<rest>.*)$")
    kind_re = re.compile(
        r"\b(all-gather|all-reduce|all-to-all|reduce-scatter|"
        r"collective-permute)(-start|-done)?\b"
    )
    label_re = re.compile(r"## ([a-z_0-9]+) ##")

    # fused computations: the TPU pipeline's async fusions
    # (%async-collective-start = ... fusion(...), calls=%fused_comp.N)
    # wrap the actual collective inside the called computation — map
    # each computation name to the collective kind + our ## label ##
    comp_info = {}
    comp_name = None
    for ln in lines:
        # greedy param-list match: tuple-typed parameters nest parens
        cm = re.match(r"^%?([\w.\-]+)\s+\(.*\)\s*->.*\{", ln)
        if cm:
            comp_name = cm.group(1)
            continue
        if comp_name and kind_re.search(ln):
            lab = label_re.search(ln)
            comp_info.setdefault(
                comp_name,
                (kind_re.search(ln).group(1),
                 lab.group(1) if lab else None),
            )

    defs = {}        # name -> (line_idx, rest)
    order = []
    for i, ln in enumerate(entry):
        m = def_re.match(ln)
        if not m:
            continue
        name = m.group("name")
        defs[name] = (i, m.group("rest"))
        order.append(name)

    def _kind_label(name):
        rest = defs[name][1]
        km = kind_re.search(rest)
        lm = label_re.search(rest)
        if km:
            return km.group(1), (lm.group(1) if lm else None)
        callm = re.search(r"calls=%?([\w.\-]+)", rest)
        if callm and callm.group(1) in comp_info:
            return comp_info[callm.group(1)]
        return "collective", (lm.group(1) if lm else None)

    start_suffix = re.compile(r"^(?P<base>.*)-start(?P<suf>\.\d+)?$")
    pairs = []  # (start_name, done_name, window)
    paired_dones = set()
    for n in order:
        sm = start_suffix.match(n)
        if sm is None or n.startswith("copy-start"):
            continue
        rest = defs[n][1]
        is_async_fusion = "async" in n and "fusion(" in rest
        is_opcode_start = re.search(
            r"\s(all-gather|all-reduce|all-to-all|reduce-scatter|"
            r"collective-permute|async)[\w\-]*-start\(", rest,
        )
        if not (is_async_fusion or is_opcode_start):
            continue
        # Pair by CONSUMPTION first: HLO uniquifies -start and -done name
        # counters independently, so `foo-start.1`/`foo-done.1` can belong
        # to different collectives when pairs interleave. Name-suffix
        # pairing is the fallback for the TPU pipeline's named async
        # fusions, whose done reaches the start through gte chains /
        # threaded in-flight buffers rather than as a direct operand.
        cand = [
            d for d in order
            if d not in paired_dones
            and re.search(r"-done(\.\d+)?\(\s*%?" + re.escape(n)
                          + r"\b", defs[d][1])
        ]
        if cand:
            done = cand[0]
        else:
            done = f"{sm.group('base')}-done{sm.group('suf') or ''}"
            if done not in defs or done in paired_dones:
                continue
        si, di = defs[n][0], defs[done][0]
        if di > si:
            paired_dones.add(done)
            pairs.append((n, done, di - si - 1))

    # census by CALL position only ("<shape> all-reduce(" ...): a plain
    # kind_re.search over the full rest also matches operand NAMES
    # (`multiply(%all-reduce.3, ...)`), counting every consumer of a
    # collective as another collective
    call_re = re.compile(
        r"\s(all-gather|all-reduce|all-to-all|reduce-scatter|"
        r"collective-permute)(-start|-done)?\("
    )
    calls = {}
    for n in order:
        m = call_re.search(" " + defs[n][1])
        if m:
            calls[n] = m
    sync = [n for n, m in calls.items() if m.group(2) is None]
    colls = sync + [p[0] for p in pairs]
    print(f"scheduled HLO: {len(lines)} lines, "
          f"{len(colls)} collective instructions "
          f"({len(pairs)} async pairs, {len(sync)} synchronous)")
    if not pairs:
        print("NO async collective pairs — every collective is "
              "synchronous in this schedule (expected on the CPU "
              "backend; on TPU it means the collectives were too small "
              "for the async heuristics).")
    windows = []
    for s, d, w in pairs:
        windows.append(w)
        kind, lab = _kind_label(s)
        print(f"  async {kind}{' [' + lab + ']' if lab else ''}: "
              f"{w} instructions inside the start..done window")
    if windows:
        print(f"median overlap window: {int(np.median(windows))} "
              "instructions — nonzero windows mean XLA hides collective "
              "latency behind compute, the TPU-native replacement for "
              "the reference's comms stream")
    for n in sync:
        kind, lab = _kind_label(n)
        print(f"  sync {kind}{' [' + lab + ']' if lab else ''}")


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
    p.add_argument(
        "--topology", default=None,
        help="AOT-compile for an abstract TPU topology (e.g. v5e:2x4) "
             "— TPU-scheduled HLO without TPU hardware",
    )
    p.add_argument(
        "--config", choices=["toy", "bench", "hier"], default="toy",
        help="toy: small mixed-sharding model; bench: the bench.py "
             "flagship shapes (26x100k x128 RW, B=8192); hier: the same "
             "shapes TWRW-sharded with the routed (a2a) input dist — "
             "the cross-host DCN leg the prefetch pipeline hides",
    )
    p.add_argument(
        "--rows", type=int, default=None,
        help="override rows/table for --config bench (e.g. 700000 = the "
             "HBM-scale suite)",
    )
    args = p.parse_args()
    if args.mode == "hlo":
        mode_hlo(args.n_devices, prefetch=args.prefetch,
                 topology=args.topology, config=args.config,
                 rows=args.rows)
    else:
        mode_trace()


if __name__ == "__main__":
    main()
