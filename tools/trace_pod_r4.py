"""r4: per-op profiler trace of the FULL fused bench step at a chosen
config — the decomposition (tools/bench_pod_shard_r3.py) left ~5 ms of
the pod-shard step unexplained by the gather/scatter/gen isolations, so
this dumps the real in-step op list sorted by time.

  python tools/trace_pod_r4.py [pod|bench|hbm] [steps] [exact_sgd|rowwise_adagrad]

Prints every XLA op >= 0.3% of step time with per-step ms.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_config import (
    B,
    DENSE_IN,
    HBM_ROWS,
    L,
    MLPERF_CARDINALITIES,
    NUM_TABLES,
    POD_CHIPS,
    ROWS,
)


def main():
    import glob
    import tempfile
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from torchrec_tpu.datasets.random import RandomRecDataset
    from torchrec_tpu.sparse import KeyedJaggedTensor

    cfg = sys.argv[1] if len(sys.argv) > 1 else "pod"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    optim = sys.argv[3] if len(sys.argv) > 3 else "exact_sgd"
    if cfg == "pod":
        rows_list = [
            max(8, -(-c // POD_CHIPS)) for c in MLPERF_CARDINALITIES
        ]
    elif cfg == "hbm":
        rows_list = [HBM_ROWS] * NUM_TABLES
    else:
        rows_list = [ROWS] * NUM_TABLES
    print(f"config={cfg} optim={optim} rows={sum(rows_list):,}", flush=True)

    dmp = bench_mod._build(optim, None, per_table_rows=rows_list)

    feats = [f"f{i}" for i in range(NUM_TABLES)]
    gen_fn = RandomRecDataset(
        keys=feats, batch_size=B, hash_sizes=rows_list,
        ids_per_feature=L, num_dense=DENSE_IN, on_device=True,
    ).device_batch_fn()
    raw_step = dmp.make_train_step(jit=False)

    @partial(jax.jit, donate_argnums=(0,))
    def fused_step(state, key):
        b = gen_fn(jax.random.fold_in(key, state.step))
        return raw_step(
            state, b.dense_features, b.sparse_features, b.labels
        )

    rng = np.random.RandomState(0)
    ids0 = np.concatenate(
        [rng.randint(0, r, B).astype(np.int32) for r in rows_list]
    )
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(ids0),
        jnp.asarray(np.ones((NUM_TABLES * B,), np.int32)),
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    state = dmp.init(jax.random.PRNGKey(0), dense, sb, labels)

    key = jax.device_put(jax.random.PRNGKey(7))
    for _ in range(3):
        state, loss, _ = fused_step(state, key)
    float(loss)

    tmp = tempfile.mkdtemp(prefix="trace_pod_r4_")
    with jax.profiler.trace(tmp):
        for _ in range(steps):
            state, loss, _ = fused_step(state, key)
        float(loss)
    time.sleep(1)

    import collections

    from tools.parse_trace import load_ops

    ops = load_ops(tmp)  # one entry per (name, ts) EVENT
    tot = sum(d for _, d in ops)
    if not tot:
        print(f"no XLA Ops lane events under {tmp}")
        return
    agg = collections.defaultdict(lambda: [0.0, 0])
    for name, dur in ops:
        agg[name][0] += dur
        agg[name][1] += 1
    print(
        f"trace: {len(agg)} distinct ops ({len(ops)} events), "
        f"{tot/steps/1e3:.3f} ms/step over {steps} steps"
    )
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        if dur / tot < 0.003:
            break
        print(
            f"  {dur/steps/1e3:8.4f} ms/step ({cnt/steps:5.1f}x "
            f"{dur/cnt/1e3:7.4f} ms)  {100*dur/tot:5.1f}%  {name}"
        )


if __name__ == "__main__":
    main()
