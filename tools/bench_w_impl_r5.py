"""r5: gather+write dispatch A/B through the FULL fused train step.

1. On-chip numerical check: one fused update, w_impl=rmw vs write, must
   match bit-for-bit (validates the gather-before-aliased-write ordering
   on real hardware, not just interpret mode).
2. Full-step suites (bench.py machinery): hbm_scale, pod_shard,
   pod_shard_rowwise under TORCHREC_TPU_W_IMPL=rmw vs auto (auto=write
   per the measured cost model).

Run: python tools/bench_w_impl_r5.py
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench_config import (  # noqa: E402
    B,
    BASELINE_PER_GPU,
    HBM_ROWS,
    MLPERF_CARDINALITIES,
    POD_CHIPS,
)


def parity_check():
    import jax.numpy as jnp

    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        _apply_fused_update_pallas,
        init_fused_optimizer_state,
        run_total_row_grads,
    )

    R, D, N = 100_000, 128, 4096
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(R, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, R, N).astype(np.int32))
    g = jnp.asarray(rng.randn(N, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(N) > 0.1)
    uids, g_c = run_total_row_grads(ids, g, valid, R)
    opt = init_fused_optimizer_state(R, D, EmbOptimType.EXACT_SGD)
    outs = {}
    for impl in ("rmw", "write"):
        os.environ["TORCHREC_TPU_W_IMPL"] = impl
        new_w, _ = _apply_fused_update_pallas(
            w, opt, uids, g_c, jnp.float32(0.05),
            eps=1e-8, weight_decay=0.0, beta1=0.9, beta2=0.999,
        )
        outs[impl] = np.asarray(new_w)
    os.environ.pop("TORCHREC_TPU_W_IMPL", None)
    diff = np.abs(outs["write"] - outs["rmw"]).max()
    print(f"on-chip parity: max |write - rmw| = {diff}", flush=True)
    assert diff == 0.0, "gather+write differs from RMW on chip"


def main():
    parity_check()

    import bench as bench_mod

    rows64 = [max(8, -(-c // POD_CHIPS)) for c in MLPERF_CARDINALITIES]
    suites = (
        ("hbm_scale", "exact_sgd", HBM_ROWS, None),
        ("pod_sgd", "exact_sgd", None, rows64),
        ("pod_rowwise", "rowwise_adagrad", None, rows64),
    )
    for name, optim, rows, per_table in suites:
        line = {}
        for impl in ("rmw", "auto"):
            if impl == "rmw":
                os.environ["TORCHREC_TPU_W_IMPL"] = "rmw"
            else:
                os.environ.pop("TORCHREC_TPU_W_IMPL", None)
            dmp = bench_mod._build(optim, rows, per_table_rows=per_table)
            ex = bench_mod._throughput(dmp, rows, per_table_rows=per_table)
            del dmp
            line[impl] = ex
            print(
                f"{name} [{impl}]: {ex:,.0f} ex/s  "
                f"vs_baseline={ex / BASELINE_PER_GPU:.4f}",
                flush=True,
            )
        print(
            f"  {name}: rmw {line['rmw']:,.0f} -> auto {line['auto']:,.0f}"
            f" ({(line['auto'] / line['rmw'] - 1) * 100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
