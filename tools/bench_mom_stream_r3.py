"""r3 chip campaign: streaming rowwise-momentum kernel vs the XLA path.

Measures, at bench shapes (N = 26x8192 sorted ids, R rows, D=128):
  1. full ROWWISE_ADAGRAD fused update, XLA momentum (r2 shipped)
  2. full ROWWISE_ADAGRAD fused update, streaming momentum kernel
  3. the streaming kernel in isolation (slope timing)
  4. EXACT_SGD as the shared-floor reference
across table sizes (bench config 2.6M rows, pod-shard 3.2M, HBM 18.2M).

Run ON THE CHIP (no env overrides). Update ops/cost_model.py
MOM_* constants from section 3's output. Keep each big-R point in its
own process if OOM appears (jit constant caches pin tables).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_mom_stream_r3.py --rows 2600000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2_600_000)
    p.add_argument("--n_ids", type=int, default=26 * 8192)
    p.add_argument("--dim", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tools.tpu_timing import bench_chain
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )
    from torchrec_tpu.ops.pallas_embedding import rowwise_momentum_stream

    R, N, D = args.rows, args.n_ids, args.dim
    rng = np.random.RandomState(0)
    ids0 = np.sort(rng.randint(0, R, N).astype(np.int32))
    w0 = jnp.zeros((R, D), jnp.float32) + 0.01
    valid = jnp.ones((N,), bool)
    print(f"R={R:,} N={N:,} D={D} table={R*D*4/2**30:.2f} GiB", flush=True)

    def full_update(impl):
        import os

        os.environ["TORCHREC_TPU_MOM_IMPL"] = impl
        opt0 = init_fused_optimizer_state(R, D, EmbOptimType.ROWWISE_ADAGRAD)

        def step(c):
            w, opt, ids = c
            g = jnp.full((N, D), 1e-4, jnp.float32)
            new_w, new_opt = apply_fused_update(
                w, opt, ids, g, valid, jnp.float32(0.01),
                stochastic_rounding=False,
            )
            bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
            return (new_w, new_opt, (ids + bump) % R)

        t = bench_chain(
            step, (w0, opt0, jnp.asarray(ids0)), k1=5, k2=25, donate=True
        )
        print(f"rowwise_adagrad mom={impl}: {t*1e3:.2f} ms", flush=True)
        return t

    def sgd_ref():
        opt0 = init_fused_optimizer_state(R, D, EmbOptimType.EXACT_SGD)

        def step(c):
            w, opt, ids = c
            g = jnp.full((N, D), 1e-4, jnp.float32)
            new_w, new_opt = apply_fused_update(
                w, opt, ids, g, valid, jnp.float32(0.01),
                stochastic_rounding=False,
            )
            bump = (new_w[0, 0] > -1.0).astype(jnp.int32)
            return (new_w, new_opt, (ids + bump) % R)

        t = bench_chain(
            step, (w0, opt0, jnp.asarray(ids0)), k1=5, k2=25, donate=True
        )
        print(f"exact_sgd reference: {t*1e3:.2f} ms", flush=True)
        return t

    def kernel_iso():
        m0 = jnp.zeros((R,), jnp.float32) + 1e-6
        gsq = jnp.full((N,), 1e-8, jnp.float32)

        def step(c):
            m, ids = c
            new_m, inv, _ovf = rowwise_momentum_stream(
                m, ids, gsq, eps=1e-8
            )
            bump = (inv[0] < 1.0).astype(jnp.int32)
            # min keeps uids SORTED (the kernel precondition); a modulo
            # wrap would unsort them and time a garbage-window workload
            return (new_m, jnp.minimum(ids + bump, R - 1))

        t = bench_chain(
            step, (m0, jnp.asarray(ids0)), k1=5, k2=25, donate=True
        )
        per_row_ns = t / R * 1e9
        print(
            f"mom_stream kernel alone: {t*1e3:.3f} ms "
            f"({per_row_ns:.2f} ns/table-row; fit "
            f"MOM_STREAM_BYTES_PER_ROW+FLOP from two R points)",
            flush=True,
        )
        return t

    sgd_ref()
    full_update("xla")
    full_update("stream")
    kernel_iso()


if __name__ == "__main__":
    main()
