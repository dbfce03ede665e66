"""Round-2 microbench: rowwise-Adagrad fused-update candidates on the
real chip at DLRM bench shapes (N=26*8192 ids, R=2.6M rows, D=128).

Candidates:
  sgd_full      apply_fused_update EXACT_SGD      (r1 headline path)
  rw_full       apply_fused_update ROWWISE_ADAGRAD (r1 0.76x path)
  m_scatter     1-D momentum scatter-add alone
  m_gather      1-D momentum gather alone
  m2d_scatter   momentum viewed [R/128, 128], 2-D scatter of scalars
  w_scatter     [N, 128] row scatter-add alone (the shared floor)
  pallas_rw     ops.pallas_embedding.fused_update_rowwise_adagrad
                (pre-deduped; kernel only)

Run:  PYTHONPATH=/root/repo python tools/bench_rowwise_r2.py
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        dedup_row_grads,
        init_fused_optimizer_state,
    )
    from tools.tpu_timing import bench_chain

    R = 26 * 100_000
    D = 128
    N = 26 * 8192
    rng = np.random.RandomState(0)
    ids0 = np.sort(rng.randint(0, R, N).astype(np.int32))
    w0 = jnp.zeros((R, D), jnp.float32) + 0.01
    m0 = jnp.zeros((R,), jnp.float32) + 0.01
    g0 = jnp.asarray(rng.randn(N, D).astype(np.float32)) * 1e-3
    ids_d = jnp.asarray(ids0)
    valid = jnp.ones((N,), bool)
    hints = dict(indices_are_sorted=True, unique_indices=True)

    results = {}

    def rot(ids, w):
        # data-dependence on the carry without changing the distribution
        return (ids + (w[0, 0] > -1.0).astype(jnp.int32)) % R

    # --- full fused paths (includes dedup sort) ---------------------------
    for name, ot in (
        ("sgd_full", EmbOptimType.EXACT_SGD),
        ("rw_full", EmbOptimType.ROWWISE_ADAGRAD),
    ):
        opt0 = init_fused_optimizer_state(R, D, ot)

        def step(c, ot=ot):
            w, opt, ids = c
            new_w, new_opt = apply_fused_update(
                w, opt, ids, g0, valid, jnp.float32(0.01),
                stochastic_rounding=False,
            )
            return (new_w, new_opt, rot(ids, new_w))

        t = bench_chain(step, (w0, opt0, ids_d), k1=5, k2=25, donate=True)
        results[name] = t
        print(f"{name:14s} {t*1e3:8.3f} ms")

    # --- isolated ops -----------------------------------------------------
    x1 = jnp.asarray(rng.randn(N).astype(np.float32)) * 1e-6

    def m_scatter(c):
        m, ids = c
        m2 = m.at[ids].add(x1, mode="drop", **hints)
        return (m2, rot(ids, m2.reshape(1, -1)))

    results["m_scatter"] = bench_chain(
        m_scatter, (m0, ids_d), k1=5, k2=45, donate=True
    )
    print(f"{'m_scatter':14s} {results['m_scatter']*1e3:8.3f} ms")

    def m_gather(c):
        m, ids, acc = c
        rows = m.at[ids].get(mode="fill", fill_value=1.0, **hints)
        return (m, rot(ids, rows.reshape(1, -1)), acc + rows[:1])

    results["m_gather"] = bench_chain(
        m_gather, (m0, ids_d, jnp.zeros((1,))), k1=5, k2=45
    )
    print(f"{'m_gather':14s} {results['m_gather']*1e3:8.3f} ms")

    m2d0 = jnp.reshape(m0[: (R // 128) * 128], (R // 128, 128))

    def m2d_scatter(c):
        m2d, ids = c
        ii = jnp.stack([ids // 128, ids % 128], axis=1)
        m2 = m2d.at[ii[:, 0], ii[:, 1]].add(
            x1, mode="drop", indices_are_sorted=True
        )
        return (m2, rot(ids, m2))

    results["m2d_scatter"] = bench_chain(
        m2d_scatter, (m2d0, ids_d % ((R // 128) * 128)), k1=5, k2=25,
        donate=True,
    )
    print(f"{'m2d_scatter':14s} {results['m2d_scatter']*1e3:8.3f} ms")

    def w_scatter(c):
        w, ids = c
        w2 = w.at[ids].add(g0, mode="drop", **hints)
        return (w2, rot(ids, w2))

    results["w_scatter"] = bench_chain(
        w_scatter, (w0, ids_d), k1=5, k2=25, donate=True
    )
    print(f"{'w_scatter':14s} {results['w_scatter']*1e3:8.3f} ms")

    # --- pallas kernel (pre-deduped ids; kernel cost only) ----------------
    try:
        from torchrec_tpu.ops.pallas_embedding import (
            fused_update_rowwise_adagrad,
        )

        uids0, sums0 = dedup_row_grads(ids_d, g0, valid, R)
        uids0 = jax.block_until_ready(uids0)

        def pallas_rw(c):
            w, m, uids = c
            new_w, new_m = fused_update_rowwise_adagrad(
                w, m, uids, sums0, jnp.float32(0.01), T=128,
                interpret=False,
            )
            return (new_w, new_m, (uids + 1) % R)

        results["pallas_rw"] = bench_chain(
            pallas_rw, (w0, m0, uids0), k1=3, k2=13, donate=True
        )
        print(f"{'pallas_rw':14s} {results['pallas_rw']*1e3:8.3f} ms")
    except Exception as e:  # noqa: BLE001
        print("pallas_rw failed:", repr(e))

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
