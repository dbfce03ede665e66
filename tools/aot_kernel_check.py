"""AOT Mosaic-compile check for every Pallas kernel — no TPU needed.

The Pallas kernels are parity-tested in interpreter mode and exercised
on the chip by the campaign, but interpreter mode does NOT run Mosaic:
a kernel can pass every CPU test and still fail TPU lowering (r2 hit
exactly this with sflag sizing). This tool AOT-compiles each kernel for
a REAL v5e target via `jax.experimental.topologies` (abstract devices,
works with the relay down), so Mosaic lowering errors surface before
any chip time is spent.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/aot_kernel_check.py
Note: libtpu's /tmp/libtpu_lockfile serializes topology users — run one
topology-AOT process at a time.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def main(topology="v5e:2x2", rows=2_600_000, n_ids=212_992, dim=128):
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from torchrec_tpu.ops import pallas_embedding as pe
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    topo = topologies.get_topology_desc(topology, "tpu")
    mesh = Mesh(np.array(list(topo.devices)[:1]), ("d",))
    rep = NamedSharding(mesh, P())

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=rep)

    R, N, D = rows, n_ids, dim
    w = sds((R, D), jnp.float32)
    ids = sds((N,), jnp.int32)
    g = sds((N, D), jnp.float32)
    lr = sds((), jnp.float32)

    cases = {}

    cases["gather_rows"] = (
        lambda w, ids: pe.gather_rows(w, ids, interpret=False), (w, ids)
    )
    # L sweep: power-of-two, non-power-of-two (TB = 8-aligned 256//L —
    # the Mosaic sublane-misalignment class), and the L=32 budget edge.
    # NB is capped to the SMEM ids-prefetch budget per L (the checker
    # found the 1MB SMEM RESOURCE_EXHAUSTED at NB=8192, L=32).
    for L in (8, 3, 5, 20, 32):
        TB = max(8, (256 // L) // 8 * 8)
        NB = min(8192, pe._SMEM_IDS_BYTES // (4 * L) // TB * TB)
        assert pe.tbe_lookup_fits(NB, L), (NB, L)
        cases[f"tbe_lookup_pooled[L={L},NB={NB}]"] = (
            lambda w, i2, c: pe.tbe_lookup_pooled(
                w, i2, c, interpret=False
            ),
            (w, sds((NB, L), jnp.int32), sds((NB, L), jnp.float32)),
        )
    cases["fused_update_sgd"] = (
        lambda w, ids, g, lr: pe.fused_update_sgd(
            w, ids, g, lr, interpret=False
        ),
        (w, ids, g, lr),
    )
    cases["fused_update_rowwise_adagrad"] = (
        lambda w, m, ids, g, lr: pe.fused_update_rowwise_adagrad(
            w, m, ids, g, lr, interpret=False
        ),
        (w, sds((R,), jnp.float32), ids, g, lr),
    )
    cases["fused_update_rowwise_adagrad[stream]"] = (
        lambda w, m, ids, g, lr: pe.fused_update_rowwise_adagrad(
            w, m, ids, g, lr, momentum_stream=True, interpret=False
        ),
        (w, sds((R,), jnp.float32), ids, g, lr),
    )
    cases["fused_update_adagrad"] = (
        lambda w, m, ids, g, lr: pe.fused_update_adagrad(
            w, m, ids, g, lr, interpret=False
        ),
        (w, sds((R, D), jnp.float32), ids, g, lr),
    )
    cases["fused_update_adam"] = (
        lambda w, m1, m2, ids, g, lr: pe.fused_update_adam(
            w, m1, m2, ids, g, lr, 1, interpret=False
        ),
        (w, sds((R, D), jnp.float32), sds((R, D), jnp.float32), ids, g,
         lr),
    )
    cases["rowwise_momentum_stream"] = (
        lambda m, ids, gsq: pe.rowwise_momentum_stream(
            m, ids, gsq, interpret=False
        ),
        (sds((R,), jnp.float32), ids, sds((N,), jnp.float32)),
    )
    cases["rowwise_momentum_stream[skip]"] = (
        lambda m, ids, gsq: pe.rowwise_momentum_stream(
            m, ids, gsq, skip_blocks=(0, 2), interpret=False
        ),
        (sds((R,), jnp.float32), ids, sds((N,), jnp.float32)),
    )

    # the full dispatch with the r3 streaming momentum forced on — the
    # exact program the chip campaign benches
    def _rowwise_stream(w, m, ids, g, lr):
        os.environ["TORCHREC_TPU_MOM_IMPL"] = "stream"
        opt = init_fused_optimizer_state(
            R, D, EmbOptimType.ROWWISE_ADAGRAD
        ).replace(momentum1=m)
        return apply_fused_update(w, opt, ids, g, ids < R, lr)

    cases["apply_fused_update[rowwise,mom=stream]"] = (
        _rowwise_stream, (w, sds((R,), jnp.float32), ids, g, lr)
    )

    failures = 0
    for name, (fn, args) in cases.items():
        try:
            compiled = jax.jit(fn).lower(*args).compile()
            txt = compiled.as_text()
            ccs = txt.count("custom-call")
            print(f"OK   {name}: compiled for {topology} "
                  f"({len(txt.splitlines())} HLO lines, "
                  f"{ccs} custom-calls)")
        except Exception as e:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"FAIL {name}: {repr(e)[:400]}")
    print(f"{len(cases) - failures}/{len(cases)} kernels compile for "
          f"{topology}")
    return failures


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--rows", type=int, default=2_600_000)
    ap.add_argument("--n_ids", type=int, default=212_992)
    args = ap.parse_args()
    sys.exit(1 if main(args.topology, args.rows, args.n_ids) else 0)
