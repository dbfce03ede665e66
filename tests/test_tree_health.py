"""Tree health: every module imports, every optimizer's fused update runs.

VERDICT r4 item 1: round 4's snapshot commit landed an `os.environ` read
in ops/fused_update.py without `import os`, so `apply_fused_update`
raised NameError on every call and the official round record was lost.
This meta-test makes that class of breakage impossible to miss at
collection time: it imports EVERY module in the package (so a missing
import fails here even if no other test touches the module) and calls
`apply_fused_update` once per EmbOptimType, including the env-gated
compaction branch whose untested line broke round 4.

Reference analogue: torchrec ships no runnable artifact without its
test_installation/test suite importing the full surface
(ref: /root/reference/torchrec/tests/test_installation.py).
"""

import importlib
import pkgutil

import jax.numpy as jnp
import numpy as np
import pytest

import torchrec_tpu


def _all_modules():
    mods = []
    for m in pkgutil.walk_packages(
        torchrec_tpu.__path__, prefix="torchrec_tpu."
    ):
        mods.append(m.name)
    return sorted(mods)


@pytest.mark.parametrize("mod", _all_modules())
def test_module_imports(mod):
    importlib.import_module(mod)


def test_graft_entry_imports():
    import __graft_entry__  # noqa: F401  (driver contract surface)

    assert callable(__graft_entry__.entry)
    assert callable(__graft_entry__.dryrun_multichip)


@pytest.mark.parametrize(
    "optim", list(__import__(
        "torchrec_tpu.ops.fused_update", fromlist=["EmbOptimType"]
    ).EmbOptimType)
)
def test_apply_fused_update_runs(optim):
    """One real call per optimizer — an import-level or trace-level
    breakage in the update path can never survive collection again."""
    from torchrec_tpu.ops.fused_update import (
        apply_fused_update,
        init_fused_optimizer_state,
    )

    R, D, N = 32, 8, 16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(R, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, R, N).astype(np.int32))
    g = jnp.asarray(rng.randn(N, D).astype(np.float32))
    valid = jnp.ones((N,), bool)
    opt = init_fused_optimizer_state(R, D, optim)
    new_w, new_opt = apply_fused_update(
        w, opt, ids, g, valid, jnp.float32(0.01)
    )
    assert new_w.shape == (R, D)
    assert bool(jnp.all(jnp.isfinite(new_w)))
    assert int(new_opt.step) == 1


def test_apply_fused_update_compact_branch_runs(monkeypatch):
    """Exercise the env-gated compaction pre-pass lines (the exact code
    that broke round 4): shapes satisfying the engage conditions
    (N % 512 == 0, N >= 2048, D % 128 == 0) plus unique_entries and
    TORCHREC_TPU_COMPACT=always."""
    from torchrec_tpu.ops.fused_update import (
        EmbOptimType,
        apply_fused_update,
        init_fused_optimizer_state,
    )

    monkeypatch.setenv("TORCHREC_TPU_COMPACT", "always")
    R, D, N = 64, 128, 2048
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(R, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, R, N).astype(np.int32))
    g = jnp.asarray(rng.randn(N, D).astype(np.float32))
    valid = jnp.ones((N,), bool)
    opt = init_fused_optimizer_state(R, D, EmbOptimType.EXACT_SGD)
    new_w, _ = apply_fused_update(
        w, opt, ids, g, valid, jnp.float32(0.01),
        unique_entries=(((R, 1.0),),),
    )
    assert bool(jnp.all(jnp.isfinite(new_w)))
