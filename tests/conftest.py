"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's Gloo-on-CPU multi-process test strategy
(ref: torchrec/distributed/test_utils/test_model_parallel_base.py:177-187)
— here multi-"device" is XLA's forced host-platform device count, so
sharding logic runs without TPU hardware.

NOTE: the environment's sitecustomize imports jax at interpreter startup
and latches JAX_PLATFORMS from the ambient env (axon/TPU), so env vars set
here are too late — use jax.config.update instead. XLA_FLAGS still works
because the CPU backend only initializes on first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
