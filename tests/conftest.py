"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's Gloo-on-CPU multi-process test strategy
(ref: torchrec/distributed/test_utils/test_model_parallel_base.py:177-187)
— here multi-"device" is XLA's forced host-platform device count, so
sharding logic runs without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
