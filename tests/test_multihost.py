"""Multi-host launch wiring (VERDICT r2 item 5; ref: the torchrun
env-driven process-group init, comm.py:31-99).

Real multi-process launch can't run in one test process, so these tests
exercise the two pieces that CAN be validated here: the host-contiguity
assertion in ShardingEnv (with fake multi-process device objects) and
the --multihost CLI path resolving to from_distributed.
"""

import types as _types

import jax
import numpy as np
import pytest

from torchrec_tpu.parallel import ShardingEnv


class _FakeDev:
    """Duck-typed device: Mesh only hashes/equates devices, and
    ShardingEnv reads .process_index."""

    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did

    def __repr__(self):
        return f"d{self.process_index}:{self.id}"


def _check(devs, local_size):
    ShardingEnv._check_host_contiguous(devs, local_size)


def test_contiguous_two_process_mesh_ok():
    devs = [_FakeDev(0, 0), _FakeDev(0, 1), _FakeDev(1, 2), _FakeDev(1, 3)]
    _check(devs, 2)


def test_interleaved_processes_rejected():
    devs = [_FakeDev(0, 0), _FakeDev(1, 2), _FakeDev(0, 1), _FakeDev(1, 3)]
    with pytest.raises(ValueError, match="not host-contiguous"):
        _check(devs, 2)


def test_block_spanning_two_processes_rejected():
    # contiguous processes, but local_size=4 blocks would mix hosts
    devs = [
        _FakeDev(0, 0), _FakeDev(0, 1),
        _FakeDev(1, 2), _FakeDev(1, 3),
        _FakeDev(2, 4), _FakeDev(2, 5),
        _FakeDev(3, 6), _FakeDev(3, 7),
    ]
    _check(devs, 2)  # aligned blocks fine
    with pytest.raises(ValueError, match="spans processes"):
        _check(devs, 4)


def test_single_process_any_local_size_ok():
    # CPU test meshes: all devices process 0, virtual hosts allowed
    env = ShardingEnv.from_devices(jax.devices()[:8], local_size=4)
    assert env.num_hosts == 2


def test_world_not_divisible_raises():
    with pytest.raises(ValueError, match="not divisible"):
        ShardingEnv.from_devices(jax.devices()[:6], local_size=4)


def test_from_distributed_wires_initialize(monkeypatch):
    """from_distributed must call jax.distributed.initialize, sort
    devices host-contiguously, and take local_size from
    jax.local_device_count()."""
    calls = {}

    def fake_init(**kw):
        calls["init"] = kw

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    env = ShardingEnv.from_distributed(coordinator_address="h0:1234")
    assert calls["init"] == {"coordinator_address": "h0:1234"}
    assert env.local_size == 4
    assert env.world_size == len(jax.devices())
    # device order in the mesh is (process_index, id)-sorted
    flat = list(env.mesh.devices.flat)
    keys = [(getattr(d, "process_index", 0), d.id) for d in flat]
    assert keys == sorted(keys)


def test_dlrm_main_multihost_flag(monkeypatch):
    """--multihost routes env construction through from_distributed."""
    import examples.dlrm_main as dm

    called = {}

    def fake_from_distributed(coordinator_address=None, **kw):
        called["addr"] = coordinator_address
        return ShardingEnv.from_devices(jax.devices()[:8], local_size=4)

    monkeypatch.setattr(
        ShardingEnv, "from_distributed",
        staticmethod(fake_from_distributed),
    )
    out = dm.main([
        "--multihost", "--coordinator_address", "h0:9999",
        "--synthetic", "--batch_size", "16", "--num_batches", "2",
        "--num_embeddings", "64", "--embedding_dim", "16",
        "--dense_arch_layer_sizes", "8,16",
        "--over_arch_layer_sizes", "8,1",
    ])
    assert called["addr"] == "h0:9999"
    assert np.isfinite(out["auroc"])
