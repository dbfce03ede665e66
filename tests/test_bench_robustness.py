"""bench.py must ALWAYS print a parseable JSON record (VERDICT r2 item 1:
BENCH_r02.json was empty after a driver timeout). These tests run the
real bench main() on the CPU backend with shrunken shapes and assert the
emission contract: a flushed headline line immediately after the
headline suite, an error line when the backend probe fails, and
exceptions inside optional suites never losing the headline."""

import json
import sys

import pytest

import bench


def _shrink(monkeypatch):
    monkeypatch.setattr(bench, "NUM_TABLES", 2)
    monkeypatch.setattr(bench, "ROWS", 64)
    monkeypatch.setattr(bench, "HBM_ROWS", 64)
    monkeypatch.setattr(bench, "B", 8)
    monkeypatch.setattr(bench, "STEPS", 2)
    monkeypatch.setattr(
        bench, "MLPERF_CARDINALITIES", (640, 320)
    )
    monkeypatch.setattr(bench, "POD_CHIPS", 4)


def _emitted_lines(capsys):
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.strip().startswith("{")
    ]
    assert lines, "bench emitted no JSON lines"
    return lines


def test_headline_emitted_immediately_and_enriched(monkeypatch, capsys):
    _shrink(monkeypatch)
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: "cpu")
    monkeypatch.setenv("TORCHREC_BENCH_BUDGET_S", "100000")
    monkeypatch.delenv("TORCHREC_BENCH_FAST", raising=False)
    bench._OUT.clear()
    bench.main()
    lines = _emitted_lines(capsys)
    # first line: the bare headline (printed before any optional suite)
    first = lines[0]
    assert first["metric"] == "dlrm_train_examples_per_sec_per_chip"
    assert first["value"] > 0
    assert "vs_baseline" in first
    assert "rowwise_adagrad" not in first
    # last line: enriched with every suite that ran
    last = lines[-1]
    assert last["value"] == first["value"]
    for key in ("rowwise_adagrad", "pod_shard", "pod_shard_rowwise",
                "zipf", "hbm_scale"):
        assert key in last, f"suite {key} missing from final record"
        assert last[key].get("value", 0) > 0 or "error" in last[key]
    bd = last["rowwise_breakdown"]
    assert "error" in bd or bd["exact_sgd_update_ms"] > 0
    assert last["pod_shard"]["pod_chips"] == 4


def test_backend_unavailable_still_emits_json(monkeypatch, capsys):
    _shrink(monkeypatch)
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: None)
    bench._OUT.clear()
    bench.main()
    lines = _emitted_lines(capsys)
    assert lines[-1]["value"] is None
    assert "unavailable" in lines[-1]["error"]
    # even a relay-down record carries quantitative content: cost-model
    # predictions for the headline + pod-shard suites, clearly labeled
    pred = lines[-1]["predicted_from_cost_model"]
    for key in ("headline_sgd", "rowwise_adagrad",
                "pod_shard_sgd", "pod_shard_rowwise"):
        assert pred[key]["ex_s"] > 0
        assert 0 < pred[key]["vs_baseline"] < 10


def test_suite_exception_keeps_headline(monkeypatch, capsys):
    _shrink(monkeypatch)
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **k: "cpu")

    def boom():
        raise RuntimeError("suite exploded")

    monkeypatch.setattr(bench, "_lookup_roofline", boom)
    monkeypatch.setenv("TORCHREC_BENCH_BUDGET_S", "100000")
    bench._OUT.clear()
    bench.main()
    last = _emitted_lines(capsys)[-1]
    assert last["value"] > 0
    assert "suite exploded" in last["lookup_roofline"]["error"]


def test_probe_subprocess_real_cpu(monkeypatch):
    """The real probe subprocess resolves the cpu backend quickly.
    The axon sitecustomize forces axon backend init in ANY subprocess
    that inherits PALLAS_AXON_POOL_IPS (even under JAX_PLATFORMS=cpu),
    and that init hangs when the relay is down — strip it so this test
    exercises the subprocess/parse machinery against a clean cpu
    interpreter. (In production the inherited axon env is exactly what
    the probe must exercise.)"""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert bench._probe_backend(timeout_s=120, retries=0) == "cpu"
