"""Example smoke tests (ref: examples/dlrm/tests/test_dlrm_main.py,
examples/bert4rec tests, test_installation.py)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root for examples/

from torchrec_tpu.utils.metrics import accuracy, auroc, hr_at_k, ndcg_at_k


def test_auroc_known_values():
    assert auroc(np.asarray([0.9, 0.8, 0.3, 0.2]),
                 np.asarray([1, 1, 0, 0])) == 1.0
    assert auroc(np.asarray([0.2, 0.3, 0.8, 0.9]),
                 np.asarray([1, 1, 0, 0])) == 0.0
    assert auroc(np.asarray([0.5, 0.5, 0.5, 0.5]),
                 np.asarray([1, 1, 0, 0])) == pytest.approx(0.5)


def test_auroc_matches_sklearn_style_reference():
    rng = np.random.RandomState(0)
    scores = rng.rand(500)
    labels = (rng.rand(500) > 0.6).astype(int)
    # brute-force pairwise reference
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    ref = ((pos[:, None] > neg[None, :]).sum()
           + 0.5 * (pos[:, None] == neg[None, :]).sum()) / (
        len(pos) * len(neg))
    assert auroc(scores, labels) == pytest.approx(ref)


def test_hr_ndcg():
    scores = np.asarray([[0.1, 0.9, 0.5], [0.9, 0.1, 0.5]])
    targets = np.asarray([1, 2])
    assert hr_at_k(scores, targets, 1) == 0.5
    assert hr_at_k(scores, targets, 2) == 1.0
    # row0: target ranked 1st -> 1.0; row1: target 2nd -> 1/log2(3)
    assert ndcg_at_k(scores, targets, 3) == pytest.approx(
        (1.0 + 1.0 / np.log2(3)) / 2
    )


def test_accuracy():
    assert accuracy(np.asarray([0.9, 0.1]), np.asarray([1, 1])) == 0.5


def test_dlrm_main_smoke():
    from examples.dlrm_main import main

    r = main([
        "--synthetic", "--batch_size", "64", "--num_batches", "5",
        "--embedding_dim", "16", "--dense_arch_layer_sizes", "16,16",
        "--over_arch_layer_sizes", "16,1", "--num_embeddings", "100",
    ])
    assert np.isfinite(r["auroc"]) and r["throughput"] > 0


def test_bert4rec_main_smoke():
    from examples.bert4rec_main import main

    r = main([
        "--synthetic", "--num_batches", "4", "--batch_size", "8",
        "--max_len", "8", "--emb_dim", "16", "--vocab_size", "50",
        "--nhead", "2", "--num_layers", "1",
    ])
    assert 0.0 <= r["hr@10"] <= 1.0


def test_bert4rec_main_dp_mode():
    from examples.bert4rec_main import main

    r = main([
        "--synthetic", "--num_batches", "2", "--batch_size", "8",
        "--max_len", "8", "--emb_dim", "16", "--vocab_size", "50",
        "--nhead", "2", "--num_layers", "1", "--mode", "dp",
    ])
    assert 0.0 <= r["hr@10"] <= 1.0


def test_dlrm_main_criteo_npy_smoke(tmp_path):
    """The real-data path: npy triple -> loader -> train -> eval."""
    import numpy as _np

    from examples import dlrm_main

    rng = _np.random.RandomState(0)
    N = 2000
    _np.save(tmp_path / "day_0_dense.npy", rng.randn(N, 13).astype(_np.float32))
    _np.save(tmp_path / "day_0_sparse.npy",
             rng.randint(0, 500, (N, 26)).astype(_np.int32))
    _np.save(tmp_path / "day_0_labels.npy",
             rng.randint(0, 2, (N, 1)).astype(_np.int32))
    res = dlrm_main.main([
        "--in_memory_binary_criteo_path", str(tmp_path),
        "--batch_size", "128", "--num_embeddings", "500",
        "--embedding_dim", "16",
        "--dense_arch_layer_sizes", "16,16",
        "--over_arch_layer_sizes", "16,1",
    ])
    assert 0.0 <= res["auroc"] <= 1.0


def test_bert4rec_movielens_sequence_loader(tmp_path):
    """load_movielens_sequences: time-ordered per-user item sequences with
    contiguous re-ids (ref: bert4rec movielens preprocessing)."""
    from examples import bert4rec_main

    (tmp_path / "ratings.csv").write_text(
        "userId,movieId,rating,timestamp\n"
        + "".join(f"1,{m},5.0,{t}\n" for t, m in
                  enumerate([30, 10, 20, 40, 50]))
        + "".join(f"2,{m},4.0,{t}\n" for t, m in
                  enumerate([10, 20, 30, 40, 60]))
    )
    seqs = bert4rec_main.load_movielens_sequences(str(tmp_path))
    assert len(seqs) == 2
    assert all(len(s) == 5 for s in seqs)
    # user 1 watched 30 first -> it gets the first contiguous id (1)
    assert seqs[0][0] == 1
    # shared movies map to the same ids across users
    assert seqs[1][:4] == [seqs[0][1], seqs[0][2], seqs[0][0], seqs[0][3]]


def test_dlrm_predict_serving_smoke(tmp_path):
    """Train -> package -> serve through the dlrm_predict CLI: the full
    ref examples/dlrm/dlrm_packager.py + dlrm_predict.py loop."""
    from examples.dlrm_main import main as train_main
    from examples.dlrm_predict import main as predict_main

    pkg = str(tmp_path / "pkg")
    train_main([
        "--synthetic", "--batch_size", "64", "--num_batches", "4",
        "--embedding_dim", "16", "--dense_arch_layer_sizes", "16,16",
        "--over_arch_layer_sizes", "16,1", "--num_embeddings", "100",
        "--package_dir", pkg,
    ])
    r = predict_main([
        "--package_dir", pkg, "--world_size", "4",
        "--batch_size", "32", "--num_requests", "3",
        "--embedding_dim", "16",
        "--dense_arch_layer_sizes", "16,16",
        "--over_arch_layer_sizes", "16,1",
    ])
    assert r["qps"] > 0 and r["predictions_per_sec"] > 0

    from torchrec_tpu.inference.native_batching import (
        native_serving_available,
    )

    if native_serving_available():
        # same package through the C++ queue + TCP front
        r = predict_main([
            "--package_dir", pkg, "--world_size", "4",
            "--batch_size", "32", "--num_requests", "6",
            "--embedding_dim", "16",
            "--dense_arch_layer_sizes", "16,16",
            "--over_arch_layer_sizes", "16,1",
            "--serve_native",
        ])
        assert r["qps"] > 0 and r["predictions_per_sec"] > 0


def test_dlrm_main_synthetic_criteo_smoke():
    from examples.dlrm_main import main

    r = main([
        "--synthetic_criteo", "--batch_size", "64", "--num_batches", "5",
        "--max_ind_range", "500", "--embedding_dim", "16",
        "--dense_arch_layer_sizes", "16,16",
        "--over_arch_layer_sizes", "16,1",
    ])
    assert np.isfinite(r["auroc"]) and r["throughput"] > 0
