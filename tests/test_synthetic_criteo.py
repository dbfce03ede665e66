"""Calibrated synthetic Criteo generator (datasets/synthetic_criteo.py):
the documented stand-in for real Criteo quality runs (no network egress;
VERDICT r1 item 4 fallback). Checks the published-statistic calibration:
cardinalities, CTR, Zipf duplicate structure, ground-truth learnability,
and host/device stream consistency."""

import jax
import numpy as np
import pytest

from torchrec_tpu.datasets.synthetic_criteo import (
    CRITEO_KAGGLE_CARDINALITIES,
    SyntheticCriteoDataset,
    zipf_ids,
)


def test_published_cardinalities():
    # the Kaggle DAC embedding sizes as published with DLRM
    assert len(CRITEO_KAGGLE_CARDINALITIES) == 26
    assert max(CRITEO_KAGGLE_CARDINALITIES) == 10131227
    assert sum(CRITEO_KAGGLE_CARDINALITIES) == 33762577


def test_ctr_matches_published_rate():
    ds = SyntheticCriteoDataset(batch_size=4096, num_batches=8)
    labels = np.concatenate([b.labels for b in ds])
    assert abs(labels.mean() - 0.2562) < 0.015, labels.mean()


def test_zipf_duplicate_structure():
    """Unlike uniform draws, the head of each feature's id distribution
    dominates: the top-100 ids of a 10M-row feature carry >25% of the
    tokens (real Criteo id frequencies are heavy-tailed)."""
    ds = SyntheticCriteoDataset(batch_size=8192, num_batches=1)
    b = next(iter(ds))
    ids = np.asarray(b.sparse_features.ids)[2, :, 0]  # 10.1M-row feature
    counts = np.unique(ids, return_counts=True)[1]
    share = np.sort(counts)[::-1][:100].sum() / len(ids)
    assert share > 0.25, share
    # a uniform draw of 8192 from 10.1M would be ~100% unique
    assert len(counts) / len(ids) < 0.8


def test_zipf_ids_bounds():
    rng = np.random.RandomState(0)
    ids = zipf_ids(rng, 17, (10000,), a=1.05)
    assert ids.min() >= 0 and ids.max() < 17
    # monotone frequency: id 0 strictly most common
    counts = np.bincount(ids, minlength=17)
    assert counts[0] == counts.max()


def test_ground_truth_bayes_auroc():
    """Labels follow the documented logistic ground truth: its own logits
    score AUROC near the configured ceiling (the Bayes optimum a perfect
    model approaches)."""
    from sklearn.metrics import roc_auc_score

    ds = SyntheticCriteoDataset(batch_size=8192, num_batches=4)
    labels, logits = [], []
    for b in ds:
        ids = np.asarray(b.sparse_features.ids)[:, :, 0]
        labels.append(b.labels)
        logits.append(ds._logits(ids, np.asarray(b.dense_features)))
    got = roc_auc_score(np.concatenate(labels), np.concatenate(logits))
    assert 0.74 < got < 0.82, got


def test_device_twin_shares_ground_truth():
    """Batches generated ON DEVICE are scored by the HOST ground truth at
    the same AUROC — one learnable mapping across both streams (train on
    device, eval on host)."""
    from sklearn.metrics import roc_auc_score

    ds = SyntheticCriteoDataset(batch_size=8192)
    gen = jax.jit(ds.device_batch_fn())
    b = gen(jax.random.PRNGKey(0))
    ids = np.asarray(b.sparse_features.ids)[:, :, 0]
    lg = ds._logits(ids, np.asarray(b.dense_features))
    got = roc_auc_score(np.asarray(b.labels), lg)
    assert 0.73 < got < 0.82, got
    assert abs(float(np.asarray(b.labels).mean()) - 0.2562) < 0.03


def test_max_ind_range_caps_ids():
    ds = SyntheticCriteoDataset(batch_size=1024, max_ind_range=5000,
                                num_batches=1)
    b = next(iter(ds))
    assert int(np.asarray(b.sparse_features.ids).max()) < 5000
    assert all(c <= 5000 for c in ds.cardinalities)
