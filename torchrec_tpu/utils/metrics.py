"""Evaluation metrics (the reference uses torchmetrics AUROC/Accuracy for
DLRM, ref examples/dlrm/dlrm_main.py:252-268, and HR@k/NDCG@k for
BERT4Rec, ref examples/bert4rec/bert4rec_metrics.py)."""

from __future__ import annotations

import numpy as np


def auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based AUROC (equivalent to the Mann-Whitney U statistic)."""
    scores = np.asarray(scores, np.float64).ravel()
    labels = np.asarray(labels).ravel()
    pos = labels > 0.5
    n_pos = int(pos.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, labels.size + 1)
    # midranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    r_pos = ranks[pos].sum()
    u = r_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def accuracy(scores: np.ndarray, labels: np.ndarray, threshold=0.5) -> float:
    scores = np.asarray(scores).ravel()
    labels = np.asarray(labels).ravel()
    return float(((scores > threshold) == (labels > 0.5)).mean())


def hr_at_k(rankings: np.ndarray, targets: np.ndarray, k: int) -> float:
    """Hit rate: fraction of rows whose target item ranks in the top k.

    rankings: [B, V] scores over items; targets: [B] true item ids.
    """
    topk = np.argpartition(-rankings, min(k, rankings.shape[1] - 1), axis=1)[:, :k]
    hits = (topk == targets[:, None]).any(axis=1)
    return float(hits.mean())


def ndcg_at_k(rankings: np.ndarray, targets: np.ndarray, k: int) -> float:
    """NDCG with a single relevant item per row."""
    order = np.argsort(-rankings, axis=1)[:, :k]
    gains = np.zeros(rankings.shape[0])
    for b in range(rankings.shape[0]):
        pos = np.where(order[b] == targets[b])[0]
        if pos.size:
            gains[b] = 1.0 / np.log2(pos[0] + 2)
    return float(gains.mean())
