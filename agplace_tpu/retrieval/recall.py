"""Recall@N computation — behaviour parity with ``/root/reference/test.py:24-84``.

Given top-k predictions per query and the per-query soft-positive ground truth
(database indices within 25 m), Recall@N is the percentage of queries whose
top-N predictions contain at least one true positive.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def compute_recalls(
    predictions: np.ndarray,
    positives_per_query: Sequence[np.ndarray],
    recall_values: Sequence[int] = (1, 5, 10, 20),
) -> Tuple[np.ndarray, str]:
    """predictions: [Q, max(recall_values)] db indices sorted by distance.

    Mirrors the accumulation loop at ``test.py:75-83``: the first recall level
    at which a positive appears credits that level and all larger ones.
    """
    recalls = np.zeros(len(recall_values))
    n_q = predictions.shape[0]
    for q, pred in enumerate(predictions):
        pos = positives_per_query[q]
        for i, n in enumerate(recall_values):
            if np.any(np.isin(pred[:n], pos)):
                recalls[i:] += 1
                break
    recalls = recalls / max(n_q, 1) * 100
    recalls_str = ", ".join(
        f"R@{v}: {r:.1f}" for v, r in zip(recall_values, recalls)
    )
    return recalls, recalls_str


def dedup_nearest_crop(distances: np.ndarray, predictions: np.ndarray,
                       keep: int = 20) -> np.ndarray:
    """'nearest_crop' test method: 5 crops per query were searched
    independently; merge-sort their predictions by distance and drop
    duplicates (``test.py:34-45``).

    distances/predictions: [Q, 5*keep].
    """
    out = np.empty((predictions.shape[0], keep), dtype=predictions.dtype)
    for q in range(predictions.shape[0]):
        order = np.argsort(distances[q])
        preds = predictions[q, order]
        _, unique_idx = np.unique(preds, return_index=True)
        out[q] = preds[np.sort(unique_idx)][:keep]
    return out


def top_n_voting(topn: str, predictions: np.ndarray, distances: np.ndarray,
                 maj_weight: float) -> None:
    """'maj_voting' vote-boosting, in-place on distances (``test.py:194-211``).

    predictions/distances: [5, 20] for one query (5 crops x top-20).
    """
    if topn == "top1":
        n, selected = 1, 0
    elif topn == "top5":
        n, selected = 5, slice(0, 5)
    elif topn == "top10":
        n, selected = 10, slice(0, 10)
    else:
        raise ValueError(topn)
    vals, counts = np.unique(predictions[:, selected], return_counts=True)
    for val, count in zip(vals[counts > 1], counts[counts > 1]):
        mask = predictions[:, selected] == val
        distances[:, selected][mask] -= maj_weight * count / n


def maj_voting_merge(distances: np.ndarray, predictions: np.ndarray,
                     maj_weight: float, keep: int = 20) -> np.ndarray:
    """'maj_voting' merge across 5 crops (``test.py:46-70``).

    distances/predictions: [Q, 5, keep].
    """
    out = np.empty((predictions.shape[0], keep), dtype=predictions.dtype)
    for q in range(predictions.shape[0]):
        for topn in ("top1", "top5", "top10"):
            top_n_voting(topn, predictions[q], distances[q], maj_weight)
        dists = distances[q].flatten()
        preds = predictions[q].flatten()
        order = np.argsort(dists)
        preds = preds[order]
        _, unique_idx = np.unique(preds, return_index=True)
        out[q] = preds[np.sort(unique_idx)][:keep]
    return out
