"""Crop-based test methods (reference ``test.py:34-70,194-211``):
nearest_crop dedup, maj_voting vote-boosting, and the evaluate_features
dispatch — oracle-tested against direct transcriptions of the reference's
per-query loops on random data."""

import numpy as np
import pytest

from agplace_tpu.retrieval.recall import (
    compute_recalls,
    dedup_nearest_crop,
    maj_voting_merge,
    top_n_voting,
)


def _ref_nearest_crop(distances, predictions, keep=20):
    """Direct transcription of test.py:34-45 for oracle purposes."""
    q_n = predictions.shape[0]
    preds_out = predictions.copy()
    for q in range(q_n):
        sort_idx = np.argsort(distances[q])
        row = predictions[q, sort_idx]
        _, unique_idx = np.unique(row, return_index=True)
        preds_out[q, :keep] = row[np.sort(unique_idx)][:keep]
    return preds_out[:, :keep]


def _ref_maj_voting(distances, predictions, weight, keep=20):
    """Direct transcription of test.py:46-70."""
    d = distances.copy()
    p = predictions.copy()
    for q in range(p.shape[0]):
        for topn in ("top1", "top5", "top10"):
            top_n_voting(topn, p[q], d[q], weight)
        dists = d[q].flatten()
        preds = p[q].flatten()
        order = np.argsort(dists)
        preds = preds[order]
        _, unique_idx = np.unique(preds, return_index=True)
        p[q, 0, :keep] = preds[np.sort(unique_idx)][:keep]
    return p[:, 0, :keep]


def test_dedup_nearest_crop_oracle():
    rng = np.random.default_rng(0)
    q_n = 6
    d = rng.random((q_n, 100)).astype(np.float32)
    p = rng.integers(0, 30, (q_n, 100))  # many duplicates
    got = dedup_nearest_crop(d.copy(), p.copy(), keep=20)
    want = _ref_nearest_crop(d, p, keep=20)
    np.testing.assert_array_equal(got, want)
    # dedup really removed duplicates among the kept 20
    for q in range(q_n):
        assert len(np.unique(got[q])) == 20


def test_dedup_keeps_closest_instance():
    # db index 7 appears at rank 0 (closest) and later; index 3 only later
    d = np.array([[0.1, 0.2, 0.3, 0.4, 0.5]])
    p = np.array([[7, 7, 3, 7, 1]])
    got = dedup_nearest_crop(d, p, keep=3)
    np.testing.assert_array_equal(got[0], [7, 3, 1])


def test_top_n_voting_subtracts_for_repeats():
    preds = np.array([
        [9, 1, 2], [9, 3, 4], [9, 5, 6], [7, 8, 0], [7, 2, 5],
    ])
    dists = np.ones((5, 3), np.float32)
    top_n_voting("top1", preds, dists, maj_weight=0.01)
    # 9 repeats 3x in column 0 -> those entries got 0.01*3/1 subtracted
    assert np.allclose(dists[:3, 0], 1 - 0.03)
    assert np.allclose(dists[3:, 0], 1 - 0.02)  # 7 repeats 2x
    assert np.allclose(dists[:, 1:], 1.0)  # only the top-1 column affected


def test_maj_voting_merge_oracle():
    rng = np.random.default_rng(1)
    q_n = 5
    d = rng.random((q_n, 5, 20)).astype(np.float32)
    p = rng.integers(0, 40, (q_n, 5, 20))
    got = maj_voting_merge(d.copy(), p.copy(), 0.01, keep=20)
    want = _ref_maj_voting(d, p, 0.01, keep=20)
    np.testing.assert_array_equal(got, want)


class _FakeDS:
    def __init__(self, queries_num, positives):
        self.queries_num = queries_num
        self.soft_positives_per_query = positives


def test_evaluate_features_crop_methods_end_to_end():
    """evaluate_features dispatch: plant each query's positive so that only
    the crop-aware merge ranks it first."""
    import dataclasses

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.evaluate import evaluate_features

    rng = np.random.default_rng(2)
    n_q, n_db, dim = 4, 30, 16
    db = rng.standard_normal((n_db, dim)).astype(np.float32)
    # 5 crops per query, query-major rows (q*5+c, the
    # batched_embed_q_crops layout): crop 0 is noise, crops 1-4 sit ON
    # the positive tile
    q_rows = np.empty((5 * n_q, dim), np.float32)
    positives = []
    for q in range(n_q):
        pos = q + 3
        positives.append(np.array([pos]))
        for c in range(5):
            base = db[pos] if c > 0 else rng.standard_normal(dim)
            q_rows[q * 5 + c] = base + 0.01 * rng.standard_normal(dim)
    ds = _FakeDS(n_q, positives)
    cfg = synthetic_config()
    for method in ("five_crops", "nearest_crop", "maj_voting"):
        cfg_m = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, test_method=method))
        recalls, _ = evaluate_features(cfg_m, ds, q_rows.copy(), db,
                                       test_method=method)
        assert recalls[0] == 100.0, (method, recalls)
