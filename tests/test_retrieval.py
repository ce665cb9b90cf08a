"""Retrieval engine tests: matmul L2 top-k must match brute-force numpy
(the faiss-parity requirement, SURVEY.md §7.2 step 2)."""

import numpy as np
import jax.numpy as jnp

from agplace_tpu.retrieval.knn import (
    l2_topk,
    l2_topk_blocked,
    pairwise_sq_l2,
    radius_neighbors,
)
from agplace_tpu.retrieval.recall import compute_recalls
from agplace_tpu.retrieval.kmeans import kmeans
import jax


def _brute_topk(q, d, k):
    d2 = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_l2_topk_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((37, 64)).astype(np.float32)
    d = rng.standard_normal((211, 64)).astype(np.float32)
    ref_d, ref_i = _brute_topk(q, d, 5)
    got_d, got_i = l2_topk(jnp.asarray(q), jnp.asarray(d), 5)
    np.testing.assert_allclose(np.asarray(got_d), ref_d, rtol=1e-4, atol=1e-4)
    # indices can differ only on exact ties; distances must agree
    same = np.asarray(got_i) == ref_i
    diff_dist = np.abs(np.take_along_axis(
        ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1),
        np.asarray(got_i), axis=1) - ref_d)
    assert np.all(same | (diff_dist < 1e-4))


def test_blocked_matches_unblocked():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((130, 32)).astype(np.float32)
    d = rng.standard_normal((300, 32)).astype(np.float32)
    d1, i1 = l2_topk(jnp.asarray(q), jnp.asarray(d), 4)
    d2, i2 = l2_topk_blocked(q, jnp.asarray(d), 4, block=64)
    np.testing.assert_allclose(np.asarray(d1), d2, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), i2)


def test_pairwise_sq_l2_nonnegative():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 16)).astype(np.float32)
    d2 = np.asarray(pairwise_sq_l2(jnp.asarray(x), jnp.asarray(x)))
    assert (d2 >= 0).all()
    assert np.allclose(np.diag(d2), 0, atol=1e-4)


def test_radius_neighbors_utm_scale():
    # UTM-scale coordinates (~1e5 m) with metre-scale radii: float64 path
    rng = np.random.default_rng(3)
    base = np.array([500000.0, 4000000.0])
    pts = base + rng.uniform(-100, 100, size=(200, 2))
    res = radius_neighbors(pts[:10], pts, radius=25.0)
    for i, nbrs in enumerate(res):
        d = np.linalg.norm(pts - pts[i], axis=1)
        expected = np.flatnonzero(d <= 25.0)
        np.testing.assert_array_equal(np.sort(nbrs), expected)


def test_recall_computation():
    # query 0: positive at rank 1; query 1: at rank 3; query 2: never
    preds = np.array([[5, 1, 2, 3], [9, 8, 7, 3], [0, 1, 2, 3]])
    positives = [np.array([5]), np.array([7]), np.array([99])]
    recalls, s = compute_recalls(preds, positives, recall_values=(1, 2, 3, 4))
    np.testing.assert_allclose(
        recalls, [100 / 3, 100 / 3, 200 / 3, 200 / 3], rtol=1e-6)
    assert "R@1" in s


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((100, 8)).astype(np.float32) + 10
    b = rng.standard_normal((100, 8)).astype(np.float32) - 10
    pts = np.concatenate([a, b])
    cents, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 2,
                           n_iter=10)
    assign = np.asarray(assign)
    # points from the same blob share a label
    assert len(set(assign[:100])) == 1
    assert len(set(assign[100:])) == 1
    assert assign[0] != assign[150]


def test_l2_topk_k_exceeds_gallery():
    """faiss.IndexFlatL2.search semantics for k > ntotal: pad with +inf
    distance and -1 index (regression: this crashed evaluate() on tiny
    galleries, e.g. the 1-device dryrun world)."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    d, i = l2_topk(q, db, 20)
    assert d.shape == (5, 20) and i.shape == (5, 20)
    assert (np.asarray(i)[:, 3:] == -1).all()
    assert np.isinf(np.asarray(d)[:, 3:]).all()
    # the real 3 results are still exact
    d_ref, i_ref = l2_topk(q, db, 3)
    np.testing.assert_array_equal(np.asarray(i)[:, :3], np.asarray(i_ref))


def test_quantize_rows_bounds():
    from agplace_tpu.retrieval.knn import quantize_rows

    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 32)).astype(np.float32) * 3.0
    q, scale, sq = quantize_rows(x)
    assert q.dtype == np.int8 and np.abs(q).max() <= 127
    # per-row reconstruction error bounded by half a quantization step
    err = np.abs(q.astype(np.float32) * scale - x)
    assert (err <= 0.5 * scale + 1e-7).all()
    # norms are exact (computed from the fp32 rows, not the int8 ones)
    np.testing.assert_allclose(sq, (x * x).sum(1), rtol=1e-6)


def test_int8_candidates_contain_true_topk():
    """The approximate int8 candidate set must contain the exact top-k on
    realistic (L2-normalised) descriptors — the guarantee the serving
    re-rank relies on."""
    from agplace_tpu.retrieval.knn import l2_candidates_int8, quantize_rows

    rng = np.random.default_rng(11)
    db = rng.standard_normal((512, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((32, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k = 5
    _, exact = _brute_topk(q, db, k)
    dbq, scale, sq = quantize_rows(db)
    _, cand = l2_candidates_int8(
        jnp.asarray(q), jnp.asarray(dbq), jnp.asarray(scale[:, 0]),
        jnp.asarray(sq), 4 * k)
    cand = np.asarray(cand)
    for r in range(q.shape[0]):
        assert set(exact[r]) <= set(cand[r]), (r, exact[r], cand[r])
