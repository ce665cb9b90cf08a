"""Exact nearest-neighbour retrieval on TPU — the faiss replacement.

The reference delegates all retrieval to faiss ``IndexFlatL2`` (eval:
``/root/reference/test.py:27-32``; mining: ``datasets_ws_kitti360.py:976-993``).
On TPU, exact L2 search is a single MXU matmul:

    ||q - d||^2 = ||q||^2 + ||d||^2 - 2 q . d

followed by ``jax.lax.top_k``.  Queries are processed in fixed-size blocks so
the [Q, D] distance matrix never materialises in HBM for large galleries, and
the gallery can be sharded over a mesh axis (see ``sharded.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sq_l2(queries: jax.Array, database: jax.Array) -> jax.Array:
    """Squared L2 distance matrix [Q, D] via one matmul (MXU path).

    Clamped at zero: the expanded form can go slightly negative in floating
    point for near-identical vectors.
    """
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [Q, 1]
    d_sq = jnp.sum(database * database, axis=-1)  # [D]
    # HIGHEST precision: the expanded form is tie-sensitive, and the TPU
    # matmul default would round inputs to bf16 (faiss-parity requirement).
    cross = jnp.dot(queries, database.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(q_sq + d_sq[None, :] - 2.0 * cross, 0.0)


def pairwise_l2(queries: jax.Array, database: jax.Array) -> jax.Array:
    """Euclidean distance matrix (torch.cdist equivalent,
    compute_other_loss.py:78-81).

    Safe sqrt: zero entries (self-distances on the diagonal of A-A blocks)
    get a zero gradient instead of sqrt'(0)=inf — matching torch.cdist's
    subgradient convention and keeping the geo-BCE loss NaN-free.
    """
    d2 = pairwise_sq_l2(queries, database)
    nonzero = d2 > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, d2, 1.0)), 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def l2_topk(queries: jax.Array, database: jax.Array, k: int):
    """Exact k-NN under L2.  Returns (sq_distances [Q,k], indices [Q,k]),
    matching ``faiss.IndexFlatL2.search`` (which also returns squared L2) —
    including its k > ntotal behaviour: missing slots padded with distance
    +inf and index -1.
    """
    d2 = pairwise_sq_l2(queries, database)
    kk = min(k, database.shape[0])
    neg, idx = jax.lax.top_k(-d2, kk)
    if kk < k:
        q_n = d2.shape[0]
        neg = jnp.concatenate(
            [neg, jnp.full((q_n, k - kk), -jnp.inf, neg.dtype)], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.full((q_n, k - kk), -1, idx.dtype)], axis=1)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("k",))
def ip_topk(queries: jax.Array, database: jax.Array, k: int):
    """Exact max-inner-product search (faiss IndexFlatIP equivalent, used by
    the anyloc recall utility ``anyloc/utilities.py:446-456``); k > ntotal
    padded with -inf similarity and -1 index like faiss."""
    sims = jnp.dot(queries, database.T, preferred_element_type=jnp.float32)
    kk = min(k, database.shape[0])
    s, idx = jax.lax.top_k(sims, kk)
    if kk < k:
        q_n = sims.shape[0]
        s = jnp.concatenate(
            [s, jnp.full((q_n, k - kk), -jnp.inf, s.dtype)], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.full((q_n, k - kk), -1, idx.dtype)], axis=1)
    return s, idx


def quantize_rows(x: np.ndarray):
    """Per-row symmetric int8 quantization of a descriptor matrix:
    ``x ~= scale[:, None] * q`` with ``q`` int8 in [-127, 127].

    Returns ``(q [N, C] int8, scale [N, 1] f32, sq_norm [N] f32)``.  The
    squared norms are computed from the EXACT fp32 rows, so a downstream
    L2 search only sees quantization noise in the cross term — the
    ``||q||^2 + ||d||^2`` part of the expansion stays exact.

    Beyond-parity serving feature (the reference's faiss usage is
    IndexFlatL2 only): int8 gallery rows cost 4x less HBM per scan and
    drive the v5e's 2x-rate int8 MXU path.
    """
    x = np.asarray(x, np.float32)
    amax = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-12)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
    return q, scale, np.einsum("nc,nc->n", x, x).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("nc",))
def l2_candidates_int8(queries: jax.Array, db_i8: jax.Array,
                       db_scale: jax.Array, db_sq: jax.Array, nc: int):
    """Approximate top-``nc`` L2 candidates against an int8 gallery.

    The fp32 queries are quantized per row on device; the cross term runs
    as an int8xint8->int32 matmul (MXU native on v5e), then rescales to
    fp32.  ``db_scale`` is the per-row [N] scale vector and ``db_sq`` the
    exact fp32 gallery norms from ``quantize_rows``, so the approximation
    error is bounded by the two rounding steps of the cross term only.
    Returns approximate ``(sq_distances [Q, nc], indices [Q, nc])`` — feed
    the indices to an exact re-rank (``PlaceIndex.search_descriptors``)
    for final ordering.
    """
    q = queries.astype(jnp.float32)
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
    cross = jax.lax.dot_general(
        q_i8, db_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    cross = cross * qs * db_scale[None, :]
    d2 = jnp.maximum(q_sq + db_sq[None, :] - 2.0 * cross, 0.0)
    neg, idx = jax.lax.top_k(-d2, nc)
    return -neg, idx


def l2_topk_blocked(
    queries: np.ndarray,
    database: jax.Array,
    k: int,
    block: int = 1024,
):
    """Host-driven blocked search for galleries/query sets too large for one
    [Q, D] buffer.  Pads the final block to keep shapes static (single compile).
    Returns numpy (distances, indices)."""
    n = queries.shape[0]
    out_d = np.empty((n, k), dtype=np.float32)
    out_i = np.empty((n, k), dtype=np.int64)
    for start in range(0, n, block):
        stop = min(start + block, n)
        chunk = queries[start:stop]
        if chunk.shape[0] < block:  # pad to static shape
            pad = np.zeros((block - chunk.shape[0], chunk.shape[1]),
                           dtype=chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        d, i = l2_topk(jnp.asarray(chunk), database, k)
        out_d[start:stop] = np.asarray(d)[: stop - start]
        out_i[start:stop] = np.asarray(i)[: stop - start]
    return out_d, out_i


def radius_neighbors(points_a: np.ndarray, points_b: np.ndarray,
                     radius: float, block: int = 4096):
    """All indices of ``points_b`` within ``radius`` of each row of
    ``points_a`` — the sklearn ``NearestNeighbors.radius_neighbors``
    equivalent used for geographic ground truth
    (``datasets_ws_kitti360.py:613-618,740-745``).

    Runs blocked on whatever backend JAX has (CPU fine at these sizes);
    returns a list of int64 arrays (variable length per query — host-side
    only, never inside jit).
    """
    a = np.asarray(points_a, dtype=np.float64)
    b = np.asarray(points_b, dtype=np.float64)
    out = []
    r2 = radius * radius
    for start in range(0, a.shape[0], block):
        chunk = a[start : start + block]
        # [q, d] squared distances in float64 on host: UTM coords are ~1e5 m,
        # so float32 matmul identity loses metres of precision — do it exactly.
        diff2 = (
            (chunk[:, None, 0] - b[None, :, 0]) ** 2
            + (chunk[:, None, 1] - b[None, :, 1]) ** 2
        )
        for row in diff2 <= r2:
            out.append(np.flatnonzero(row))
    return out
