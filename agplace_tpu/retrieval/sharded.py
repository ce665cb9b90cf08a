"""Mesh-sharded exact retrieval for galleries beyond one chip's HBM
(BASELINE.json config 5: 100k+ aerial tiles).  Replaces the reference's
single-process faiss ``IndexFlatL2`` (``/root/reference/test.py:27-32``)
for galleries that outgrow one device.

Design: the gallery lives sharded over the ``gallery`` mesh axis; each shard
computes its local [Q, k] top-k via matmul, then the per-shard candidates are
all-gathered (k per shard — tiny vs the gallery) and reduced to the global
top-k.  One all-gather of [Q, k*shards] rides ICI; the [Q, D_local] distance
matrices never leave their shard.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agplace_tpu.retrieval.knn import pairwise_sq_l2


def shard_gallery(mesh: Mesh, database, axis: str = "gallery"):
    """Place [D, C] gallery with rows sharded over the gallery axis.
    D must divide evenly; pad with +inf-distance sentinel rows if not."""
    import numpy as np

    db = np.asarray(database)
    n_shards = mesh.shape[axis]
    rem = (-len(db)) % n_shards
    if rem:
        # sentinel rows at huge distance so they never enter a top-k
        pad = np.full((rem, db.shape[1]), 1e18, db.dtype)
        db = np.concatenate([db, pad])
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.device_put(jnp.asarray(db), sharding)


def shard_quant_gallery(mesh: Mesh, database, axis: str = "gallery"):
    """int8 variant of :func:`shard_gallery`: per-row quantize the fp32
    gallery (``knn.quantize_rows``), then shard (int8 rows, scales, exact
    norms) over ``axis``.  4x more gallery rows per chip than fp32.

    Row-count padding uses a large-magnitude sentinel (1e9 per component)
    whose exact squared norm dwarfs any real distance, so sentinel rows
    can never displace a real candidate in a top-k merge.
    """
    import numpy as np

    from agplace_tpu.retrieval.knn import quantize_rows

    db = np.asarray(database, np.float32)
    n_shards = mesh.shape[axis]
    rem = (-len(db)) % n_shards
    if rem:
        db = np.concatenate(
            [db, np.full((rem, db.shape[1]), 1e9, np.float32)])
    q, scale, sq = quantize_rows(db)
    rows = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P(axis, None)))
    sc = jax.device_put(jnp.asarray(scale[:, 0]),
                        NamedSharding(mesh, P(axis)))
    nn = jax.device_put(jnp.asarray(sq), NamedSharding(mesh, P(axis)))
    return rows, sc, nn


def sharded_l2_candidates_int8(mesh: Mesh, queries, quant_gallery, nc: int,
                               axis: str = "gallery"
                               ) -> Tuple[jax.Array, jax.Array]:
    """Approximate global top-``nc`` L2 candidates over an int8 gallery
    sharded on ``axis`` (from :func:`shard_quant_gallery`).

    Same collective shape as :func:`sharded_l2_topk` — per-shard int8
    cross-term scan + local top-k, one [Q, nc*shards] all-gather on ICI,
    global merge — with the int8 approximation confined to the cross
    term (norms are exact fp32).  Feed the indices to an exact re-rank
    (``PlaceIndex._search_int8``) for final ordering.
    """
    db_i8, scale, sq = quant_gallery
    n_shards = mesh.shape[axis]
    shard_rows = db_i8.shape[0] // n_shards
    return _sharded_int8_fn(mesh, axis, shard_rows,
                            min(nc, shard_rows), nc)(
        queries, db_i8, scale, sq)


@functools.lru_cache(maxsize=128)
def _sharded_int8_fn(mesh: Mesh, axis: str, shard_rows: int, nc_local: int,
                     nc: int):
    """Cached jitted shard_map int8 candidate scan (see
    :func:`_sharded_topk_fn`)."""

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def search(q, i8_local, sc_local, sq_local):
        q = q.astype(jnp.float32)
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        qs = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                         1e-12) / 127.0
        q_i8 = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
        cross = jax.lax.dot_general(
            q_i8, i8_local, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        cross = cross * qs * sc_local[None, :]
        d2 = jnp.maximum(q_sq + sq_local[None, :] - 2.0 * cross, 0.0)
        neg, idx = jax.lax.top_k(-d2, nc_local)
        my_shard = jax.lax.axis_index(axis)
        gidx = idx + my_shard * shard_rows
        all_neg = jax.lax.all_gather(neg, axis)
        all_idx = jax.lax.all_gather(gidx, axis)
        q_n = q.shape[0]
        cand_d = jnp.transpose(all_neg, (1, 0, 2)).reshape(q_n, -1)
        cand_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(q_n, -1)
        take = min(nc, cand_d.shape[1])
        best_neg, slot = jax.lax.top_k(cand_d, take)
        best_idx = jnp.take_along_axis(cand_i, slot, axis=1)
        return -best_neg, best_idx

    return search


def sharded_l2_topk(mesh: Mesh, queries, database_sharded, k: int,
                    axis: str = "gallery", n_rows: int = None
                    ) -> Tuple[jax.Array, jax.Array]:
    """Exact global top-k over a gallery sharded on ``axis``.

    queries: [Q, C] (replicated).  Returns (sq_distances [Q, k],
    global indices [Q, k]).  ``n_rows``: the REAL row count before
    :func:`shard_gallery`'s divisibility padding — pass it whenever k can
    reach the gallery size, or the guard below compares k against the
    PADDED count and sentinel rows leak into the result as huge-distance
    valid-looking indices instead of faiss's +inf/-1.
    """
    n_shards = mesh.shape[axis]
    shard_rows = database_sharded.shape[0] // n_shards
    if n_rows is None:
        n_rows = database_sharded.shape[0]
    # a shard smaller than k contributes all its rows; the merge below still
    # sees >= k candidates as long as the full gallery has >= k REAL rows
    # (each real global-top-k row wins its local top-min(k, shard_rows), and
    # sentinel padding always loses to real rows, so with k <= n_rows the
    # merged result is sentinel-free).  For k > n_rows, faiss pads with
    # +inf/-1 — the single-device l2_topk implements that; route there on
    # the sentinel-free row slice.
    if k > n_rows:
        from agplace_tpu.retrieval.knn import l2_topk

        return l2_topk(queries, database_sharded[:n_rows], k)
    return _sharded_topk_fn(mesh, axis, shard_rows,
                            min(k, shard_rows), k)(
        queries, database_sharded)


@functools.lru_cache(maxsize=128)
def _sharded_topk_fn(mesh: Mesh, axis: str, shard_rows: int, k_local: int,
                     k: int):
    """Cached jitted shard_map search: a long-lived server must not
    re-trace the collective program on every call (jax caches per input
    shape inside the returned jit)."""

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        # the final top-k is computed from an all_gather, so it is identical
        # on every shard; the varying-mesh-axes analysis can't infer that
        check_vma=False,
    )
    def search(q, db_local):
        d2 = pairwise_sq_l2(q, db_local)  # [Q, D/shards]
        neg, idx = jax.lax.top_k(-d2, k_local)  # local top-k
        my_shard = jax.lax.axis_index(axis)
        gidx = idx + my_shard * shard_rows
        # gather candidates from every shard: [n_shards, Q, k]
        all_neg = jax.lax.all_gather(neg, axis)
        all_idx = jax.lax.all_gather(gidx, axis)
        q_n = q.shape[0]
        cand_d = jnp.transpose(all_neg, (1, 0, 2)).reshape(q_n, -1)
        cand_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(q_n, -1)
        best_neg, slot = jax.lax.top_k(cand_d, k)
        best_idx = jnp.take_along_axis(cand_i, slot, axis=1)
        return -best_neg, best_idx

    return search
