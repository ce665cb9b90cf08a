"""K-means in JAX (Lloyd iterations as matmuls) — replaces faiss.Kmeans used
for NetVLAD centroid initialisation (``/root/reference/model/aggregation.py:170``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from agplace_tpu.retrieval.knn import pairwise_sq_l2


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter"))
def kmeans(key: jax.Array, points: jax.Array, n_clusters: int,
           n_iter: int = 25):
    """Lloyd's algorithm with k-means++-lite init (random distinct points).

    points: [N, D] float32.  Returns (centroids [K, D], assignments [N]).
    Every iteration is a [N, K] distance matmul + segment mean — MXU-friendly
    and fully jittable (fixed iteration count, as faiss.Kmeans uses).
    """
    n = points.shape[0]
    init_idx = jax.random.choice(key, n, shape=(n_clusters,), replace=False)
    centroids = points[init_idx]

    def step(centroids, _):
        d2 = pairwise_sq_l2(points, centroids)  # [N, K]
        assign = jnp.argmin(d2, axis=-1)  # [N]
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=points.dtype)
        counts = jnp.sum(one_hot, axis=0)  # [K]
        sums = jnp.dot(one_hot.T, points,
                       preferred_element_type=jnp.float32)  # [K, D]
        new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
        # keep empty clusters where they were
        new_centroids = jnp.where(counts[:, None] > 0, new_centroids,
                                  centroids)
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iter)
    assign = jnp.argmin(pairwise_sq_l2(points, centroids), axis=-1)
    return centroids, assign
