"""Batched descriptor extraction shared by eval and mining.

Queue/drain pattern for remote-attached backends: all batches are dispatched
asynchronously, trimmed and concatenated ON DEVICE, and fetched with a
single host transfer (per-batch fetches serialize at ~25 ms round trip
each).

With a ``mesh``, each batch is placed with its leading axis sharded over the
``data`` mesh axis so the jitted embed fns run data-parallel across chips —
the reference's cache/eval passes are single-GPU (``test.py:109-176``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from agplace_tpu.config import Config
from agplace_tpu.data.base import PlaceDataset, collate_cache_db, collate_cache_q


def _drain(parts, keeps) -> np.ndarray:
    if not parts:
        return np.empty((0, 0), np.float32)
    return np.asarray(
        jnp.concatenate([p[:k] for p, k in zip(parts, keeps)]))


def _put(batch, mesh):
    if mesh is None:
        return batch
    from agplace_tpu.parallel.mesh import shard_batch

    return shard_batch(mesh, batch)


def batched_embed_db(ds: PlaceDataset, indices: Sequence[int], embed_db,
                     params, batch_stats, bs: int,
                     mesh=None) -> np.ndarray:
    parts, keeps = [], []
    for s in range(0, len(indices), bs):
        chunk = list(indices[s : s + bs])
        keep = len(chunk)
        if keep < bs:
            chunk = chunk + [chunk[-1]] * (bs - keep)
        maps = _put(collate_cache_db(ds, chunk), mesh)
        parts.append(embed_db(params, batch_stats, maps))
        keeps.append(keep)
    return _drain(parts, keeps)


def batched_embed_q(ds: PlaceDataset, indices: Sequence[int], embed_q,
                    params, batch_stats, bs: int, cfg: Config,
                    mesh=None) -> np.ndarray:
    parts, keeps = [], []
    for s in range(0, len(indices), bs):
        chunk = list(indices[s : s + bs])
        keep = len(chunk)
        if keep < bs:
            chunk = chunk + [chunk[-1]] * (bs - keep)
        images, vox = collate_cache_q(ds, chunk, cfg)
        images, vox = _put(images, mesh), _put(vox, mesh)
        parts.append(embed_q(params, batch_stats, images, vox))
        keeps.append(keep)
    return _drain(parts, keeps)


def batched_embed_q_crops(ds, indices: Sequence[int], embed_q, params,
                          batch_stats, bs: int, cfg: Config,
                          mesh=None) -> np.ndarray:
    """Five-crops variant: returns [5*len(indices), dim], crop-major per
    query (``test.py:159-172`` layout)."""
    from agplace_tpu.data.base import prepare_query_vox

    parts, keeps = [], []
    for s in range(0, len(indices), bs):
        chunk = list(indices[s : s + bs])
        keep = len(chunk)
        if keep < bs:
            chunk = chunk + [chunk[-1]] * (bs - keep)
        crops = np.stack([ds.load_query_crops(i, cfg.data.q_resize)
                          for i in chunk])  # [bs, 5, H, W, 3]
        pts = np.stack([ds.load_query_points(i) for i in chunk])
        vox = prepare_query_vox(cfg, np.repeat(pts, 5, axis=0))
        flat = _put(crops.reshape(-1, *crops.shape[2:]), mesh)
        out = embed_q(params, batch_stats, flat, _put(vox, mesh))  # [bs*5, dim]
        parts.append(out.reshape(bs, 5, -1))
        keeps.append(keep)
    if not parts:
        return np.empty((0, 0), np.float32)
    stacked = np.asarray(
        jnp.concatenate([p[:k] for p, k in zip(parts, keeps)]))
    return stacked.reshape(-1, stacked.shape[-1])
