"""Dataset interface + fixed-shape collates.

The reference couples datasets to torch DataLoaders with bespoke collate
functions per mode (train triplets / cache-db / cache-q,
``datasets_ws_kitti360.py:88-228``).  Here a dataset is a plain object
exposing numpy item loaders; ``collate_*`` build the fixed-shape device
batches the jitted steps consume.  Worker-thread prefetching lives in
``pipeline.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from agplace_tpu.config import Config
from agplace_tpu.sparse.voxels import batched_from_pointclouds


class PlaceDataset:
    """Protocol both towers' data sources implement.

    Indices [0, database_num) are aerial tiles; queries are separate.
    Geometry is UTM east/north in metres (reference convention).
    """

    database_num: int = 0
    queries_num: int = 0
    db_eastnorth: np.ndarray  # [database_num, 2] float64
    q_eastnorth: np.ndarray  # [queries_num, 2] float64

    # eval ground truth: db indices within val_positive_dist_threshold
    soft_positives_per_query: List[np.ndarray]
    # mining ground truth: db indices within train_positives_dist_threshold
    hard_positives_per_query: Optional[List[np.ndarray]] = None

    def load_query_image(self, idx: int) -> np.ndarray:  # [H, W, 3] f32
        raise NotImplementedError

    def load_query_points(self, idx: int) -> np.ndarray:  # [P, 3] f32 (NaN pad)
        raise NotImplementedError

    def load_db_maps(self, idx: int) -> np.ndarray:  # [NMAP, H, W, 3] f32
        raise NotImplementedError


def _rot_z(points: np.ndarray, angle_rad: float) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return points @ rot.T


def collate_train(
    ds: PlaceDataset,
    triplets: np.ndarray,  # [B, 2+nneg] global ids: (query, pos, negs...)
    cfg: Config,
    rng: np.random.Generator,
) -> Dict:
    """Build one training batch.  Mirrors ``kitti360_collate_fn``
    (``datasets_ws_kitti360.py:88-151``): stacked query images, batch-level
    ±5° z-rotation on all point clouds, [B, 1+nneg] aerial tile stacks, and
    local triplet indices offset by (2+nneg)·i.
    """
    b = triplets.shape[0]
    nneg = triplets.shape[1] - 2
    images = np.stack([ds.load_query_image(q) for q in triplets[:, 0]])
    pts = np.stack([ds.load_query_points(q) for q in triplets[:, 0]])
    if cfg.data.pc_rot_aug_deg > 0:
        ang = np.deg2rad(rng.uniform(-cfg.data.pc_rot_aug_deg,
                                     cfg.data.pc_rot_aug_deg))
        pts = _rot_z(pts, ang)  # batch-level rotation, as the reference
    db_maps = np.stack([
        np.stack([ds.load_db_maps(d) for d in row[1:]]) for row in triplets
    ])  # [B, 1+nneg, NMAP, H, W, 3]
    q_en = ds.q_eastnorth[triplets[:, 0]].astype(np.float32)
    db_en = np.stack([ds.db_eastnorth[row[1:]] for row in triplets]).astype(
        np.float32)

    # local triplet indices into the flattened [B*(2+nneg)] feature matrix:
    # within sample i, 0 = query, 1 = positive, 2+j = negative j
    # (kitti360:130-131 builds the same indices with a 12·i offset)
    group = 2 + nneg
    tri = np.zeros((b * nneg, 3), np.int32)
    for i in range(b):
        for j in range(nneg):
            tri[i * nneg + j] = (i * group, i * group + 1, i * group + 2 + j)

    vox = prepare_query_vox(cfg, pts)
    return {
        "query_image": images,
        "vox": vox,
        "query_eastnorth": q_en,
        "db_map": db_maps,
        "db_eastnorth": db_en,
        "triplets_local": tri,
    }


def prepare_query_vox(cfg: Config, pts: np.ndarray):
    """Point clouds [B, P, 3] -> the query tower's voxel input, built on
    HOST (the input-pipeline side of the device boundary, like the
    reference's collate-time ME calls, ``kitti360:120-127``).

    For the live MM + BEV-backend configuration this rasterizes straight
    to the folded occupancy grid (``BEVGrid``), skipping the ~1.8 ms/batch
    on-device scatter; every other configuration gets padded
    ``SparseVoxels``."""
    vox = batched_from_pointclouds(pts, cfg.data.quant_size,
                                   cfg.data.vox_max_points)
    m = cfg.model
    if (m.modelq == "mm" and m.mm.voxfe_backend == "bev"
            and "vox" in m.mm.output_type):
        from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host

        return rasterize_from_voxels_host(vox, m.mm.vox_grid_extent)
    return vox


def collate_cache_db(ds: PlaceDataset, indices: Sequence[int]) -> np.ndarray:
    """[B, NMAP, H, W, 3] aerial stack (``kitti360_collate_fn_cache_db``)."""
    return np.stack([ds.load_db_maps(i) for i in indices])


def collate_cache_q(ds: PlaceDataset, indices: Sequence[int], cfg: Config):
    """Query images + voxels (``kitti360_collate_fn_cache_q``)."""
    images = np.stack([ds.load_query_image(i) for i in indices])
    pts = np.stack([ds.load_query_points(i) for i in indices])
    return images, prepare_query_vox(cfg, pts)


def pad_positives(positives: List[np.ndarray], pad_to: Optional[int] = None):
    """Variable-length positive sets -> fixed [Q, P_max] matrix + counts
    (-1 padded), so mining stays fixed-shape on device."""
    p_max = pad_to or max((len(p) for p in positives), default=1)
    p_max = max(p_max, 1)
    out = np.full((len(positives), p_max), -1, np.int64)
    for i, p in enumerate(positives):
        k = min(len(p), p_max)
        out[i, :k] = p[:k]
    counts = np.array([min(len(p), p_max) for p in positives], np.int64)
    return out, counts
