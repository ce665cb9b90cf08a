"""nuScenes-AG integration on a mini on-disk fixture (VERDICT r1 item 7):
index-driven construction, pre-resized cam dirs, panorama concat order,
Boston UTM rotation, pre-voxelised LiDAR .npy, aerial tile dirs — no
nuscenes-devkit needed (the devkit is only used by ``build_index``).

Mirrors ``tests/test_data.py``'s KITTI-360 fixture strategy.
Reference: ``datasets_ws_nuscenes.py:489-634,861-901``.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from agplace_tpu.config import nuscenes_config
from agplace_tpu.data.geo import from_latlon
from agplace_tpu.data.nuscenes import (
    _AERIAL_FMT,
    _ANCHORS,
    NuScenesDataset,
    ego_to_utm,
)

LOC = "boston-seaport"
VERSION = "v1.0-trainval"


@pytest.fixture
def nusc_root(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "nuscenes"
    east0, north0, _, _ = from_latlon(*_ANCHORS[LOC])

    # pre-resized camera dirs: each cam a distinct solid colour so the
    # panorama concat order is checkable
    cam_colours = {"CAM_FRONT_LEFT": 40, "CAM_FRONT": 120, "CAM_BACK": 220}
    queries = []
    n_q = 4
    for qi in range(n_q):
        paths = {}
        for cam, colour in cam_colours.items():
            d = root / "samples" / f"{cam}_size256"
            os.makedirs(d, exist_ok=True)
            img = Image.fromarray(
                np.full((64, 96, 3), colour, np.uint8))
            img.save(d / f"q{qi}.jpg")
            paths[cam] = f"samples/{cam}/q{qi}.jpg"
        lidar_d = root / "samples" / "LIDAR_TOP_voxel1"
        os.makedirs(lidar_d, exist_ok=True)
        pc = rng.uniform(-40, 40, (500, 3)).astype(np.float32)
        np.save(lidar_d / f"q{qi}.npy", pc)
        paths["LIDAR_TOP"] = f"samples/LIDAR_TOP/q{qi}.pcd.bin"
        # query UTM: 3 m east of tile qi (inside the 10 m hard radius)
        queries.append({
            "token": f"tok{qi}", "prev": "", "next": "",
            "location": LOC,
            "east": float(east0 + 40 * qi + 3.0),
            "north": float(north0),
            "paths": paths,
        })
    with open(root / f"agplace_index_{VERSION}_train.json", "w") as f:
        json.dump({"version": VERSION, "split": "train",
                   "queries": queries}, f)

    # aerial tile dirs (name format *@east@north@...png, :861-901)
    for maptype in ("satellite", "roadmap"):
        d = root / _AERIAL_FMT.format(version=VERSION, location=LOC,
                                      maptype=maptype)
        os.makedirs(d)
        for ti in range(8):
            img = Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                               dtype=np.uint8))
            east = east0 + 40 * ti
            img.save(d / f"tile@{east}@{north0}@x@.png")
    return str(root)


def _cfg(root, camnames=("fl", "f", "b"), maptype=("satellite", "roadmap")):
    cfg = nuscenes_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, dataroot=root, camnames=camnames, maptype=maptype,
            traindownsample=1, nuscenes_cam_resize=32, db_resize=48,
            vox_max_points=256,
        ),
    )


def test_dataset_from_cached_index(nusc_root):
    cfg = _cfg(nusc_root)
    ds = NuScenesDataset(cfg, "train")
    assert ds.queries_num == 4
    assert ds.database_num == 8
    # geometry: query i sits 3 m from tile i -> hard positive
    for qi in range(4):
        assert qi in ds.hard_positives_per_query[qi]
        assert qi in ds.soft_positives_per_query[qi]
        # tiles 40 m apart: the neighbour tile is not a soft positive
        assert (qi + 1) not in ds.soft_positives_per_query[qi]


def test_panorama_concat_order(nusc_root):
    """The panorama must be [h, w*ncam, 3] concatenated in camnames order
    (``:604-634``)."""
    cfg = _cfg(nusc_root, camnames=("fl", "f", "b"))
    ds = NuScenesDataset(cfg, "train")
    pano = ds.load_query_image(0)
    h, w3, _ = pano.shape
    assert w3 % 3 == 0
    w = w3 // 3
    mean, std = cfg.data.norm_mean[0], cfg.data.norm_std[0]
    # undo the ImageNet normalisation to recover the solid colours
    cols = [(pano[:, i * w : (i + 1) * w, 0].mean() * std + mean) * 255
            for i in range(3)]
    assert abs(cols[0] - 40) < 3    # fl = CAM_FRONT_LEFT
    assert abs(cols[1] - 120) < 3   # f  = CAM_FRONT
    assert abs(cols[2] - 220) < 3   # b  = CAM_BACK
    # reordering camnames reorders the panorama
    cfg2 = _cfg(nusc_root, camnames=("b", "f", "fl"))
    ds2 = NuScenesDataset(cfg2, "train")
    pano2 = ds2.load_query_image(0)
    col0 = (pano2[:, :w, 0].mean() * std + mean) * 255
    assert abs(col0 - 220) < 3


def test_boston_rotation():
    """Boston ego poses rotate 1.5 deg clockwise before the anchor offset
    (``:489-522``); Singapore poses do not rotate."""
    east0, north0, _, _ = from_latlon(*_ANCHORS["boston-seaport"])
    deg = np.pi / 180 * 1.5
    xy = np.array([100.0, 0.0])
    got = ego_to_utm("boston-seaport", xy)
    want = np.array([east0 + 100 * np.cos(deg), north0 + 100 * -np.sin(deg)])
    np.testing.assert_allclose(got, want, atol=1e-6)
    e_s, n_s, _, _ = from_latlon(*_ANCHORS["singapore-onenorth"])
    got_s = ego_to_utm("singapore-onenorth", xy)
    np.testing.assert_allclose(got_s, [e_s + 100, n_s], atol=1e-9)


def test_collate_train_batch(nusc_root):
    """One mined train batch collates at fixed shapes: panorama query
    images, 2-maptype db stacks, voxelised clouds."""
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.train.mining import TripletMiner

    cfg = _cfg(nusc_root)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, train_batch_size=2,
                                       negs_num_per_query=2))
    ds = NuScenesDataset(cfg, "train")
    rng = np.random.default_rng(0)
    rows = TripletMiner(cfg, ds).mine_random(rng, 2)
    batch = collate_train(ds, rows, cfg, rng)
    # cams are 64x96 -> short side 32 -> 32x48 each; 3-cam panorama 32x144
    assert batch["query_image"].shape == (2, 32, 3 * 48, 3)
    # [B, 1+nneg, NMAP, H, W, 3] with NMAP=2 (satellite+roadmap)
    assert batch["db_map"].shape[:3] == (2, 3, 2)
    # default bev backend: collate rasterizes the clouds to a BEVGrid
    gx, gy, gz = cfg.model.mm.vox_grid_extent
    assert batch["vox"].mask.shape == (2, gx, gy, gz)
    assert bool(np.asarray(batch["vox"].mask).any())
