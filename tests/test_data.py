"""Data-layer tests: UTM conversion vectors, transforms vs reference
semantics, pc augmentation invariants, projections, and the KITTI-360 loader
on a fabricated mini dataset tree (golden indexing determinism)."""

import os

import numpy as np
import pytest

from agplace_tpu.config import kitti360_config
from agplace_tpu.data.geo import from_latlon
from agplace_tpu.data.pc_augment import (
    jitter_points,
    random_flip,
    random_rotation,
    remove_random_block,
    remove_random_points,
)
from agplace_tpu.data.projections import (
    generate_bev_from_pc,
    generate_sph_from_pc,
)
from agplace_tpu.data.transforms import (
    center_crop,
    five_crops,
    normalize,
    resize,
)


def test_utm_matches_utm_package_vectors():
    # test vectors from the `utm` pip package (which the reference uses)
    vec = [
        ((51.2, 7.5), (395201.3103811303, 5673135.241182375, 32, "U")),
        ((-33.92487, 18.42406), (261877.8164, 6243185.5892, 34, "H")),
        ((40.71435, -74.00597), (583959.9594, 4507523.0869, 18, "T")),
    ]
    for (lat, lon), (ee, en, ez, el) in vec:
        e, n, z, letter = from_latlon(lat, lon)
        assert abs(float(e) - ee) < 0.01, (lat, lon)
        assert abs(float(n) - en) < 0.01
        assert int(z) == ez and str(letter) == el


def test_utm_vectorised():
    lats = np.array([51.2, 49.0])
    lons = np.array([7.5, 8.4])
    e, n, z, letters = from_latlon(lats, lons)
    assert e.shape == (2,) and int(z[0]) == 32


def test_resize_short_side():
    img = np.zeros((100, 200, 3), np.float32)
    out = resize(img, 50)
    assert out.shape == (50, 100, 3)
    out = resize(img, (64, 64))
    assert out.shape == (64, 64, 3)


def test_center_crop():
    img = np.arange(10 * 10 * 3, dtype=np.float32).reshape(10, 10, 3)
    out = center_crop(img, 4)
    np.testing.assert_array_equal(out, img[3:7, 3:7])
    # padding path
    out = center_crop(img, 12)
    assert out.shape == (12, 12, 3)


def test_normalize():
    img = np.full((4, 4, 3), 0.5, np.float32)
    out = normalize(img, (0.5, 0.5, 0.5), (0.22, 0.22, 0.22))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_five_crops():
    img = np.random.default_rng(0).random((100, 120, 3)).astype(np.float32)
    crops = five_crops(img, 64)
    assert crops.shape == (5, 64, 64, 3)
    np.testing.assert_array_equal(crops[0], img[:64, :64])


def test_pc_augment_preserves_shape_and_nan():
    rng = np.random.default_rng(0)
    pc = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    pc[90:] = np.nan
    for fn in (lambda p: random_flip(p, rng),
               lambda p: random_rotation(p, rng, max_deg=5),
               lambda p: jitter_points(p, rng),
               lambda p: remove_random_points(p, rng, 0.1),
               lambda p: remove_random_block(p, rng)):
        out = fn(pc)
        assert out.shape == pc.shape
        assert np.isnan(out[90:]).all()  # padding stays padding


def test_rotation_preserves_norms():
    rng = np.random.default_rng(1)
    pc = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
    out = random_rotation(pc, rng, axis=2, max_deg=30)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(pc, axis=1), rtol=1e-5)
    np.testing.assert_allclose(out[:, 2], pc[:, 2], rtol=1e-5)  # z fixed


def test_projections_shapes():
    rng = np.random.default_rng(2)
    pc = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    bev = generate_bev_from_pc(pc, w=200, max_thd=100)
    assert bev.shape == (201, 201)
    sph = generate_sph_from_pc(pc)
    assert sph.shape == (61, 361)
    assert (sph >= 0).all()


@pytest.fixture
def mini_kitti360(tmp_path):
    """Fabricate the KITTI-360-AG directory layout with 2 drives."""
    from PIL import Image

    from agplace_tpu.data.kitti360 import SELECT_LOCATIONS

    root = tmp_path / "KITTI-360"
    rng = np.random.default_rng(0)
    lat0, lon0 = 48.98, 8.43
    for loc in SELECT_LOCATIONS[:2]:
        for sub in ["data_3d_voxel0.5/{}/velodyne_points/data",
                    "data_poses/{}/oxts/data",
                    "data_2d_raw_resize320/{}/image_00/data_rect",
                    "data_2d_cat0203/{}/image_0203/data_rgb",
                    "data_aerial_1_20_320_satellite/{}",
                    "data_aerial_1_20_320_roadmap/{}"]:
            os.makedirs(root / sub.format(loc), exist_ok=True)
        for i in range(10):
            stem = f"{i:010d}"
            lat, lon = lat0 + i * 1e-5, lon0 + i * 1e-5
            (root / f"data_poses/{loc}/oxts/data/{stem}.txt").write_text(
                f"{lat} {lon} 110.0 0 0 0")
            img = Image.fromarray(
                rng.integers(0, 255, (40, 60, 3), dtype=np.uint8))
            img.save(root / f"data_2d_raw_resize320/{loc}/image_00/"
                            f"data_rect/{stem}.png")
            img.save(root / f"data_2d_cat0203/{loc}/image_0203/"
                            f"data_rgb/{stem}.png")
            pc = rng.uniform(-50, 50, (200, 3)).astype(np.float32)
            pc.tofile(root / f"data_3d_voxel0.5/{loc}/velodyne_points/"
                             f"data/{stem}.bin")
        from agplace_tpu.data.geo import from_latlon as fll

        for i in range(8):
            lat, lon = lat0 + i * 1e-5, lon0 + i * 1e-5
            e, n, _, _ = fll(lat, lon)
            name = f"img@{float(e):.2f}@{float(n):.2f}@{lat}@{lon}@.png"
            img = Image.fromarray(
                rng.integers(0, 255, (320, 320, 3), dtype=np.uint8))
            img.save(root / f"data_aerial_1_20_320_satellite/{loc}/{name}")
            img.save(root / f"data_aerial_1_20_320_roadmap/{loc}/{name}")
    return str(root)


def test_kitti360_loader(mini_kitti360):
    import dataclasses

    from agplace_tpu.data.kitti360 import KITTI360Dataset

    cfg = kitti360_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataroot=mini_kitti360,
                                      q_resize=32, db_cropsize=32,
                                      db_resize=32, vox_max_points=128))
    train = KITTI360Dataset(cfg, "train")
    test = KITTI360Dataset(cfg, "test")
    # split: 10 per drive * 0.85 -> 8 train (stride 4 -> 2), 2 test; 2 drives
    assert train.queries_num == 4 and test.queries_num == 4
    # db: 8 tiles * 0.85 -> 6 train (stride 4 -> 2), 2 test; 2 drives
    assert train.database_num == 4 and test.database_num == 4

    img = train.load_query_image(0)
    assert img.shape[0] == 32 and img.shape[2] == 3
    pts = train.load_query_points(0)
    assert pts.shape == (4 * 128, 3)
    assert np.isfinite(pts[:200]).all() and np.isnan(pts[200:]).all()
    maps = train.load_db_maps(0)
    assert maps.shape == (1, 32, 32, 3)

    # geographic ground truth is consistent with UTM distances
    for q in range(test.queries_num):
        d = np.linalg.norm(test.db_eastnorth - test.q_eastnorth[q], axis=1)
        expected = np.flatnonzero(d <= 25.0)
        np.testing.assert_array_equal(
            np.sort(test.soft_positives_per_query[q]), expected)
