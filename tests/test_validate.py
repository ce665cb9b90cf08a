"""Dataset-layout validator (``agplace_tpu/data/validate.py``) against the
in-repo fixtures — good layouts pass with a dry-build, deliberately broken
layouts fail loudly with a named missing piece (VERDICT r3 item 5).

The fixture builders mirror ``tests/test_data.py::mini_kitti360`` and
``tests/test_nuscenes_fixture.py::nusc_root`` (reference layouts:
``datasets_ws_kitti360.py:45-67,572-607``,
``datasets_ws_nuscenes.py:861-901``).
"""

import json
import os
import shutil

import numpy as np
import pytest

from agplace_tpu.data.validate import main as validate_main


@pytest.fixture
def kitti_root(tmp_path):
    from PIL import Image

    from agplace_tpu.data.geo import from_latlon
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
        for i in range(8):
            lat, lon = lat0 + i * 1e-5, lon0 + i * 1e-5
            e, n, _, _ = from_latlon(lat, lon)
            name = f"img@{float(e):.2f}@{float(n):.2f}@{lat}@{lon}@.png"
            img = Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
            img.save(root / f"data_aerial_1_20_320_satellite/{loc}/{name}")
            img.save(root / f"data_aerial_1_20_320_roadmap/{loc}/{name}")
    return str(root)


def test_kitti360_good_layout_passes(kitti_root, capsys):
    rc = validate_main(["--dataset", "kitti360", "--dataroot", kitti_root])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "LAYOUT OK" in out
    assert "dry-build train" in out and "dry-build test" in out


def test_kitti360_missing_lidar_dir_fails(kitti_root, capsys):
    from agplace_tpu.data.kitti360 import SELECT_LOCATIONS

    shutil.rmtree(os.path.join(kitti_root, "data_3d_voxel0.5",
                               SELECT_LOCATIONS[0]))
    rc = validate_main(["--dataset", "kitti360", "--dataroot", kitti_root,
                        "--no-build"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISSING" in out and "lidar voxel0.5" in out


def test_kitti360_bad_aerial_name_fails(kitti_root, capsys):
    from agplace_tpu.data.kitti360 import SELECT_LOCATIONS

    d = os.path.join(kitti_root, "data_aerial_1_20_320_satellite",
                     SELECT_LOCATIONS[0])
    for name in os.listdir(d):
        os.rename(os.path.join(d, name),
                  os.path.join(d, name.replace("@", "_")))
    rc = validate_main(["--dataset", "kitti360", "--dataroot", kitti_root,
                        "--no-build"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "not '*@east@north@...'" in out


def test_kitti360_wrong_dataroot_fails(tmp_path, capsys):
    rc = validate_main(["--dataset", "kitti360",
                        "--dataroot", str(tmp_path / "nope")])
    assert rc == 1
    assert "dataroot does not exist" in capsys.readouterr().out


@pytest.fixture
def nusc_root(tmp_path):
    from PIL import Image

    from agplace_tpu.data.geo import from_latlon
    from agplace_tpu.data.nuscenes import _AERIAL_FMT, _ANCHORS

    loc, version = "boston-seaport", "v1.0-trainval"
    rng = np.random.default_rng(0)
    root = tmp_path / "nuscenes"
    east0, north0, _, _ = from_latlon(*_ANCHORS[loc])
    queries = []
    for qi in range(4):
        paths = {}
        for cam in ("CAM_FRONT_LEFT", "CAM_FRONT", "CAM_BACK"):
            d = root / "samples" / f"{cam}_size256"
            os.makedirs(d, exist_ok=True)
            Image.fromarray(np.full((64, 96, 3), 90, np.uint8)).save(
                d / f"q{qi}.jpg")
            paths[cam] = f"samples/{cam}/q{qi}.jpg"
        lidar_d = root / "samples" / "LIDAR_TOP_voxel1"
        os.makedirs(lidar_d, exist_ok=True)
        np.save(lidar_d / f"q{qi}.npy",
                rng.uniform(-40, 40, (500, 3)).astype(np.float32))
        paths["LIDAR_TOP"] = f"samples/LIDAR_TOP/q{qi}.pcd.bin"
        queries.append({
            "token": f"tok{qi}", "prev": "", "next": "", "location": loc,
            "east": float(east0 + 40 * qi + 3.0), "north": float(north0),
            "paths": paths,
        })
    with open(root / f"agplace_index_{version}_train.json", "w") as f:
        json.dump({"version": version, "split": "train",
                   "queries": queries}, f)
    for maptype in ("satellite", "roadmap"):
        d = root / _AERIAL_FMT.format(version=version, location=loc,
                                      maptype=maptype)
        os.makedirs(d)
        for ti in range(8):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                d / f"tile@{east0 + 40 * ti}@{north0}@x@.png")
    return str(root)


def test_nuscenes_good_layout_passes(nusc_root, capsys):
    rc = validate_main(["--dataset", "nuscenes", "--dataroot", nusc_root,
                        "--splits", "train"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "LAYOUT OK" in out
    assert "prebuilt index" in out and "dry-build train" in out


def test_nuscenes_missing_voxel_dir_fails(nusc_root, capsys):
    shutil.rmtree(os.path.join(nusc_root, "samples", "LIDAR_TOP_voxel1"))
    rc = validate_main(["--dataset", "nuscenes", "--dataroot", nusc_root,
                        "--splits", "train", "--no-build"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "LIDAR_TOP_voxel1" in out


def test_nuscenes_no_index_no_devkit_fails(nusc_root, capsys):
    os.remove(os.path.join(nusc_root,
                           "agplace_index_v1.0-trainval_train.json"))
    rc = validate_main(["--dataset", "nuscenes", "--dataroot", nusc_root,
                        "--splits", "train", "--no-build"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "neither a prebuilt index" in out
