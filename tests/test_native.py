"""Native C++ voxelizer: parity with the numpy implementation + speed."""

import numpy as np
import pytest

from agplace_tpu.native import get_lib, voxelize_batch_native


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C++ toolchain available")


def _numpy_ref(pts, quant, capacity, radius=64):
    finite = np.all(np.isfinite(pts), axis=-1)
    coords = np.floor(np.nan_to_num(pts) / quant).astype(np.int32)
    np.clip(coords, -radius + 1, radius - 1, out=coords)
    sets = []
    for i in range(pts.shape[0]):
        c = coords[i][finite[i]]
        sets.append({tuple(r) for r in c})
    return sets


def test_native_matches_numpy_sets():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (4, 3000, 3)).astype(np.float32)
    pts[:, 2900:] = np.nan  # padding rows
    coords, mask = voxelize_batch_native(pts, 2.0, 4096)
    ref_sets = _numpy_ref(pts, 2.0, 4096)
    for i in range(4):
        got = {tuple(r) for r in coords[i][mask[i]]}
        assert got == ref_sets[i]
        # padded tail is zeroed and unmasked
        assert not mask[i][len(got):].any()
        assert (coords[i][~mask[i]] == 0).all()


def test_native_capacity_truncation():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-100, 100, (2, 5000, 3)).astype(np.float32)
    coords, mask = voxelize_batch_native(pts, 2.0, 64)
    assert mask.sum(axis=1).max() <= 64
    # all kept voxels are unique
    for i in range(2):
        kept = coords[i][mask[i]]
        assert len(np.unique(kept, axis=0)) == len(kept)


def test_native_through_collate_path():
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    rng = np.random.default_rng(2)
    pts = rng.uniform(-50, 50, (2, 1000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, 2.0, 2048)
    assert int(sv.mask.sum()) > 0
    ref_sets = _numpy_ref(pts, 2.0, 2048)
    got = {tuple(r) for r in np.asarray(sv.coords[0])[np.asarray(sv.mask[0])]}
    assert got == ref_sets[0]
