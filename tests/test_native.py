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


def test_overflow_rule_identical_across_backends():
    """At capacity overflow all three voxelizers must keep the SAME point set
    (lexicographically-smallest `capacity` unique voxels, ascending order) —
    otherwise there is silent train/serve skew between the C++ collate path
    and the jitted quantize() path."""
    import jax.numpy as jnp

    from agplace_tpu.sparse.voxels import GRID_RADIUS, quantize

    rng = np.random.default_rng(3)
    cap = 128
    # dense cloud: far more than `cap` unique voxels, shuffled scan order
    pts = rng.uniform(-100, 100, (3, 6000, 3)).astype(np.float32)

    native_coords, native_mask = voxelize_batch_native(
        pts, 2.0, cap, GRID_RADIUS)

    sv = quantize(jnp.asarray(pts), 2.0, cap)
    jax_coords, jax_mask = np.asarray(sv.coords), np.asarray(sv.mask)

    # numpy fallback (same code as batched_from_pointclouds' else-branch)
    finite = np.all(np.isfinite(pts), axis=-1)
    call = np.clip(np.floor(pts / 2.0).astype(np.int32),
                   -GRID_RADIUS + 1, GRID_RADIUS - 1)
    np_coords = np.zeros((3, cap, 3), np.int32)
    np_mask = np.zeros((3, cap), bool)
    for i in range(3):
        uniq = np.unique(call[i][finite[i]], axis=0)
        k = min(len(uniq), cap)
        np_coords[i, :k] = uniq[:k]
        np_mask[i, :k] = True

    assert native_mask.sum() == jax_mask.sum() == np_mask.sum() == 3 * cap
    np.testing.assert_array_equal(native_coords, jax_coords)
    np.testing.assert_array_equal(native_coords, np_coords)
    np.testing.assert_array_equal(native_mask, jax_mask)


def test_overflow_rule_scan_order_invariant():
    """The kept voxel set must not depend on the order points arrive in."""
    rng = np.random.default_rng(4)
    pts = rng.uniform(-100, 100, (1, 4000, 3)).astype(np.float32)
    shuffled = pts[:, rng.permutation(4000)]
    c1, m1 = voxelize_batch_native(pts, 2.0, 64)
    c2, m2 = voxelize_batch_native(shuffled, 2.0, 64)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(m1, m2)


def test_native_through_collate_path():
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    rng = np.random.default_rng(2)
    pts = rng.uniform(-50, 50, (2, 1000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, 2.0, 2048)
    assert int(sv.mask.sum()) > 0
    ref_sets = _numpy_ref(pts, 2.0, 2048)
    got = {tuple(r) for r in np.asarray(sv.coords[0])[np.asarray(sv.mask[0])]}
    assert got == ref_sets[0]
