"""z-fold conv fast path: must be exactly equivalent to the 3D conv path
for thin grids (Z <= k//2 + 1)."""

import numpy as np
import jax
import jax.numpy as jnp

from agplace_tpu.sparse.dense_grid import DenseVoxelGrid, GridConv


def _grid(rng, z, c=8, xy=12):
    return DenseVoxelGrid(
        feats=jnp.asarray(rng.standard_normal((2, xy, xy, z, c)),
                          jnp.float32),
        mask=jnp.asarray(rng.random((2, xy, xy, z)) < 0.5),
        stride=1,
    )


def test_zfold_matches_conv3d():
    rng = np.random.default_rng(0)
    for z in (1, 2):
        g = _grid(rng, z)
        conv = GridConv(features=6, kernel_size=3,
                        compute_dtype=jnp.float32)
        v = conv.init(jax.random.PRNGKey(0), g)
        out_fold = conv.apply(v, g)  # z <= 2 takes the zfold path

        # force the 3D path by padding z beyond the threshold with empties
        pad_z = 4
        gf = jnp.zeros((2, 12, 12, pad_z, 8), jnp.float32)
        gf = gf.at[:, :, :, :z, :].set(g.feats)
        gm = jnp.zeros((2, 12, 12, pad_z), bool).at[:, :, :, :z].set(g.mask)
        g3 = DenseVoxelGrid(feats=gf, mask=gm, stride=1)
        out_3d = conv.apply(v, g3)

        np.testing.assert_allclose(
            np.asarray(out_fold.feats),
            np.asarray(out_3d.feats[:, :, :, :z, :]),
            rtol=1e-4, atol=1e-5)
        assert out_fold.stride == 1
        np.testing.assert_array_equal(np.asarray(out_fold.mask),
                                      np.asarray(g.mask))
