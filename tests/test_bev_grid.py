"""BEV-folded backend: exact equivalence with the dense-grid backend under
the SAME parameters (the two share a parameter tree by construction).  The
dense backend is itself oracle-equivalent to the gather-GEMM sparse conv
(tests/test_dense_grid.py), so this transitively pins the BEV backend to ME
generalized-sparse-conv semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agplace_tpu.sparse.bev_grid import (
    BEVConv,
    BEVMinkFPN,
    BEVMinkGeM,
    bev_global_avg,
    fold,
    unfold,
)
from agplace_tpu.sparse.dense_grid import (
    DenseMinkFPN,
    GridConv,
    GridMinkGeM,
    densify,
    grid_global_avg,
)
from agplace_tpu.sparse.voxels import batched_from_pointclouds


def _grid(seed=0, b=2, extent=(16, 16, 6), n=300, c=1):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-14, 14, (b, n, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 5, (b, n))
    sv = batched_from_pointclouds(pts, 2.0, 256)
    g = densify(sv, extent=extent)
    if c > 1:
        feats = rng.standard_normal(
            g.feats.shape[:-1] + (c,)).astype(np.float32)
        g = g.replace(feats=jnp.asarray(feats) * g.mask[..., None])
    return g


@pytest.mark.parametrize("k,s,z,cin,cout", [
    (3, 1, 6, 4, 8),
    (5, 1, 6, 1, 8),
    (1, 1, 6, 4, 8),
    (2, 2, 6, 4, 4),
    (2, 2, 5, 4, 4),  # odd z downsample
    (3, 1, 1, 4, 8),  # z=1
    (2, 2, 1, 4, 4),
])
def test_bev_conv_matches_grid_conv(k, s, z, cin, cout):
    g = _grid(seed=k * 10 + s, extent=(12, 14, z), c=cin)
    dense = GridConv(cout, kernel_size=k, stride=s,
                     compute_dtype=jnp.float32)
    bev = BEVConv(cout, kernel_size=k, stride=s, compute_dtype=jnp.float32)
    v = dense.init(jax.random.PRNGKey(0), g)
    out_d = dense.apply(v, g)
    out_b = bev.apply(v, fold(g))  # SAME params
    assert out_b.z == out_d.feats.shape[3]
    np.testing.assert_array_equal(np.asarray(out_b.mask),
                                  np.asarray(out_d.mask))
    np.testing.assert_allclose(np.asarray(unfold(out_b).feats),
                               np.asarray(out_d.feats), rtol=1e-4,
                               atol=1e-4)


def test_bev_fpn_matches_dense_fpn():
    g = _grid(seed=3, extent=(16, 16, 4))
    kw = dict(out_channels=32, planes=(8, 16, 32), layers=(1, 1, 1),
              num_top_down=0, conv0_kernel_size=5, block="eca", train=False)
    dense = DenseMinkFPN(**kw)
    bev = BEVMinkFPN(**kw)
    v = dense.init(jax.random.PRNGKey(1), g)
    out_d, maps_d = dense.apply(v, g)
    out_b, maps_b = bev.apply(v, fold(g))  # SAME params
    np.testing.assert_allclose(np.asarray(unfold(out_b).feats),
                               np.asarray(out_d.feats), rtol=2e-3,
                               atol=2e-3)
    for mb, md in zip(maps_b, maps_d):
        np.testing.assert_allclose(np.asarray(bev_global_avg(mb)),
                                   np.asarray(grid_global_avg(md)),
                                   rtol=2e-3, atol=2e-3)


def test_bev_fpn_topdown_matches_dense():
    g = _grid(seed=4, extent=(16, 16, 4))
    kw = dict(out_channels=16, planes=(8, 16, 16), layers=(1, 1, 1),
              num_top_down=2, conv0_kernel_size=5, block="basic",
              train=False)
    dense = DenseMinkFPN(**kw)
    bev = BEVMinkFPN(**kw)
    v = dense.init(jax.random.PRNGKey(2), g)
    out_d, maps_d = dense.apply(v, g)
    out_b, maps_b = bev.apply(v, fold(g))
    assert len(maps_b) == len(maps_d)
    np.testing.assert_allclose(np.asarray(unfold(out_b).feats),
                               np.asarray(out_d.feats), rtol=2e-3,
                               atol=2e-3)


def test_bev_train_mode_bn_stats_match():
    """Train-mode BN: batch stats computed over occupied cells must match the
    dense backend, including the mutated running averages."""
    g = _grid(seed=5, extent=(12, 12, 4))
    kw = dict(out_channels=16, planes=(8, 16, 16), layers=(1, 1, 1),
              num_top_down=0, conv0_kernel_size=3, block="basic", train=True)
    dense = DenseMinkFPN(**kw)
    bev = BEVMinkFPN(**kw)
    v = dense.init(jax.random.PRNGKey(3), g)
    out_d, mut_d = dense.apply(v, g, mutable=["batch_stats"])
    out_b, mut_b = bev.apply(v, fold(g), mutable=["batch_stats"])
    key = lambda kv: str(kv[0])
    for (pa, a), (pb, bb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(mut_d), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(mut_b), key=key)):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(unfold(out_b[0]).feats),
                               np.asarray(out_d[0].feats), rtol=2e-3,
                               atol=2e-3)


def test_bev_gem_matches_grid_gem():
    g = _grid(seed=6, extent=(12, 12, 4), c=8)
    gd = GridMinkGeM()
    gb = BEVMinkGeM()
    v = gd.init(jax.random.PRNGKey(4), g)
    np.testing.assert_allclose(np.asarray(gb.apply(v, fold(g))),
                               np.asarray(gd.apply(v, g)), rtol=1e-5,
                               atol=1e-6)


def test_bev_gradients_flow():
    """The folded-kernel construction must be differentiable wrt the 3D
    kernel parameter."""
    g = _grid(seed=7, extent=(12, 12, 4), c=4)
    bev = BEVConv(8, kernel_size=3, compute_dtype=jnp.float32)
    v = bev.init(jax.random.PRNGKey(5), fold(g))

    def loss(params):
        out = bev.apply(params, fold(g))
        return jnp.sum(out.feats ** 2)

    grads = jax.grad(loss)(v)
    gk = np.asarray(grads["params"]["kernel"])
    assert gk.shape == (3, 3, 3, 4, 8)
    assert np.isfinite(gk).all() and (np.abs(gk) > 0).any()


def test_mm_bev_backend_matches_dense_backend():
    """Full MM tower: identical params, identical embeddings across the bev
    and dense voxel backends (float32)."""
    import dataclasses

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.models.mm import MM

    cfg = synthetic_config(image_size=32, vox_max_points=128)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    pts = rng.uniform(-30, 30, (2, 500, 3)).astype(np.float32)
    vox = batched_from_pointclouds(pts, 2.0, 128)

    mm_dense = MM(config=dataclasses.replace(
        cfg.model.mm, voxfe_backend="dense"), train=False)
    mm_bev = MM(config=dataclasses.replace(
        cfg.model.mm, voxfe_backend="bev"), train=False)
    v = jax.jit(mm_dense.init)(jax.random.PRNGKey(0), imgs, vox)
    out_d = mm_dense.apply(v, imgs, vox)
    out_b = mm_bev.apply(v, imgs, vox)  # SAME params
    np.testing.assert_allclose(np.asarray(out_b["embedding"]),
                               np.asarray(out_d["embedding"]),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("block", ["aspp", "convnext"])
def test_minkloc_variant_blocks_bev_match_dense(block):
    """models_minkloc ASPP / sparse-ConvNeXt blocks (DEAD in the reference,
    rebuilt with intended behaviour): bev and dense implementations agree
    under shared params, both standalone and inside the FPN registry."""
    from agplace_tpu.sparse.bev_grid import BEVASPP, BEVConvNextBlock
    from agplace_tpu.sparse.dense_grid import GridASPP, GridConvNextBlock

    g = _grid(seed=11, extent=(12, 12, 4), c=8)
    dense_cls = {"aspp": GridASPP, "convnext": GridConvNextBlock}[block]
    bev_cls = {"aspp": BEVASPP, "convnext": BEVConvNextBlock}[block]
    d = dense_cls(planes=8)
    bv = bev_cls(planes=8)
    v = d.init(jax.random.PRNGKey(0), g)
    out_d = d.apply(v, g)
    out_b = bv.apply(v, fold(g))
    np.testing.assert_allclose(np.asarray(unfold(out_b).feats),
                               np.asarray(out_d.feats), rtol=2e-3, atol=2e-3)

    # channel-changing position inside the FPN (planes change at stage 1)
    kw = dict(out_channels=16, planes=(8, 16, 16), layers=(1, 1, 1),
              num_top_down=0, conv0_kernel_size=3, block=block, train=False)
    fd = DenseMinkFPN(**kw)
    fb = BEVMinkFPN(**kw)
    vf = fd.init(jax.random.PRNGKey(1), g)
    od, _ = fd.apply(vf, g)
    ob, _ = fb.apply(vf, fold(g))
    np.testing.assert_allclose(np.asarray(unfold(ob).feats),
                               np.asarray(od.feats), rtol=2e-3, atol=2e-3)


def test_general_minkfpn_alias():
    """GeneralMinkFPN (reference ``models/minkfpn.py:131-205``) == the FPN
    with no top-down pass, on both backends."""
    from agplace_tpu.sparse import bev_grid, dense_grid

    g = _grid(seed=12, extent=(12, 12, 4))
    gen_d = dense_grid.GeneralMinkFPN(out_channels=16, planes=(8, 16),
                                      layers=(1, 1), block="basic")
    assert gen_d.num_top_down == 0
    v = gen_d.init(jax.random.PRNGKey(0), g)
    out, maps = gen_d.apply(v, g)
    assert out.channels == 16 and len(maps) == 2
    gen_b = bev_grid.GeneralMinkFPN(out_channels=16, planes=(8, 16),
                                    layers=(1, 1), block="basic")
    ob, _ = gen_b.apply(v, fold(g))
    np.testing.assert_allclose(np.asarray(unfold(ob).feats),
                               np.asarray(out.feats), rtol=2e-3, atol=2e-3)


def test_bev_gradients_match_dense_backend():
    """Training-path guard: parameter gradients through the BEV FPN equal
    the dense backend's under shared params (float32)."""
    g = _grid(seed=13, extent=(16, 16, 4))
    kw = dict(out_channels=16, planes=(8, 16, 16), layers=(1, 1, 1),
              num_top_down=0, conv0_kernel_size=5, block="eca", train=True)
    dense = DenseMinkFPN(**kw)
    bev = BEVMinkFPN(**kw)
    v = dense.init(jax.random.PRNGKey(7), g)

    def loss_d(p):
        out, _ = dense.apply({"params": p,
                              "batch_stats": v["batch_stats"]}, g,
                             mutable=["batch_stats"])
        return jnp.sum(out[0].feats.astype(jnp.float32) ** 2)

    def loss_b(p):
        out, _ = bev.apply({"params": p,
                            "batch_stats": v["batch_stats"]}, fold(g),
                           mutable=["batch_stats"])
        return jnp.sum(out[0].feats.astype(jnp.float32) ** 2)

    gd = jax.grad(loss_d)(v["params"])
    gb = jax.grad(loss_b)(v["params"])
    leaves_d = jax.tree_util.tree_leaves_with_path(gd)
    leaves_b = {str(p): l for p, l in
                jax.tree_util.tree_leaves_with_path(gb)}
    assert len(leaves_d) == len(leaves_b)
    for path, a in leaves_d:
        b = leaves_b[str(path)]
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3 * scale,
                                   err_msg=str(path))


def test_host_rasterizer_matches_device_densify():
    """rasterize_from_voxels_host (the input-pipeline path) must equal
    bev_densify (the on-device scatter) exactly — mask and feats — on
    random clouds with NaN padding and out-of-extent points."""
    import numpy as np

    from agplace_tpu.sparse.bev_grid import (
        bev_densify,
        rasterize_from_voxels_host,
    )
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    rng = np.random.default_rng(0)
    pts = rng.uniform(-300, 300, (3, 500, 3)).astype(np.float32)
    pts[0, 400:] = np.nan  # padded rows
    pts[2, :] = np.nan  # fully-empty cloud
    sv = batched_from_pointclouds(pts, 2.0, 256)
    extent = (64, 64, 8)

    host = rasterize_from_voxels_host(sv, extent)
    dev = bev_densify(sv, extent=extent, dtype=jnp.float32, ones_feats=True)
    np.testing.assert_array_equal(np.asarray(host.mask), np.asarray(dev.mask))
    np.testing.assert_array_equal(np.asarray(host.feats, dtype=np.float32),
                                  np.asarray(dev.feats))
    assert host.z == dev.z and host.stride == dev.stride


def test_mm_accepts_host_rasterized_grid():
    """MM(vox=BEVGrid) must produce the same embedding as MM(vox=
    SparseVoxels) — including the drop='pc' ablation on the grid path."""
    import dataclasses

    import numpy as np

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=64)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    pts = rng.uniform(-20, 20, (2, 100, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, 2.0, 64)
    grid = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))

    mm = MM(config=cfg.model.mm, train=False)
    v = mm.init(jax.random.PRNGKey(0), imgs, sv)
    e_sv = np.asarray(mm.apply(v, imgs, sv)["embedding"])
    e_grid = np.asarray(mm.apply(v, imgs, grid)["embedding"])
    np.testing.assert_allclose(e_sv, e_grid, rtol=1e-5, atol=1e-6)

    mm_drop = MM(config=dataclasses.replace(cfg.model.mm, drop="pc"),
                 train=False)
    d_sv = np.asarray(mm_drop.apply(v, imgs, sv)["embedding"])
    d_grid = np.asarray(mm_drop.apply(v, imgs, grid)["embedding"])
    np.testing.assert_allclose(d_sv, d_grid, rtol=1e-5, atol=1e-6)


def test_fpn_final_map_zero_at_unoccupied():
    """lateral_top runs with mask_output=False (r5: the explicit mask was
    a redundant full HBM pass) — valid ONLY because a bias-free 1x1
    stride-1 conv of a masked input is zero at every unoccupied (site, z)
    by arithmetic.  Pin that invariant so a future bias/activation change
    to the lateral can't silently leak unmasked values."""
    g = _grid(seed=9, extent=(16, 16, 4))
    kw = dict(out_channels=32, planes=(8, 16, 32), layers=(1, 1, 1),
              num_top_down=0, conv0_kernel_size=5, block="eca", train=False)
    bev = BEVMinkFPN(**kw)
    v = bev.init(jax.random.PRNGKey(2), fold(g))
    out_b, maps_b = bev.apply(v, fold(g))
    feats = np.asarray(out_b.feats, np.float32)
    c = feats.shape[-1] // out_b.z
    mexp = np.repeat(np.asarray(out_b.mask, np.float32), c, axis=-1)
    assert np.all(feats * (1.0 - mexp) == 0.0)
    assert np.asarray(out_b.mask).any()  # non-degenerate
