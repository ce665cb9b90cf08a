"""Sparse voxel subsystem tests — the dense-oracle strategy from SURVEY.md §4:
every sparse op is checked against a dense 3D implementation on tiny grids.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.sparse.voxels import (
    SparseVoxels,
    batched_from_pointclouds,
    build_neighbor_table,
    downsample_coords,
    kernel_offsets,
    masked_global_avg,
    masked_global_max,
    pack_coords,
    quantize,
    sort_by_key,
    unpack_coords,
)
from agplace_tpu.sparse.modules import (
    ECABasicBlock,
    MaskedBatchNorm,
    MinkGeM,
    SparseConv,
    sparse_conv_apply,
)
from agplace_tpu.sparse.minkfpn import MinkFPN


def _make_sv(rng, b=2, n=64, c=4, span=6):
    """Random sparse tensor with unique coords per sample."""
    coords = np.zeros((b, n, 3), np.int32)
    mask = np.zeros((b, n), bool)
    for i in range(b):
        # sample unique coordinates
        all_coords = np.stack(np.meshgrid(*[np.arange(-span, span)] * 3,
                                          indexing="ij"), -1).reshape(-1, 3)
        take = rng.choice(len(all_coords), size=rng.integers(n // 2, n),
                          replace=False)
        k = len(take)
        coords[i, :k] = all_coords[take]
        mask[i, :k] = True
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    feats[~mask] = 0
    return SparseVoxels(coords=jnp.asarray(coords), feats=jnp.asarray(feats),
                        mask=jnp.asarray(mask), stride=1)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(-500, 500, size=(2, 32, 3)).astype(np.int32)
    mask = np.ones((2, 32), bool)
    keys = pack_coords(jnp.asarray(coords), jnp.asarray(mask))
    back = np.asarray(unpack_coords(keys))
    np.testing.assert_array_equal(back, coords)


def test_quantize_dedups():
    pts = np.array([[[0.1, 0.1, 0.1], [0.2, 0.3, 0.1], [5.0, 5.0, 5.0],
                     [np.nan, np.nan, np.nan]]], np.float32)
    sv = batched_from_pointclouds(pts, quant_size=2.0, capacity=8)
    assert int(sv.mask.sum()) == 2  # first two collapse into one voxel
    valid = np.asarray(sv.coords[0])[np.asarray(sv.mask[0])]
    assert {tuple(v) for v in valid} == {(0, 0, 0), (2, 2, 2)}


def test_neighbor_table_correct():
    rng = np.random.default_rng(1)
    sv = _make_sv(rng, b=2, n=32, c=1, span=3)
    svs, keys = sort_by_key(sv)
    offs = kernel_offsets(3, 1)
    table = np.asarray(build_neighbor_table(svs, keys, svs.coords, svs.mask,
                                            offs))
    coords = np.asarray(svs.coords)
    mask = np.asarray(svs.mask)
    for b in range(2):
        coord_set = {tuple(c): i for i, c in enumerate(coords[b]) if mask[b, i]}
        for i in range(32):
            if not mask[b, i]:
                continue
            for k, off in enumerate(offs):
                nbr = tuple(coords[b, i] + off)
                expected = coord_set.get(nbr, -1)
                assert table[b, i, k] == expected, (b, i, k, nbr)


def test_sparse_conv_matches_dense_conv():
    """Sparse 3x3x3 conv on a fully-dense grid == dense conv on the
    equivalent volume (interior voxels)."""
    rng = np.random.default_rng(2)
    span = 3  # grid [-3,3)^3 = 6^3 = 216 voxels
    grid = np.stack(np.meshgrid(*[np.arange(-span, span)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    n = len(grid)
    cin, cout = 3, 5
    feats = rng.standard_normal((1, n, cin)).astype(np.float32)
    sv = SparseVoxels(coords=jnp.asarray(grid[None]).astype(jnp.int32),
                      feats=jnp.asarray(feats),
                      mask=jnp.ones((1, n), bool), stride=1)
    svs, keys = sort_by_key(sv)
    conv = SparseConv(features=cout, kernel_size=3,
                      compute_dtype=jnp.float32)  # oracle-exact
    variables = conv.init(jax.random.PRNGKey(0), svs, keys)
    out_sv, _ = conv.apply(variables, svs, keys)

    # dense oracle via lax.conv on the 6^3 volume
    dense = np.zeros((6, 6, 6, cin), np.float32)
    sc = np.asarray(svs.coords[0]) + span
    dense[sc[:, 0], sc[:, 1], sc[:, 2]] = np.asarray(svs.feats[0])
    kern = np.asarray(variables["params"]["kernel"])  # [27, cin, cout]
    kern_dense = kern.reshape(3, 3, 3, cin, cout)
    out_dense = jax.lax.conv_general_dilated(
        jnp.asarray(dense[None]), jnp.asarray(kern_dense),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))[0]
    out_dense = np.asarray(out_dense)
    got = np.asarray(out_sv.feats[0])
    for i, c in enumerate(sc):
        np.testing.assert_allclose(got[i], out_dense[c[0], c[1], c[2]],
                                   rtol=1e-4, atol=1e-4)


def test_strided_conv_downsamples():
    rng = np.random.default_rng(3)
    sv = _make_sv(rng, b=2, n=64, c=4, span=4)
    svs, keys = sort_by_key(sv)
    conv = SparseConv(features=4, kernel_size=2, stride=2)
    variables = conv.init(jax.random.PRNGKey(0), svs, keys)
    out_sv, out_keys = conv.apply(variables, svs, keys)
    assert out_sv.stride == 2
    oc = np.asarray(out_sv.coords)
    om = np.asarray(out_sv.mask)
    assert (oc[om] % 2 == 0).all()
    # every output coord must be the floor-parent of >=1 input coord
    ic = np.asarray(svs.coords)
    im = np.asarray(svs.mask)
    for b in range(2):
        parents = {tuple((c // 2) * 2) for c in ic[b][im[b]]}
        got = {tuple(c) for c in oc[b][om[b]]}
        assert got == parents


def test_masked_pools():
    rng = np.random.default_rng(4)
    sv = _make_sv(rng, b=2, n=32, c=4)
    avg = np.asarray(masked_global_avg(sv))
    mx = np.asarray(masked_global_max(sv))
    f = np.asarray(sv.feats)
    m = np.asarray(sv.mask)
    for b in range(2):
        np.testing.assert_allclose(avg[b], f[b][m[b]].mean(0), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(mx[b], f[b][m[b]].max(0), rtol=1e-5)


def test_masked_batchnorm_ignores_padding():
    rng = np.random.default_rng(5)
    sv = _make_sv(rng, b=2, n=32, c=4)
    bn = MaskedBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), sv.feats, sv.mask)
    out, _ = bn.apply(variables, sv.feats, sv.mask,
                      mutable=["batch_stats"])
    o = np.asarray(out)
    m = np.asarray(sv.mask)
    valid = o[m]
    np.testing.assert_allclose(valid.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.std(0), 1.0, atol=1e-2)
    assert (o[~m] == 0).all()


def test_mink_gem_matches_reference_formula():
    rng = np.random.default_rng(6)
    sv = _make_sv(rng, b=2, n=32, c=4)
    gem = MinkGeM()
    variables = gem.init(jax.random.PRNGKey(0), sv)
    out = np.asarray(gem.apply(variables, sv))
    f = np.asarray(sv.feats)
    m = np.asarray(sv.mask)
    for b in range(2):
        ref = (np.clip(f[b][m[b]], 1e-6, None) ** 3.0).mean(0) ** (1 / 3.0)
        np.testing.assert_allclose(out[b], ref, rtol=1e-4)


def test_eca_block_and_fpn_run():
    rng = np.random.default_rng(7)
    sv = _make_sv(rng, b=2, n=64, c=1, span=5)
    fpn = MinkFPN(out_channels=32, planes=(8, 16, 32), layers=(1, 1, 1),
                  num_top_down=0, train=False)
    variables = fpn.init(jax.random.PRNGKey(0), sv)
    out_sv, keys, out_maps = fpn.apply(variables, sv)
    assert out_sv.channels == 32
    assert out_sv.stride == 8
    assert len(out_maps) == 3
    assert np.isfinite(np.asarray(out_sv.feats)).all()
    # padding stays zero
    assert (np.asarray(out_sv.feats)[~np.asarray(out_sv.mask)] == 0).all()


def test_fpn_topdown_path():
    rng = np.random.default_rng(8)
    sv = _make_sv(rng, b=1, n=64, c=1, span=5)
    fpn = MinkFPN(out_channels=16, planes=(8, 16), layers=(1, 1),
                  num_top_down=1, train=False)
    variables = fpn.init(jax.random.PRNGKey(0), sv)
    out_sv, keys, out_maps = fpn.apply(variables, sv)
    # with one top-down step the final map lives at the finer stride
    assert out_sv.stride == 2
    assert out_sv.channels == 16
    assert np.isfinite(np.asarray(out_sv.feats)).all()


@pytest.mark.parametrize("block", ["aspp", "convnext"])
def test_minkloc_variant_blocks_on_sparse_backend(block):
    """models_minkloc ASPP / sparse-ConvNeXt blocks now exist on the
    padded-sparse backend too (VERDICT r2 missing #4): the FPN registry
    accepts them, outputs are finite, padding rows stay zeroed, and on a
    fully-dense interior the block matches its dense-grid twin under
    reshaped shared params."""
    from agplace_tpu.sparse.minkfpn import MinkFPN
    from agplace_tpu.sparse.modules import SparseASPP, SparseConvNextBlock
    from agplace_tpu.sparse.dense_grid import (
        DenseVoxelGrid, GridASPP, GridConvNextBlock)

    rng = np.random.default_rng(3)
    span = 3
    grid = np.stack(np.meshgrid(*[np.arange(-span, span)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    n = len(grid)
    cin = 8
    feats = rng.standard_normal((1, n, cin)).astype(np.float32)
    sv = SparseVoxels(coords=jnp.asarray(grid[None]).astype(jnp.int32),
                      feats=jnp.asarray(feats),
                      mask=jnp.ones((1, n), bool), stride=1)
    svs, keys = sort_by_key(sv)

    sparse_cls = {"aspp": SparseASPP, "convnext": SparseConvNextBlock}[block]
    blk = sparse_cls(planes=cin)
    variables = blk.init(jax.random.PRNGKey(0), svs, keys)
    out_sv, _ = blk.apply(variables, svs, keys)
    assert np.isfinite(np.asarray(out_sv.feats)).all()

    # FPN registry smoke
    fpn = MinkFPN(out_channels=16, planes=(8, 16), layers=(1, 1),
                  num_top_down=0, conv0_kernel_size=3, block=block)
    vf = fpn.init(jax.random.PRNGKey(1), sv)
    out, _, _ = fpn.apply(vf, sv)
    assert np.isfinite(np.asarray(out.feats)).all()

    # dense-twin equivalence on the interior (params reshaped K->k,k,k)
    dense = np.zeros((1, 6, 6, 6, cin), np.float32)
    sc = np.asarray(svs.coords[0]) + span
    dense[0, sc[:, 0], sc[:, 1], sc[:, 2]] = np.asarray(svs.feats[0])
    g = DenseVoxelGrid(feats=jnp.asarray(dense),
                       mask=jnp.ones((1, 6, 6, 6), bool), stride=1)

    def to_grid_params(tree):
        import jax as _jax

        def conv(leaf):
            a = np.asarray(leaf)
            if a.ndim == 3:  # [K, cin, cout] -> [k,k,k,cin,cout]
                k = round(a.shape[0] ** (1 / 3))
                return a.reshape(k, k, k, a.shape[1], a.shape[2])
            if a.ndim == 2 and a.shape[0] != a.shape[1] or a.ndim == 2:
                # 1x1 conv [cin, cout] -> [1,1,1,cin,cout]
                return a.reshape(1, 1, 1, *a.shape)
            return a

        out = _jax.tree_util.tree_map(np.asarray, tree)
        for name, sub in out["params"].items():
            if "kernel" in sub:
                sub["kernel"] = conv(sub["kernel"])
        return out

    dense_cls = {"aspp": GridASPP, "convnext": GridConvNextBlock}[block]
    d = dense_cls(planes=cin)
    out_d = d.apply(to_grid_params(variables), g)
    want = np.asarray(out_d.feats[0])
    got = np.asarray(out_sv.feats[0])
    for i, c in enumerate(sc):
        # interior cells only: boundary cells see clamped neighbours
        if (c > 0).all() and (c < 5).all():
            tol = 2.5e-2 if block == "convnext" else 8e-3
            np.testing.assert_allclose(got[i], want[c[0], c[1], c[2]],
                                       rtol=tol, atol=tol)
