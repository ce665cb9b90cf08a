"""Torch differential oracle for the voxel backbone (dense-grid backend).

The full-model torch oracle (test_torch_full_oracle.py) covers the dense
math but deliberately configures the voxel branch OUT of the model; this
file closes that gap.  The masked dense-grid semantics — the rebuild's
ME-equivalent voxel stack (reference: MinkowskiEngine generalized sparse
conv as used by ``models/minkfpn.py:19-123``, ``layers/eca_block.py``,
``layers/pooling.py:70-87``) — are re-implemented here in raw torch
(conv3d / masked batch-norm / ECA / GeM / ME floor-aligned stride-2
downsample / k2s2 transposed conv), driven with IDENTICAL weights and
inputs as the flax modules, and required to agree on:

* FPN output features at every occupied voxel (all pyramid levels),
* occupancy masks at every level,
* the pooled MinkGeM descriptor,
* EVERY parameter gradient leaf and the input-feature gradient.

Together with the pairwise backend equivalence tests (dense == BEV-folded
== padded-sparse, tests/test_dense_grid.py / test_bev_grid.py), every
voxel backend is now differentially oracled against a second framework;
the only remaining un-oracled link to the reference is MinkowskiEngine's
own CUDA kernels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

from agplace_tpu.sparse.dense_grid import (  # noqa: E402
    DenseMinkFPN,
    DenseVoxelGrid,
    GridMinkGeM,
)
from agplace_tpu.sparse.voxels import me_down_align  # noqa: E402

B, XY, Z, CIN = 2, 10, 3, 2  # odd z AND xy offset -> me_down_align lo=1
PLANES = (8, 8, 16)
OUT_CH = 16


def _grid(rng):
    mask = rng.random((B, XY, XY, Z)) < 0.6
    mask[:, 0, 0, 0] = True  # never an empty batch element
    feats = rng.standard_normal((B, XY, XY, Z, CIN)).astype(np.float32)
    feats = np.where(mask[..., None], feats, 0.0)
    return DenseVoxelGrid(feats=jnp.asarray(feats),
                          mask=jnp.asarray(mask), stride=1)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = np.asarray(tree)
    return out


# ---------------------------------------------------------------------------
# torch mirror of the masked dense-grid ops, consuming {flax-path: tensor}
# ---------------------------------------------------------------------------


def _mask3d(x, mask):
    return torch.where(mask.unsqueeze(-1), x, torch.zeros_like(x))


def _conv3d_same(x, w, k):
    # x [B,X,Y,Z,C]; w flax XYZIO [k,k,k,Ci,Co] -> torch OIXYZ
    wt = w.permute(4, 3, 0, 1, 2)
    xt = x.permute(0, 4, 1, 2, 3)
    o = torch.nn.functional.conv3d(xt, wt, padding=k // 2)
    return o.permute(0, 2, 3, 4, 1)


def _down_conv3d(x, mask, w):
    """k=2 s=2 with ME floor alignment: low-pad each spatial dim by
    me_down_align(cells).lo (+hi to cover evenly), then stride-2 conv;
    output mask = any child occupied."""
    pads = [me_down_align(x.shape[1 + i])[:2] for i in range(3)]
    # torch F.pad pads last dims first: (C has none) z_lo,z_hi,y...,x...
    xt = x.permute(0, 4, 1, 2, 3)
    pad_arg = (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
               pads[0][0], pads[0][1])
    xt = torch.nn.functional.pad(xt, pad_arg)
    o = torch.nn.functional.conv3d(xt, w.permute(4, 3, 0, 1, 2), stride=2)
    mt = torch.nn.functional.pad(
        mask.unsqueeze(1).float(), pad_arg)
    mo = torch.nn.functional.max_pool3d(mt, 2, stride=2)[:, 0] > 0
    return o.permute(0, 2, 3, 4, 1), mo


def _masked_bn(x, mask, scale, bias, eps=1e-5):
    """Train-mode masked BN (moments over occupied cells only)."""
    m = mask.unsqueeze(-1).float()
    cnt = torch.clamp(m.sum(), min=1.0)
    mean = (x * m).sum(dim=(0, 1, 2, 3)) / cnt
    var = torch.clamp(
        (x.square() * m).sum(dim=(0, 1, 2, 3)) / cnt - mean.square(),
        min=0.0)
    inv = torch.rsqrt(var + eps)
    out = x * (inv * scale) + (bias - mean * inv * scale)
    return _mask3d(out, mask)


def _masked_avg(x, mask):
    m = mask.unsqueeze(-1).float()
    return (x * m).sum(dim=(1, 2, 3)) / torch.clamp(
        m.sum(dim=(1, 2, 3)), min=1.0)


def _eca(x, mask, w):
    # channel attention: 1D conv over the channel axis, single io channel
    y = _masked_avg(x, mask)  # [B, C]
    k = w.shape[0]
    yt = torch.nn.functional.conv1d(
        y.unsqueeze(1), w.permute(2, 1, 0), padding=(k - 1) // 2)
    y = torch.sigmoid(yt[:, 0])
    return _mask3d(x * y[:, None, None, None, :], mask)


def _eca_block(p, x, mask, planes):
    residual = x
    out = _conv3d_same(x, p["conv1/kernel"], 3)
    out = _masked_bn(out, mask, p["norm1/scale"], p["norm1/bias"])
    out = _mask3d(torch.relu(out), mask)
    out = _conv3d_same(out, p["conv2/kernel"], 3)
    out = _masked_bn(out, mask, p["norm2/scale"], p["norm2/bias"])
    out = _eca(out, mask, p["eca/conv_w"])
    if residual.shape[-1] != planes:
        residual = _conv3d_same(residual, p["downsample_conv/kernel"], 1)
        residual = _masked_bn(residual, mask, p["downsample_bn/scale"],
                              p["downsample_bn/bias"])
    return _mask3d(torch.relu(out + residual), mask)


def _aspp_block(p, x, mask, planes):
    feats = None
    for i, k in enumerate((3, 5, 7)):
        o = _conv3d_same(x, p[f"conv{i + 1}/kernel"], k)
        o = _masked_bn(o, mask, p[f"bn{i + 1}/scale"], p[f"bn{i + 1}/bias"])
        r = torch.relu(o)
        feats = r if feats is None else feats + r
    return _mask3d(feats, mask)


def _convnext_block(p, x, mask, planes):
    residual = x
    out = _conv3d_same(x, p["conv1/kernel"], 3)
    out = _masked_bn(out, mask, p["bn/scale"], p["bn/bias"])
    out = _conv3d_same(out, p["conv2/kernel"], 1)
    out = torch.relu(out)
    out = _conv3d_same(out, p["conv3/kernel"], 1)
    if residual.shape[-1] != planes:
        residual = _conv3d_same(residual, p["downsample_conv/kernel"], 1)
    return _mask3d(out + residual, mask)


_TORCH_BLOCKS = {"eca": _eca_block, "aspp": _aspp_block,
                 "convnext": _convnext_block}


def _tconv_k2s2(x, w):
    """jax.lax.conv_transpose(strides=2, VALID, unflipped HWDIO kernel):
    out[2i + a] = sum_ci x[i, ci] * w[k-1-a, ..., ci, co] — verified
    against the flax GridConvTranspose by this very test."""
    b, X, Y, Zc, ci = x.shape
    co = w.shape[-1]
    # flip spatial taps (jax VALID conv_transpose cross-correlates the
    # zero-dilated, (k-1)-padded input, which lands tap a at offset k-1-a)
    wf = torch.flip(w, dims=(0, 1, 2))
    o = torch.einsum("nxyzi,pqrio->nxpyqzro", x, wf)
    return o.reshape(b, 2 * X, 2 * Y, 2 * Zc, co)


def _sub(params, prefix):
    pl = prefix + "/"
    return {k[len(pl):]: v for k, v in params.items() if k.startswith(pl)}


def torch_fpn(params, feats, mask, planes, layers, num_top_down, block,
              conv0_k=5, out_channels=OUT_CH):
    """Mirror of DenseMinkFPN.__call__ in raw torch."""
    block_fn = _TORCH_BLOCKS[block]
    n_stages = len(planes)
    x = _conv3d_same(feats, params["conv0/kernel"], conv0_k)
    x = _masked_bn(x, mask, params["bn0/scale"], params["bn0/bias"])
    x = _mask3d(torch.relu(x), mask)

    laterals = []
    if num_top_down == n_stages:
        laterals.append((x, mask))
    out_maps = []
    for i in range(n_stages):
        x, mask = _down_conv3d(x, mask, params[f"down{i}/kernel"])
        x = _masked_bn(x, mask, params[f"down_bn{i}/scale"],
                       params[f"down_bn{i}/bias"])
        x = _mask3d(torch.relu(x), mask)
        for b in range(layers[i]):
            x = block_fn(_sub(params, f"block{i}_{b}"), x, mask, planes[i])
        if n_stages - 1 - num_top_down <= i < n_stages - 1:
            laterals.append((x, mask))
        out_maps.append((x, mask))

    x = _mask3d(_conv3d_same(x, params["lateral_top/kernel"], 1), mask)
    out_maps[-1] = (x, mask)

    for ndx in range(num_top_down):
        fine, fine_mask = laterals[-ndx - 1]
        up = _tconv_k2s2(x, params[f"tconv{ndx}/kernel"])
        fx, fy, fz = fine_mask.shape[1:]
        lox, loy, loz = (me_down_align(d)[0] for d in (fx, fy, fz))
        up = up[:, lox:lox + fx, loy:loy + fy, loz:loz + fz]
        lat = _conv3d_same(fine, params[f"lateral{ndx}/kernel"], 1)
        x, mask = _mask3d(up + lat, fine_mask), fine_mask
        out_maps[-2 - ndx] = (x, mask)
    return x, mask, out_maps


def torch_gem(params, x, mask, eps=1e-6):
    p = params["p"]
    clamped = torch.clamp(x, min=eps) ** p
    return _masked_avg(clamped, mask) ** (1.0 / p)


# ---------------------------------------------------------------------------


def _run_flax(block, num_top_down, grid):
    fpn = DenseMinkFPN(out_channels=OUT_CH, planes=PLANES, layers=(1, 1, 1),
                       num_top_down=num_top_down, block=block, train=True,
                       compute_dtype=jnp.float32)
    variables = fpn.init(jax.random.PRNGKey(0), grid)
    gem = GridMinkGeM()
    gvars = gem.init(jax.random.PRNGKey(1),
                     grid.replace(feats=jnp.zeros(
                         grid.feats.shape[:-1] + (OUT_CH,))))

    def fwd(params, feats):
        out, maps = fpn.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            grid.replace(feats=feats), mutable=["batch_stats"])[0]
        desc = gem.apply(gvars, out)
        return out, maps, desc

    return fpn, variables, gvars, fwd


def _torch_params(flat):
    return {k: torch.tensor(v, dtype=torch.float32, requires_grad=True)
            for k, v in flat.items()}


@pytest.mark.parametrize("block,ntd", [("eca", 1), ("aspp", 0),
                                       ("convnext", 0)])
def test_voxel_fpn_forward_matches_torch(block, ntd):
    rng = np.random.default_rng(0)
    grid = _grid(rng)
    fpn, variables, gvars, fwd = _run_flax(block, ntd, grid)
    out, maps, desc = fwd(variables["params"], grid.feats)

    tp = _torch_params(_flatten(variables["params"]))
    tx = torch.tensor(np.asarray(grid.feats))
    tm = torch.tensor(np.asarray(grid.mask))
    with torch.no_grad():
        ox, omask, omaps = torch_fpn(tp, tx, tm, PLANES, (1, 1, 1), ntd,
                                     block)
        tdesc = torch_gem({"p": torch.tensor(
            np.asarray(gvars["params"]["p"]))}, ox, omask)

    # every pyramid level: masks identical, features match at occupied cells
    assert len(omaps) == len(maps)
    for (jax_g, (t_f, t_m)) in zip(maps, omaps):
        np.testing.assert_array_equal(np.asarray(jax_g.mask),
                                      t_m.numpy())
        m = t_m.numpy()
        np.testing.assert_allclose(
            np.asarray(jax_g.feats)[m], t_f.numpy()[m],
            rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(desc), tdesc.numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("block,ntd", [("eca", 1), ("convnext", 0)])
def test_bev_backend_matches_torch_oracle(block, ntd):
    """The BEV-folded backend (the LIVE default) against the same raw-torch
    mirror DIRECTLY — not just transitively through the dense backend: same
    parameter tree, folded input, per-level features/masks + GeM pooled
    descriptor at fp32 tolerance."""
    from agplace_tpu.sparse.bev_grid import (
        BEVMinkFPN,
        BEVMinkGeM,
        fold,
        unfold,
    )

    rng = np.random.default_rng(3)
    grid = _grid(rng)
    fpn = BEVMinkFPN(out_channels=OUT_CH, planes=PLANES, layers=(1, 1, 1),
                     num_top_down=ntd, block=block, train=True,
                     compute_dtype=jnp.float32)
    bev = fold(grid)
    variables = fpn.init(jax.random.PRNGKey(0), bev)
    (out, maps), _ = fpn.apply(variables, bev, mutable=["batch_stats"])
    gem = BEVMinkGeM()
    gvars = gem.init(jax.random.PRNGKey(1), out)
    desc = gem.apply(gvars, out)

    tp = _torch_params(_flatten(variables["params"]))
    tx = torch.tensor(np.asarray(grid.feats))
    tm = torch.tensor(np.asarray(grid.mask))
    with torch.no_grad():
        ox, omask, omaps = torch_fpn(tp, tx, tm, PLANES, (1, 1, 1), ntd,
                                     block)
        tdesc = torch_gem({"p": torch.tensor(
            np.asarray(gvars["params"]["p"]))}, ox, omask)

    assert len(omaps) == len(maps)
    for bev_g, (t_f, t_m) in zip(maps, omaps):
        jg = unfold(bev_g)
        np.testing.assert_array_equal(np.asarray(jg.mask), t_m.numpy())
        m = t_m.numpy()
        np.testing.assert_allclose(
            np.asarray(jg.feats)[m], t_f.numpy()[m], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(desc), tdesc.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_voxel_fpn_gradients_match_torch():
    rng = np.random.default_rng(1)
    grid = _grid(rng)
    fpn, variables, gvars, fwd = _run_flax("eca", 1, grid)
    probe = jnp.asarray(rng.standard_normal((B, OUT_CH)).astype(np.float32))

    def loss_fn(params, feats):
        _, _, desc = fwd(params, feats)
        return jnp.sum(desc * probe)

    jl, (gp, gf) = jax.value_and_grad(
        loss_fn, argnums=(0, 1))(variables["params"], grid.feats)

    tp = _torch_params(_flatten(variables["params"]))
    tx = torch.tensor(np.asarray(grid.feats), requires_grad=True)
    tm = torch.tensor(np.asarray(grid.mask))
    ox, omask, _ = torch_fpn(tp, tx, tm, PLANES, (1, 1, 1), 1, "eca")
    tdesc = torch_gem({"p": torch.tensor(
        np.asarray(gvars["params"]["p"]))}, ox, omask)
    tl = (tdesc * torch.tensor(np.asarray(probe))).sum()
    tl.backward()

    np.testing.assert_allclose(float(jl), float(tl.detach()), rtol=1e-4)
    flat_g = _flatten(gp)
    assert set(flat_g) == set(tp)
    for k, gj in flat_g.items():
        gt = tp[k].grad
        gt = np.zeros_like(gj) if gt is None else gt.numpy()
        np.testing.assert_allclose(
            gj, gt, rtol=5e-3, atol=5e-4,
            err_msg=f"param grad mismatch at {k}")
    np.testing.assert_allclose(np.asarray(gf), tx.grad.numpy(),
                               rtol=5e-3, atol=5e-4)
