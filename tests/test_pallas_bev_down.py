"""Parity of the fused stage-0 epilogue + masked down0 kernel
(ops/pallas/bev_down.py) against the XLA ``BEVMinkFPN`` stage-0 prefix, on
CPU interpret — the same kernel runs on real TPU (hardware parity is
re-checked on chip; BASELINE.md r4 notes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from agplace_tpu.ops.pallas.bev_down import fused_conv0_down0
from agplace_tpu.sparse import bev_grid
from agplace_tpu.sparse.bev_grid import (
    BEVConv, BEVBatchNorm, BEVGrid, BEVMinkFPN, _mask_bev,
    fold_w2_k2s2, fold_w2_stride1)


class _Prefix(nn.Module):
    """The XLA stage-0 prefix the kernel replaces (eval mode)."""

    c1: int
    k0: int

    @nn.compact
    def __call__(self, g):
        def bn(name):
            return BEVBatchNorm(use_running_average=True, name=name,
                                mask_output=False)

        g = BEVConv(self.c1, kernel_size=self.k0, mask_output=False,
                    name="conv0")(g)
        g = bn("bn0")(g)
        g = g.replace(feats=_mask_bev(nn.relu(g.feats), g.mask, g.z))
        g = BEVConv(g.channels, kernel_size=2, stride=2, mask_output=False,
                    name="down0")(g)
        g = bn("down_bn0")(g)
        g = g.replace(feats=_mask_bev(nn.relu(g.feats), g.mask, g.z))
        return g


def _rand_grid(rng, b, xy, z, c0, density=0.3):
    mask = rng.uniform(size=(b, xy, xy, z)) < density
    feats = rng.standard_normal((b, xy, xy, z, c0)).astype(np.float32)
    feats = np.where(mask[..., None], feats, 0.0).reshape(b, xy, xy, z * c0)
    return BEVGrid(feats=jnp.asarray(feats, jnp.bfloat16),
                   mask=jnp.asarray(mask), z=z)


def _rand_vars(mod, g, rng, seed):
    vs = mod.init(jax.random.PRNGKey(seed), g)
    return {
        "params": jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.2,
                                  a.dtype), vs["params"]),
        "batch_stats": jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype),
            vs["batch_stats"]),
    }


def _affine(vs, scope, zz, eps=1e-5):
    p, st = vs["params"][scope], vs["batch_stats"][scope]
    inv = jax.lax.rsqrt(st["var"] + eps)
    return (jnp.tile(inv * p["scale"], zz),
            jnp.tile(p["bias"] - st["mean"] * inv * p["scale"], zz))


@pytest.mark.parametrize("xy,z,c0,c1,k0",
                         [(32, 4, 1, 16, 5), (16, 2, 3, 8, 3),
                          (32, 3, 1, 16, 5), (32, 1, 2, 8, 3),
                          (16, 4, 1, 8, 7)])
def test_fused_down_matches_xla(xy, z, c0, c1, k0):
    rng = np.random.default_rng(xy + z + k0)
    g = _rand_grid(rng, 2, xy, z, c0)
    mod = _Prefix(c1=c1, k0=k0)
    vs = _rand_vars(mod, g, rng, 0)
    ref = mod.apply(vs, g)

    from agplace_tpu.sparse.voxels import me_down_align

    zo = me_down_align(z)[2]
    w0 = fold_w2_stride1(vs["params"]["conv0"]["kernel"], z)
    wd = fold_w2_k2s2(vs["params"]["down0"]["kernel"], z)
    s0, b0 = _affine(vs, "bn0", z)
    sd, bd = _affine(vs, "down_bn0", zo)
    out, m1 = fused_conv0_down0(g.feats, g.mask, w0, s0, b0, wd, sd, bd,
                                z=z)

    assert bool(jnp.all(m1 == ref.mask))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref.feats, np.float32),
                               rtol=2e-2, atol=2e-2)
    # masked structure: zero at invalid output sites
    mf = np.repeat(np.asarray(m1), out.shape[-1] // zo, axis=-1)
    assert np.all(np.asarray(out, np.float32) * (1 - mf) == 0)


def test_fpn_fused_down_path_matches_and_shares_tree(monkeypatch):
    """BEVMinkFPN's default use_fused_down=True produces the same outputs
    from the SAME variables as the XLA path (kernel interpreted on CPU)."""
    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)
    rng = np.random.default_rng(3)
    g = _rand_grid(rng, 2, 32, 4, 1)
    kw = dict(out_channels=32, planes=(8, 16, 32), layers=(1, 1, 1),
              num_top_down=0, conv0_kernel_size=5, block="eca", train=False)
    ref_mod = BEVMinkFPN(use_fused_down=False, **kw)
    fus_mod = BEVMinkFPN(use_fused_down=True, **kw)
    vs = ref_mod.init(jax.random.PRNGKey(0), g)
    vs2 = fus_mod.init(jax.random.PRNGKey(0), g)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs2))

    ref_out, _ = ref_mod.apply(vs, g)
    fus_out, _ = fus_mod.apply(vs, g)
    assert bool(jnp.all(ref_out.mask == fus_out.mask))
    np.testing.assert_allclose(np.asarray(fus_out.feats, np.float32),
                               np.asarray(ref_out.feats, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_fpn_fused_down_gates_off_on_odd_grid(monkeypatch):
    """Odd grid dims (nonzero ME spatial alignment padding) have no parity
    decomposition; the fused down must gate itself off and fall back to
    the (identical) XLA path."""
    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)
    rng = np.random.default_rng(4)
    g = _rand_grid(rng, 1, 15, 2, 1)
    kw = dict(out_channels=16, planes=(8, 16), layers=(1, 1),
              num_top_down=0, conv0_kernel_size=3, block="basic",
              train=False)
    ref_mod = BEVMinkFPN(use_fused_down=False, **kw)
    fus_mod = BEVMinkFPN(use_fused_down=True, **kw)
    vs = ref_mod.init(jax.random.PRNGKey(0), g)
    ref_out, _ = ref_mod.apply(vs, g)
    fus_out, _ = fus_mod.apply(vs, g)
    np.testing.assert_allclose(np.asarray(fus_out.feats, np.float32),
                               np.asarray(ref_out.feats, np.float32))


def test_fpn_fused_down_gates_off_on_uneven_half_extent(monkeypatch):
    """Even dims whose half-extent is odd carry ME lo-padding
    (me_down_align lo == 1): the parity pairing (2m, 2m+1) is wrong there,
    so the gate must fall back to XLA (which pads correctly)."""
    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)
    rng = np.random.default_rng(5)
    g = _rand_grid(rng, 1, 10, 2, 1)  # 10 // 2 = 5 odd -> lo=1
    kw = dict(out_channels=16, planes=(8, 16), layers=(1, 1),
              num_top_down=0, conv0_kernel_size=3, block="basic",
              train=False)
    ref_mod = BEVMinkFPN(use_fused_down=False, **kw)
    fus_mod = BEVMinkFPN(use_fused_down=True, **kw)
    vs = ref_mod.init(jax.random.PRNGKey(0), g)
    ref_out, _ = ref_mod.apply(vs, g)
    fus_out, _ = fus_mod.apply(vs, g)
    np.testing.assert_allclose(np.asarray(fus_out.feats, np.float32),
                               np.asarray(ref_out.feats, np.float32))
