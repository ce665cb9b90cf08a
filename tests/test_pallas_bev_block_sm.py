"""Parity of the spatial-major fused BEV block kernel
(ops/pallas/bev_block_sm.py) against the XLA ``BEVECABasicBlock`` (eval
mode), on CPU interpret — the same kernel runs on real TPU.  This is the
kernel ``use_pallas=True`` routes to (the r3 batch-major kernel stays as
ops/pallas/bev_block.py with its own tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agplace_tpu.ops.pallas.bev_block_sm import fused_eca_block_sm
from agplace_tpu.sparse import bev_grid
from agplace_tpu.sparse.bev_grid import BEVECABasicBlock, BEVGrid


def _fold_w(kern, z):
    k = kern.shape[0]
    cin, cout = kern.shape[3], kern.shape[4]
    w2 = np.zeros((k, k, z * cin, z * cout), np.float32)
    for zo in range(z):
        for t in range(k):
            zi = zo + t - k // 2
            if 0 <= zi < z:
                w2[:, :, zi * cin:(zi + 1) * cin,
                   zo * cout:(zo + 1) * cout] = kern[:, :, t]
    return w2


def _eval_affine(p, s, z, eps=1e-5):
    inv = 1.0 / np.sqrt(np.asarray(s["var"]) + eps)
    scale = np.tile(inv * np.asarray(p["scale"]), z)
    bias = np.tile(np.asarray(p["bias"])
                   - np.asarray(s["mean"]) * inv * np.asarray(p["scale"]), z)
    return scale.astype(np.float32), bias.astype(np.float32)


@pytest.mark.parametrize("z,cin,c,xy,b", [(2, 64, 64, 16, 2),
                                          (4, 32, 32, 8, 3),
                                          (1, 128, 128, 16, 2),
                                          (2, 32, 64, 16, 2),
                                          (2, 64, 128, 8, 3)])
def test_fused_block_sm_matches_xla(z, cin, c, xy, b):
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((b, xy, xy, z)) < 0.3)
    feats = jnp.asarray(rng.standard_normal((b, xy, xy, z * cin)),
                        jnp.float32)
    mf = jnp.repeat(mask.astype(feats.dtype), cin, axis=-1)
    feats = (feats * mf).astype(jnp.bfloat16)
    g = BEVGrid(feats=feats, mask=mask, z=z, stride=1)

    blk = BEVECABasicBlock(c, train=False)
    variables = blk.init(jax.random.PRNGKey(1), g)
    want = np.asarray(blk.apply(variables, g).feats, np.float32)

    p = variables["params"]
    s = variables["batch_stats"]
    w1 = _fold_w(np.asarray(p["conv1"]["kernel"]), z)
    w2 = _fold_w(np.asarray(p["conv2"]["kernel"]), z)
    s1, b1 = _eval_affine(p["norm1"], s["norm1"], z)
    s2, b2 = _eval_affine(p["norm2"], s["norm2"], z)
    w_eca = np.asarray(p["eca"]["conv_w"])[:, 0, 0]
    dskw = {}
    if cin != c:  # the fused 1x1 downsample residual path
        sd, bd = _eval_affine(p["downsample_bn"], s["downsample_bn"], z)
        dskw = dict(
            wd=jnp.asarray(
                _fold_w(np.asarray(p["downsample_conv"]["kernel"]), z)),
            scale_d=jnp.asarray(sd), bias_d=jnp.asarray(bd))

    got = np.asarray(fused_eca_block_sm(
        feats, mask, jnp.asarray(w1), jnp.asarray(w2),
        jnp.asarray(s1), jnp.asarray(b1), jnp.asarray(s2),
        jnp.asarray(b2), jnp.asarray(w_eca), z=z, **dskw), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    mf3 = np.asarray(jnp.repeat(mask.astype(jnp.float32), c, axis=-1))
    assert np.all(got * (1 - mf3) == 0)


def test_block_module_pallas_path_routes_to_sm(monkeypatch):
    """BEVECABasicBlock(use_pallas=True) must produce XLA-path outputs
    from the same variables (kernel interpreted on CPU)."""
    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)
    rng = np.random.default_rng(5)
    b, xy, z, c = 2, 16, 2, 32
    mask = jnp.asarray(rng.random((b, xy, xy, z)) < 0.4)
    feats = jnp.asarray(rng.standard_normal((b, xy, xy, z * c)),
                        jnp.float32)
    feats = (feats * jnp.repeat(mask.astype(feats.dtype), c, axis=-1)
             ).astype(jnp.bfloat16)
    g = BEVGrid(feats=feats, mask=mask, z=z, stride=1)

    ref = BEVECABasicBlock(c, train=False, use_pallas=False)
    fus = BEVECABasicBlock(c, train=False, use_pallas=True)
    vs = ref.init(jax.random.PRNGKey(0), g)
    out_ref = np.asarray(ref.apply(vs, g).feats, np.float32)
    out_fus = np.asarray(fus.apply(vs, g).feats, np.float32)
    np.testing.assert_allclose(out_fus, out_ref, rtol=2e-2, atol=2e-2)


def test_vmem_gate_rejects_z8_shapes_and_routes_to_xla(monkeypatch):
    """r5 crash fix: at z-extent-8 shapes (nuScenes block0: 256 folded
    channels at 64x64xB32) the sm kernel's per-step footprint exceeds
    scoped VMEM and XLA aborts with register spills.  The gate must
    reject those shapes (module falls back to the XLA path) and keep
    accepting the proven KITTI shapes."""
    from agplace_tpu.ops.pallas.bev_block_sm import sm_block_vmem_ok

    # proven-working KITTI bench shapes
    assert sm_block_vmem_ok(32, 64, 64, 128, 128)   # block0, z=2 c=64
    assert sm_block_vmem_ok(32, 32, 32, 256, 256)   # stage1, z=2 c=128
    # the nuScenes z=8 block0 shape that OOM'd on hardware
    assert not sm_block_vmem_ok(32, 64, 64, 256, 256)

    # module-level: an oversized shape with use_pallas=True must run the
    # XLA path (identical outputs, no kernel invocation)
    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)

    def boom(*a, **k):  # the kernel must NOT be called at this shape
        raise AssertionError("sm kernel invoked past the VMEM gate")

    import agplace_tpu.ops.pallas.bev_block_sm as sm_mod
    monkeypatch.setattr(sm_mod, "fused_eca_block_sm", boom)

    rng = np.random.default_rng(2)
    b, xy, z, c = 4, 16, 8, 32  # zci = zco = 256 at a CPU-friendly size
    # force the gate shut regardless of the small test extent
    monkeypatch.setattr(sm_mod, "sm_block_vmem_ok",
                        lambda *a: False)
    mask = jnp.asarray(rng.random((b, xy, xy, z)) < 0.4)
    feats = jnp.asarray(rng.standard_normal((b, xy, xy, z * c)),
                        jnp.float32)
    feats = (feats * jnp.repeat(mask.astype(feats.dtype), c, axis=-1)
             ).astype(jnp.bfloat16)
    g = BEVGrid(feats=feats, mask=mask, z=z, stride=1)
    ref = BEVECABasicBlock(c, train=False, use_pallas=False)
    fus = BEVECABasicBlock(c, train=False, use_pallas=True)
    vs = ref.init(jax.random.PRNGKey(0), g)
    out_ref = np.asarray(ref.apply(vs, g).feats, np.float32)
    out_fus = np.asarray(fus.apply(vs, g).feats, np.float32)
    np.testing.assert_array_equal(out_fus, out_ref)
