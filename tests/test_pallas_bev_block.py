"""Parity of the fused Pallas BEV block kernel against the XLA
``BEVECABasicBlock`` (eval mode), on CPU interpret — the same kernel runs
on real TPU (ops/pallas/bev_block.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agplace_tpu.ops.pallas.bev_block import fused_eca_block
from agplace_tpu.sparse.bev_grid import BEVECABasicBlock, BEVGrid


def _fold_w(kern, z):
    """[3,3,3,cin,cout] -> [3,3,z*cin,z*cout] stride-1 band fold (the
    BEVConv w2 assembly)."""
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


@pytest.mark.parametrize("z,c,xy", [(2, 64, 16), (4, 32, 8), (1, 128, 16)])
def test_fused_block_matches_xla(z, c, xy):
    rng = np.random.default_rng(0)
    b = 2
    mask = jnp.asarray(rng.random((b, xy, xy, z)) < 0.3)
    feats = jnp.asarray(rng.standard_normal((b, xy, xy, z * c)),
                        jnp.float32)
    # input must be masked (block contract)
    mf = jnp.repeat(mask.astype(feats.dtype), c, axis=-1)
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

    got = np.asarray(fused_eca_block(
        feats, mask, jnp.asarray(w1), jnp.asarray(w2),
        jnp.asarray(s1), jnp.asarray(b1), jnp.asarray(s2),
        jnp.asarray(b2), jnp.asarray(w_eca), z=z), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # structure: outputs masked at invalid sites
    mf3 = np.asarray(jnp.repeat(mask.astype(jnp.float32), c, axis=-1))
    assert np.all(got * (1 - mf3) == 0)
