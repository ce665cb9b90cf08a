"""Three-way on-hardware check of fused_head at bench shapes:
TPU Pallas kernel vs TPU XLA prefix vs float64 numpy oracle."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from agplace_tpu.sparse.bev_grid import (
    BEVGrid, BEVConv, BEVBatchNorm, fold_w2_stride1, _mask_bev)
from agplace_tpu.ops.pallas.bev_head import fused_head

B, X, Y, Z, C0, C1, K0 = 8, 128, 128, 4, 1, 64, 5
rng = np.random.default_rng(7)

# LiDAR-ish sparse occupancy
mask = rng.uniform(size=(B, X, Y, Z)) < 0.08
feats = mask.astype(np.float32).reshape(B, X, Y, Z * C0)


class Prefix(nn.Module):
    @nn.compact
    def __call__(self, g):
        def bn(name):
            return BEVBatchNorm(use_running_average=True, name=name,
                                mask_output=False)
        g = BEVConv(C1, kernel_size=K0, mask_output=False, name="conv0")(g)
        g = bn("bn0")(g)
        g = g.replace(feats=_mask_bev(nn.relu(g.feats), g.mask, g.z))
        g = BEVConv(g.channels, kernel_size=2, stride=2, mask_output=False,
                    name="down0")(g)
        g = bn("down_bn0")(g)
        g = g.replace(feats=_mask_bev(nn.relu(g.feats), g.mask, g.z))
        return g


g0 = BEVGrid(feats=jnp.asarray(feats, jnp.bfloat16), mask=jnp.asarray(mask),
             z=Z)
mod = Prefix()
vs = jax.jit(mod.init)(jax.random.PRNGKey(0), g0)
vs = {
    "params": jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.15, a.dtype),
        vs["params"]),
    "batch_stats": jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype),
        vs["batch_stats"]),
}

ref = jax.jit(lambda v, g: mod.apply(v, g).feats)(vs, g0)


def affine(scope, zz):
    p, st = vs["params"][scope], vs["batch_stats"][scope]
    inv = 1.0 / np.sqrt(np.asarray(st["var"], np.float64) + 1e-5)
    s = inv * np.asarray(p["scale"], np.float64)
    bb = np.asarray(p["bias"], np.float64) - np.asarray(
        st["mean"], np.float64) * s
    return np.tile(s, zz), np.tile(bb, zz)


def fold_w2_k2s2(kern, z):
    cin, cout = kern.shape[3], kern.shape[4]
    z_out = (z + 1) // 2
    w2 = np.zeros((2, 2, z * cin, z_out * cout), np.float64)
    for zo in range(z_out):
        for t in range(2):
            zi = 2 * zo + t
            if 0 <= zi < z:
                w2[:, :, zi * cin:(zi + 1) * cin,
                   zo * cout:(zo + 1) * cout] = kern[:, :, t]
    return w2


w0_np = np.asarray(fold_w2_stride1(vs["params"]["conv0"]["kernel"], Z),
                   np.float64)
wd_np = fold_w2_k2s2(np.asarray(vs["params"]["down0"]["kernel"], np.float64),
                     Z)
s0, b0 = affine("bn0", Z)
sd, bd = affine("down_bn0", (Z + 1) // 2)

# ---- float64 oracle (im2col formulation) -------------------------------
f64 = feats.astype(np.float64)
pad = np.zeros((B, X + 4, Y + 4, Z * C0))
pad[:, 2:-2, 2:-2, :] = f64
cols = np.concatenate(
    [pad[:, a:a + X, b:b + Y, :] for a in range(5) for b in range(5)], -1)
act = cols @ w0_np.reshape(25 * Z * C0, Z * C1)
act = np.maximum(act * s0 + b0, 0.0)
mzc = np.repeat(mask, C1, axis=-1)
act = act * mzc
down = np.zeros((B, X // 2, Y // 2, (Z // 2) * C1))
for dx in range(2):
    for dy in range(2):
        down += act[:, dx::2, dy::2, :] @ wd_np[dx, dy]
down = np.maximum(down * sd + bd, 0.0)
m1 = mask.reshape(B, X // 2, 2, Y // 2, 2, Z // 2, 2).max((2, 4, 6))
oracle = down * np.repeat(m1, C1, axis=-1)

# ---- TPU kernel --------------------------------------------------------
out, m1k = jax.jit(lambda f, m: fused_head(
    f, m, jnp.asarray(w0_np), jnp.asarray(s0, jnp.float32),
    jnp.asarray(b0, jnp.float32), jnp.asarray(wd_np),
    jnp.asarray(sd, jnp.float32), jnp.asarray(bd, jnp.float32), z=Z))(
        g0.feats, g0.mask)


def cmp(name, a):
    a = np.asarray(a, np.float64)
    d = np.abs(a - oracle)
    scale = np.abs(oracle).max()
    nz = oracle != 0
    rel = d / np.maximum(np.abs(oracle), 1e-3)
    print(f"{name:8s}: maxabs={d.max():.4e} mean={d.mean():.3e} "
          f"p99rel={np.percentile(rel[nz], 99):.3e} "
          f"meanrel={rel[nz].mean():.3e} (|oracle|max={scale:.3f})")
    return d.max()


print("backend:", jax.default_backend())
cmp("xla", ref)
cmp("kernel", out)
print("mask equal:", bool(jnp.all(m1k == jnp.asarray(m1 > 0))))
d_xk = np.abs(np.asarray(ref, np.float64) - np.asarray(out, np.float64))
print(f"xla-vs-kernel maxabs={d_xk.max():.4e}")
