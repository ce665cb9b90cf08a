#!/usr/bin/env python
"""Decompose the voxel stage-0 cost (prefix_1 = 2.79 ms at b32, r5) into
its pieces on-chip: bare parity convs, fused_conv0_down0, block0 (sm
kernel vs XLA), lateral 1x1.  In-jit chained method."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
VOX_CAP = 8192
INNER = 20
ITERS = 6


def timed(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(y):
        return jax.lax.fori_loop(0, INNER, lambda i, y: step(y), y)

    y = jnp.float32(0.0)
    for _ in range(2):
        y = many(y)
    float(y)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = many(y)
    float(y)
    return (time.perf_counter() - t0) / (ITERS * INNER)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.ops.pallas.bev_down import fused_conv0_down0
    from agplace_tpu.sparse import bev_grid
    from agplace_tpu.sparse.bev_grid import (
        BEVECABasicBlock, BEVConv, BEVGrid, _bn_eval_affine,
        fold_w2_k2s2, fold_w2_stride1, rasterize_from_voxels_host)
    from agplace_tpu.sparse.voxels import batched_from_pointclouds, \
        me_down_align

    cfg = kitti360_config()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))
    feats = vox.feats.astype(jnp.bfloat16)
    mask = vox.mask
    z0 = vox.z
    b, x, y_, zc0 = feats.shape
    c1 = cfg.model.mm.voxfe_planes[0]
    print(f"grid {feats.shape} z={z0}", file=sys.stderr)

    rngp = np.random.default_rng(1)
    k0 = jnp.asarray(rngp.standard_normal((5, 5, z0, 1, c1)) * 0.1,
                     jnp.float32)
    kd = jnp.asarray(rngp.standard_normal((2, 2, z0, c1, c1)) * 0.1,
                     jnp.float32)
    w0 = fold_w2_stride1(k0, z0)
    wd = fold_w2_k2s2(kd, z0)
    zo = me_down_align(z0)[2]
    s0 = jnp.asarray(rngp.uniform(0.5, 1.5, (z0 * c1,)), jnp.float32)
    b0 = jnp.asarray(rngp.standard_normal((z0 * c1,)), jnp.float32)
    sd = jnp.asarray(rngp.uniform(0.5, 1.5, (zo * c1,)), jnp.float32)
    bd = jnp.asarray(rngp.standard_normal((zo * c1,)), jnp.float32)

    results = {}

    # 1. bare parity convs only
    w2 = w0.astype(jnp.bfloat16)
    h = 2

    @jax.jit
    def parity_convs(yv):
        fb = (feats * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16)
        acc = jnp.float32(0.0)
        for px in range(2):
            for py in range(2):
                o = jax.lax.conv_general_dilated(
                    fb, w2, window_strides=(2, 2),
                    padding=[(h - px, 5 - 2 - h + px),
                             (h - py, 5 - 2 - h + py)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                acc = acc + o[0, 0, 0, 0].astype(jnp.float32)
        return acc

    results["parity_convs_bare"] = timed(parity_convs)

    # 1b. ONE full-res conv0 (the unsplit variant)
    @jax.jit
    def full_conv(yv):
        fb = (feats * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16)
        o = jax.lax.conv_general_dilated(
            fb, w2, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return o[0, 0, 0, 0].astype(jnp.float32)

    results["full_conv0_bare"] = timed(full_conv)

    # 2. fused_conv0_down0 (parity convs + kernel)
    @jax.jit
    def fused(yv):
        o, m = fused_conv0_down0(
            (feats * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16), mask, w0,
            s0, b0, wd, sd, bd, z=z0)
        return o[0, 0, 0, 0].astype(jnp.float32)

    results["fused_conv0_down0"] = timed(fused)

    # 3. block0 at the post-down shape, sm kernel vs XLA
    xo, yo = x // 2, y_ // 2
    import flax.linen as nn

    m1 = nn.max_pool(mask[..., None].astype(jnp.float32), (2, 2, 2),
                     strides=(2, 2, 2))[..., 0] > 0
    f1 = jnp.asarray(rngp.standard_normal((b, xo, yo, zo * c1)),
                     jnp.bfloat16)
    f1 = f1 * jnp.repeat(m1.astype(jnp.bfloat16), c1, axis=-1)
    g1 = BEVGrid(feats=f1, mask=m1, z=zo, stride=2)

    for use_pallas, name in ((True, "block0_sm"), (False, "block0_xla")):
        blk = BEVECABasicBlock(c1, train=False, use_pallas=use_pallas)
        bvars = blk.init(jax.random.PRNGKey(0), g1)

        @jax.jit
        def bstep(yv, blk=blk, bvars=bvars):
            g = g1.replace(feats=(f1 * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16))
            return blk.apply(bvars, g).feats[0, 0, 0, 0].astype(jnp.float32)

        results[name] = timed(bstep)

    # 4. lateral 1x1 conv at the block0 output shape
    lat = BEVConv(c1, kernel_size=1)
    lvars = lat.init(jax.random.PRNGKey(0), g1)

    @jax.jit
    def lstep(yv):
        g = g1.replace(feats=(f1 * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16))
        return lat.apply(lvars, g).feats[0, 0, 0, 0].astype(jnp.float32)

    results["lateral_1x1"] = timed(lstep)

    # 5. fused + block0(sm) + 1x1 chained (the whole prefix_1 equivalent)
    blk = BEVECABasicBlock(c1, train=False, use_pallas=True)
    bvars = blk.init(jax.random.PRNGKey(0), g1)

    @jax.jit
    def prefix(yv):
        o, m = fused_conv0_down0(
            (feats * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16), mask, w0,
            s0, b0, wd, sd, bd, z=z0)
        g = BEVGrid(feats=o.astype(jnp.bfloat16), mask=m, z=zo, stride=2)
        g = blk.apply(bvars, g)
        g = lat.apply(lvars, g)
        return g.feats[0, 0, 0, 0].astype(jnp.float32)

    results["prefix1_recomposed"] = timed(prefix)

    for k, v in results.items():
        print(f"{k}: {v * 1e3:.3f} ms", file=sys.stderr)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
