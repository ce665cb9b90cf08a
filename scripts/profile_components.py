#!/usr/bin/env python
"""Per-component timing of the bench-config MM forward on the real chip.

Chained-dispatch method (BASELINE.md "Measurement method"): every timed
region is a jitted fn whose output scalar perturbs the next call's input,
so the backend cannot memoise identical dispatches; one host fetch drains
the chain.  Produces the profile table for BASELINE.md (VERDICT r2 item 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
IMAGE_SIZE = 256
VOX_CAP = 8192
ITERS = 30


INNER = 20  # on-device chained iterations per dispatch


def timed(step, warmup=2, iters=6):
    """Times ``step`` with the chain folded INSIDE one jit (lax.fori_loop),
    so the per-dispatch tunnel overhead (~0.3-1 ms on the axon relay) is
    amortised over INNER on-device iterations — per-dispatch chaining
    overestimates sub-millisecond components."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(y):
        return jax.lax.fori_loop(0, INNER, lambda i, y: step(y), y)

    y = jnp.float32(0.0)
    for _ in range(warmup):
        y = many(y)
    float(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = many(y)
    float(y)
    return (time.perf_counter() - t0) / (iters * INNER)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.models.image_fe import ImageFE
    from agplace_tpu.models.mm import MM
    from agplace_tpu.models.pooling import GeM
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    cfg = kitti360_config()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)), jnp.float32)
    n_pts = 30000
    az = rng.uniform(0, 2 * np.pi, (BATCH, n_pts))
    elev = np.deg2rad(rng.uniform(-24.9, 2.0, (BATCH, n_pts)))
    r = np.exp(rng.uniform(np.log(2.0), np.log(100.0), (BATCH, n_pts)))
    pts = np.stack([
        r * np.cos(elev) * np.cos(az),
        r * np.cos(elev) * np.sin(az),
        np.maximum(r * np.sin(elev), -1.73),
    ], axis=-1).astype(np.float32)
    vox = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)

    mm = MM(config=cfg.model.mm, train=False, dtype=jnp.bfloat16)
    variables = jax.jit(mm.init)(jax.random.PRNGKey(0), images, vox)

    results = {}

    # full forward
    @jax.jit
    def full(y):
        out = mm.apply(variables, images * (1.0 + 1e-9 * y), vox)
        return out["embedding"][0, 0].astype(jnp.float32)

    results["full_forward"] = timed(full)

    # image branch: ImageFE -> GeM (standalone module, grafted params)
    fe = ImageFE(fe_type=cfg.model.mm.imgfe, layers=cfg.model.mm.imgfe_layers,
                 dtype=jnp.bfloat16)
    fe_vars = {"params": variables["params"]["image_fe"],
               "batch_stats": variables["batch_stats"]["image_fe"]}
    gem_vars = {"params": variables["params"]["image_pool"]}
    gem = GeM()

    @jax.jit
    def image_branch(y):
        m, _ = fe.apply(fe_vars, images * (1.0 + 1e-9 * y))
        return gem.apply(gem_vars, m)[0, 0].astype(jnp.float32)

    results["image_branch"] = timed(image_branch)

    # image stem only (conv1+bn+relu+maxpool)
    from agplace_tpu.models.resnet import ResNetFeatures

    @jax.jit
    def fe_maps(y):
        m, maps = fe.apply(fe_vars, images * (1.0 + 1e-9 * y))
        return sum(mp[0, 0, 0, 0].astype(jnp.float32) for mp in maps)

    results["image_fe_maps_all"] = timed(fe_maps)

    # stem ablation: plain 7x7/2 conv vs the space-to-depth rewrite
    w1 = variables["params"]["image_fe"]["fe"]["conv1"]["kernel"]

    def stem_plain(y):
        x = images * (1.0 + 1e-9 * y)
        o = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), jnp.asarray(w1, jnp.bfloat16),
            window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return o[0, 0, 0, 0].astype(jnp.float32)

    results["stem_conv_plain"] = timed(stem_plain)

    # voxel branch (BEV backend) alone
    from agplace_tpu.sparse.bev_grid import (
        BEVMinkFPN, BEVMinkGeM, bev_densify)

    bev_net = BEVMinkFPN(
        out_channels=cfg.model.mm.voxfe_planes[-1],
        planes=cfg.model.mm.voxfe_planes,
        layers=cfg.model.mm.voxfe_layers,
        num_top_down=cfg.model.mm.voxfe_ntd,
        conv0_kernel_size=5,
        block=cfg.model.mm.voxfe_block)
    vox_vars = {"params": variables["params"]["vox_fe"],
                "batch_stats": variables["batch_stats"]["vox_fe"]}
    pool_vars = {"params": variables["params"]["vox_pool"]}

    @jax.jit
    def vox_branch(y):
        bev = bev_densify(vox, extent=cfg.model.mm.vox_grid_extent,
                          dtype=jnp.bfloat16, ones_feats=True)
        bev = bev.replace(feats=bev.feats * (1.0 + 1e-9 * y))
        out, _ = bev_net.apply(vox_vars, bev)
        return BEVMinkGeM().apply(pool_vars, out)[0, 0].astype(jnp.float32)

    results["vox_branch"] = timed(vox_branch)

    # densify scatter alone (coords perturbed by a runtime zero so the
    # fori_loop body cannot be hoisted as loop-invariant)
    def densify_only(y):
        dz = (y * 1e-30).astype(jnp.int32)
        v = vox.replace(coords=vox.coords + dz)
        bev = bev_densify(v, extent=cfg.model.mm.vox_grid_extent,
                          dtype=jnp.bfloat16, ones_feats=True)
        return bev.feats[0, 0, 0, 0].astype(jnp.float32) + y * 1e-9

    results["densify_only"] = timed(densify_only)

    # stage-2 fusion alone (dense image part at final-map shape)
    from agplace_tpu.models.fusion import Stage2FuseBlockAdd

    imgmap = jnp.asarray(
        rng.standard_normal((BATCH, IMAGE_SIZE // 8, IMAGE_SIZE // 8,
                             cfg.model.mm.imgfe_dim)), jnp.bfloat16)
    fusev = jnp.asarray(rng.standard_normal((BATCH, 256)), jnp.float32)
    s2 = Stage2FuseBlockAdd(fusedim=256, imgdim=cfg.model.mm.imgfe_dim,
                            voxdim=cfg.model.mm.voxfe_dim,
                            dtype=jnp.bfloat16)
    s2_vars = {"params": variables["params"]["stg2fuseblock"],
               "batch_stats": variables["batch_stats"]["stg2fuseblock"]}

    @jax.jit
    def stage2(y):
        fv, iv, _ = s2.apply(s2_vars, imgmap * (1.0 + 1e-9 * y), None, None,
                             fusev)
        return fv[0, 0].astype(jnp.float32)

    results["stage2_dense"] = timed(stage2)

    for k, v in results.items():
        print(f"{k}: {v * 1e3:.3f} ms")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
