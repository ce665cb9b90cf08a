#!/usr/bin/env python
"""nuScenes-AG-shape throughput on the real chip (BASELINE.md second
config): 6-cam 192 px width-concatenated panorama [B, 192, 1728, 3]
(``datasets_ws_nuscenes.py:604-634``), z-extent 8 voxel grid, batch 32.
Same in-jit chained method as bench.py."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
PANO_H, PANO_W = 192, 6 * 288
VOX_CAP = 8192
WARMUP = 2
INNER = 10
ITERS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import nuscenes_config
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    cfg = nuscenes_config()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, PANO_H, PANO_W, 3)), jnp.float32)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))

    mm = MM(config=cfg.model.mm, train=False, dtype=jnp.bfloat16)
    variables = jax.jit(mm.init)(jax.random.PRNGKey(0), images, vox)

    @jax.jit
    def embed(v, im, vx):
        return mm.apply(v, im, vx)["embedding"]

    def one(y):
        emb = embed(variables, images * (1.0 + 1e-9 * y), vox)
        return emb[0, 0].astype(jnp.float32)

    @jax.jit
    def step(y):
        return jax.lax.fori_loop(0, INNER, lambda i, y: one(y), y)

    y = jnp.float32(0.0)
    for _ in range(WARMUP):
        y = step(y)
    float(y)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = step(y)
    float(y)
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(json.dumps({
        "metric": "nuscenes_desc_per_sec_per_chip",
        "per_fwd_ms": round(dt * 1e3, 2),
        "value": round(BATCH / dt, 1),
        "unit": "desc/s/chip",
    }))


if __name__ == "__main__":
    main()
