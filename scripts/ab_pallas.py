#!/usr/bin/env python
"""A/B the opt-in fused Pallas kernels in the FULL bench-config forward.

The r3 pre-me_down_align verdict was neutral-to-negative (XLA overlaps
stage-0 HBM traffic with the image branch); post-fix the voxel stages
1-2 carry 4x the folded channel work, so the overlap balance changed —
re-measure before trusting the old defaults."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("AB_BATCH", "128"))
IMAGE_SIZE = 256
VOX_CAP = 8192
INNER = 10
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
    import dataclasses

    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    base = kitti360_config()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)), jnp.float32)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, base.data.quant_size, VOX_CAP)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, base.model.mm.vox_grid_extent))

    results = {}
    for name, kw in [
        ("baseline", {}),
        ("pallas_block", {"bev_pallas": True}),
        ("pallas_head", {"bev_pallas_head": True}),
        ("both", {"bev_pallas": True, "bev_pallas_head": True}),
    ]:
        mmcfg = dataclasses.replace(base.model.mm, **kw)
        mm = MM(config=mmcfg, train=False, dtype=jnp.bfloat16)
        variables = jax.jit(mm.init)(jax.random.PRNGKey(0), images, vox)

        @jax.jit
        def embed(v, im, vx, mm=mm):
            return mm.apply(v, im, vx)["embedding"]

        def step(y, v=variables, embed=embed):
            return embed(v, images * (1.0 + 1e-9 * y),
                         vox)[0, 0].astype(jnp.float32)

        t = timed(step)
        results[name] = {"ms": round(t * 1e3, 3),
                         "desc_per_s": round(BATCH / t, 1)}
        print(name, results[name], file=sys.stderr)
    print(json.dumps({"batch": BATCH, **results}))


if __name__ == "__main__":
    main()
