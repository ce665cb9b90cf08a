#!/usr/bin/env python
"""nuScenes-AG-shape throughput on the real chip (BASELINE.md second
config): 6-cam 192 px width-concatenated panorama [B, 192, 1728, 3]
(``datasets_ws_nuscenes.py:604-634``), z-extent 8 voxel grid, batch 32.
Same in-jit chained method as bench.py, REPEATS measurements (min +
spread).  ``--ab-stem`` additionally measures ``stem_pallas=True`` — the
image-bound config where the fused stem tail has the most surface
(VERDICT r4 item 6); both rows land in BASELINE.md."""

from __future__ import annotations

import dataclasses
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
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _measure(mm, variables, images, vox, jax, jnp):
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
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = step(y)
        float(y)
        times.append((time.perf_counter() - t0) / (ITERS * INNER))
    return sorted(times)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import nuscenes_config
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    ab_stem = "--ab-stem" in sys.argv

    cfg = nuscenes_config()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, PANO_H, PANO_W, 3)), jnp.float32)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))

    out = {"metric": "nuscenes_desc_per_sec_per_chip",
           "unit": "desc/s/chip", "repeats": REPEATS}
    for stem in ((False, True) if ab_stem else (False,)):
        mmcfg = dataclasses.replace(cfg.model.mm, stem_pallas=stem)
        mm = MM(config=mmcfg, train=False, dtype=jnp.bfloat16)
        variables = jax.jit(mm.init)(jax.random.PRNGKey(0), images, vox)
        times = _measure(mm, variables, images, vox, jax, jnp)
        row = {"per_fwd_ms": round(times[0] * 1e3, 2),
               "value": round(BATCH / times[0], 1),
               "ms_all": [round(t * 1e3, 3) for t in times]}
        if stem:
            out["stem_on"] = row
            print("stem_on", row, file=sys.stderr)
        else:
            out.update(row)
            print("stem_off", row, file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
