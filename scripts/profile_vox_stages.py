#!/usr/bin/env python
"""Per-stage cost and achieved-MFU probe for the BEV voxel branch at the
bench config (post-me_down_align the deep stages carry z=2, 4x the folded
channel work of the old z=1 tail): times FPN prefixes (planes[:1],
planes[:2], full) with the in-jit chained method and pairs each delta
with XLA cost-analysis FLOPs, so each stage's achieved FLOP/s is visible
against the v5e bf16 peak (197 TF/s)."""

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
    from agplace_tpu.sparse.bev_grid import (
        BEVMinkFPN,
        rasterize_from_voxels_host,
    )
    from agplace_tpu.sparse.voxels import batched_from_pointclouds
    from agplace_tpu.utils.flops import cost_analysis

    cfg = kitti360_config()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))

    planes = cfg.model.mm.voxfe_planes
    results = {}
    prev_t, prev_f = 0.0, 0.0
    for n in range(1, len(planes) + 1):
        net = BEVMinkFPN(out_channels=planes[n - 1], planes=planes[:n],
                         layers=cfg.model.mm.voxfe_layers[:n],
                         num_top_down=0, conv0_kernel_size=5,
                         block=cfg.model.mm.voxfe_block)
        bev0 = vox.replace(feats=vox.feats.astype(jnp.bfloat16))
        variables = jax.jit(net.init)(jax.random.PRNGKey(0), bev0)

        def fwd(v, grid, feats):
            out, _ = net.apply(v, grid.replace(feats=feats))
            return out.feats

        feats0 = bev0.feats

        @jax.jit
        def step(y, v=variables, grid=bev0, f0=feats0, fn=fwd):
            o = fn(v, grid, f0 * (1.0 + 1e-9 * y))
            return o.reshape(-1)[0].astype(jnp.float32)

        t = timed(step)
        try:
            fl = cost_analysis(fwd, variables, bev0, feats0)["flops"]
        except Exception as e:
            print(f"cost_analysis stage {n}: {e!r}", file=sys.stderr)
            fl = -1.0
        row = {"ms": round(t * 1e3, 3),
               "gflops": round(fl / 1e9, 1) if fl > 0 else None,
               "mfu": round(fl / t / 197e12, 3) if fl > 0 else None}
        if n > 1 and fl > 0 and prev_f > 0:
            dt_, df = t - prev_t, fl - prev_f
            row["stage_delta_ms"] = round(dt_ * 1e3, 3)
            row["stage_delta_mfu"] = (round(df / dt_ / 197e12, 3)
                                      if dt_ > 0 else None)
        results[f"prefix_{n}_stages"] = row
        prev_t, prev_f = t, fl
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
