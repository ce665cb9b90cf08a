#!/usr/bin/env python
"""A/B the fused stem-tail kernel (ops/pallas/stem_pool.py) in the FULL
bench-config MM forward at both bench batch sizes, plus the DB tower at
its eval shape — the adjudication the r4 verdict required before trusting
the default.  Same timing harness as scripts/ab_pallas.py / bench.py."""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGE_SIZE = 256
VOX_CAP = 8192
INNER = 10
ITERS = 6
REPEATS = int(os.environ.get("AB_REPEATS", "3"))


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
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = many(y)
        float(y)
        times.append((time.perf_counter() - t0) / (ITERS * INNER))
    return min(times), times


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.models.dbvanilla2d import DBVanilla2D
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    base = kitti360_config()
    rng = np.random.default_rng(0)
    out = {"repeats": REPEATS}

    for batch in (32, 128):
        images = jnp.asarray(
            rng.standard_normal((batch, IMAGE_SIZE, IMAGE_SIZE, 3)),
            jnp.float32)
        pts = rng.uniform(-100, 100, (batch, 30000, 3)).astype(np.float32)
        sv = batched_from_pointclouds(pts, base.data.quant_size, VOX_CAP)
        vox = jax.tree_util.tree_map(
            jnp.asarray,
            rasterize_from_voxels_host(sv, base.model.mm.vox_grid_extent))

        for stem in (False, True):
            mmcfg = dataclasses.replace(base.model.mm, stem_pallas=stem)
            mm = MM(config=mmcfg, train=False, dtype=jnp.bfloat16)
            variables = jax.jit(mm.init)(jax.random.PRNGKey(0), images, vox)

            @jax.jit
            def embed(v, im, vx, mm=mm):
                return mm.apply(v, im, vx)["embedding"]

            def step(y, v=variables, embed=embed, images=images, vox=vox):
                return embed(v, images * (1.0 + 1e-9 * y),
                             vox)[0, 0].astype(jnp.float32)

            t, times = timed(step)
            key = f"mm_b{batch}_stem_{'on' if stem else 'off'}"
            out[key] = {"ms": round(t * 1e3, 3),
                        "desc_per_s": round(batch / t, 1),
                        "spread_ms": [round(x * 1e3, 3) for x in times]}
            print(key, out[key], file=sys.stderr)

    # DB tower at the reference eval shape: [b, nmap=2, 256, 256, 3]
    for stem in (False, True):
        dbcfg = dataclasses.replace(base.model.db, stem_pallas=stem)
        db = DBVanilla2D(config=dbcfg, dim=256, nmap=2, train=False,
                         dtype=jnp.bfloat16)
        maps = jnp.asarray(
            rng.standard_normal((32, 2, IMAGE_SIZE, IMAGE_SIZE, 3)),
            jnp.float32)
        variables = jax.jit(db.init)(jax.random.PRNGKey(0), maps)

        @jax.jit
        def embed(v, m, db=db):
            return db.apply(v, m)

        def step(y, v=variables, embed=embed, maps=maps):
            return embed(v, maps * (1.0 + 1e-9 * y))[0, 0].astype(
                jnp.float32)

        t, times = timed(step)
        key = f"db_b32_stem_{'on' if stem else 'off'}"
        out[key] = {"ms": round(t * 1e3, 3),
                    "desc_per_s": round(32 / t, 1),
                    "spread_ms": [round(x * 1e3, 3) for x in times]}
        print(key, out[key], file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
