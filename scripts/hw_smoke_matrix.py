#!/usr/bin/env python
"""Hardware compile-smoke matrix: jit one forward of every flag family on
the REAL chip at small-but-kernel-engaging shapes.

Why: CPU-interpret tests cannot see hardware-only failures — the r5
nuScenes crash (sm block kernel VMEM overflow at z-extent-8 shapes,
fixed by `sm_block_vmem_ok`) shipped through a fully green CPU suite.
This script is the cheap insurance: each config variant compiles and
runs ONE forward on TPU and asserts a finite embedding.  ~1 min/case
(tunnel compile); run after kernel or gate changes, results in
BASELINE.md.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 4
IMG = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config, nuscenes_config
    from agplace_tpu.models.factory import make_query_model, query_apply, \
        query_init
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    rng = np.random.default_rng(0)

    def inputs(cfg, img_hw):
        images = jnp.asarray(
            rng.standard_normal((B, img_hw[0], img_hw[1], 3)), jnp.float32)
        pts = rng.uniform(-100, 100, (B, 8000, 3)).astype(np.float32)
        vox = batched_from_pointclouds(pts, cfg.data.quant_size, 2048)
        return images, vox

    # serving precision (bf16 activations) so the eval-mode kernels and
    # their gates are the thing being smoked
    base = kitti360_config()
    base = dataclasses.replace(
        base, model=dataclasses.replace(base.model,
                                        compute_dtype="bfloat16"))

    def mm_variant(name, **mm_kw):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(
                base.model,
                mm=dataclasses.replace(base.model.mm, **mm_kw)))
        return name, cfg, (IMG, IMG)

    def q_variant(name, modelq, **model_kw):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(
                base.model, modelq=modelq, **model_kw))
        return name, cfg, (IMG, IMG)

    nusc = nuscenes_config()
    nusc = dataclasses.replace(
        nusc, model=dataclasses.replace(nusc.model,
                                        compute_dtype="bfloat16"))
    cases = [
        mm_variant("mm_bev_default"),
        mm_variant("mm_dense_backend", voxfe_backend="dense"),
        mm_variant("mm_sparse_backend", voxfe_backend="sparse"),
        mm_variant("mm_ode_dopri5", ode=dataclasses.replace(
            base.model.mm.ode, method="dopri5")),
        mm_variant("mm_ode_rk4_nopallas", ode=dataclasses.replace(
            base.model.mm.ode, method="rk4", use_pallas=False)),
        mm_variant("mm_drop_image", drop="image"),
        mm_variant("mm_drop_pc", drop="pc"),
        mm_variant("mm_stem_pallas_optin", stem_pallas=True),
        mm_variant("mm_no_pallas_at_all", bev_pallas=False,
                   bev_fused_down=False),
        q_variant("minkloc_multimodal", "minkloc_multimodal"),
        q_variant("geoloc_netvlad", "geoloc", aggregation="netvlad"),
        ("nuscenes_tiny", nusc, (96, 6 * 96)),
    ]

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        cases = [c for c in cases if c[0] in only]

    results = {}
    failed = []
    for name, cfg, img_hw in cases:
        t0 = time.time()
        try:
            images, vox = inputs(cfg, img_hw)
            model = make_query_model(cfg, train=False)
            variables = jax.jit(
                lambda r, im, vx, m=model, q=cfg.model.modelq:
                query_init(q, m, r, im, vx))(
                    jax.random.PRNGKey(0), images, vox)

            @jax.jit
            def fwd(v, im, vx, m=model, q=cfg.model.modelq):
                out, _ = query_apply(q, m, v, im, vx)
                return out["embedding"]

            emb = fwd(variables, images, vox)
            ok = bool(jnp.isfinite(emb).all()) and emb.shape[0] == B
            results[name] = {"ok": ok, "s": round(time.time() - t0, 1),
                             "dim": int(emb.shape[-1])}
            if not ok:
                failed.append(name)
        except Exception as e:
            results[name] = {"ok": False, "s": round(time.time() - t0, 1),
                             "error": repr(e)[:200]}
            failed.append(name)
            traceback.print_exc(limit=3, file=sys.stderr)
        print(name, results[name], file=sys.stderr)

    print(json.dumps({"backend": jax.default_backend(),
                      "failed": failed, **results}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
