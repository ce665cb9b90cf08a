"""Benchmark entry — prints ONE JSON line with the headline metric.

Metric: query descriptors/sec/chip on the flagship MM query tower at the
reference's production shapes (KITTI-360 config: 256x256 ground image +
quantised LiDAR voxel cloud -> 256-d descriptor; ``BASELINE.json``).

``vs_baseline`` is measured throughput divided by BASELINE_DESC_PER_SEC —
the documented estimate of the PyTorch reference on its own RTX-4090-class
hardware (the repo publishes no numbers; see BASELINE.md).  The north-star is
vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Estimated reference throughput (PyTorch + MinkowskiEngine on RTX 4090,
# infer_batch_size 32, 256px, ~8k-voxel clouds).  See BASELINE.md.
BASELINE_DESC_PER_SEC = 1000.0

BATCH = 128  # serving batch: per-descriptor time is 29% better than the
# reference's infer_batch_size=32 (batch-32 rows stay in BASELINE.md)
IMAGE_SIZE = 256
VOX_CAP = 8192
WARMUP = 2
INNER = 10  # on-device chained iterations per dispatch (amortises the
# ~0.45 ms/dispatch tunnel RPC artifact; see BASELINE.md r3 notes)
ITERS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    cfg = kitti360_config()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)), jnp.float32)
    # LiDAR-realistic clouds: spinning-scanner geometry (uniform azimuth,
    # HDL-64 elevation FOV, log-uniform range to 100 m -> radially
    # concentrated returns, ground-plane truncation at sensor height 1.73 m)
    n_pts = 30000
    az = rng.uniform(0, 2 * np.pi, (BATCH, n_pts))
    elev = np.deg2rad(rng.uniform(-24.9, 2.0, (BATCH, n_pts)))
    r = np.exp(rng.uniform(np.log(2.0), np.log(100.0), (BATCH, n_pts)))
    pts = np.stack([
        r * np.cos(elev) * np.cos(az),
        r * np.cos(elev) * np.sin(az),
        np.maximum(r * np.sin(elev), -1.73),
    ], axis=-1).astype(np.float32)
    # voxelize + rasterize on HOST — the production input-pipeline split
    # (prepare_query_vox): the device program starts from the folded BEV
    # occupancy grid, exactly like the live collate path
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)
    vox = rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent)
    vox = jax.tree_util.tree_map(jnp.asarray, vox)

    mm = MM(config=cfg.model.mm, train=False,
            dtype=jnp.bfloat16)  # serving precision: bf16 acts, fp32 params
    variables = jax.jit(mm.init)(jax.random.PRNGKey(0), images, vox)

    @jax.jit
    def embed(v, im, vx):
        return mm.apply(v, im, vx)["embedding"]

    # NOTE: inputs must differ per iteration and completion must be forced
    # by a host fetch — some remote-attached backends memoise identical
    # dispatches and return from block_until_ready before execution
    # completes.  The chain is folded INSIDE one jit (each iteration's
    # output scalar perturbs the next input) so the loop measures pure
    # device throughput: per-dispatch chaining adds ~0.45 ms of tunnel RPC
    # per call on this dev harness — an artifact a real TPU host does not
    # pay (BASELINE.md r3 measurement notes).
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
    float(y)  # forces the whole chain
    dt = (time.perf_counter() - t0) / INNER

    # the jitted fns run unsharded on ONE device, so the measured
    # throughput already IS per-chip — dividing by jax.device_count()
    # would under-report n-fold on a multi-chip host
    value = desc_per_sec = BATCH * ITERS / dt

    # achieved FLOPs/s vs v5e bf16 peak (197 TFLOP/s), from XLA's own cost
    # analysis.  The fused Pallas blocks hide their FLOPs inside a
    # custom-call, so the count comes from the SAME model lowered with the
    # kernels disabled (identical math on the XLA path).
    import os

    from agplace_tpu.utils.flops import cost_analysis

    import sys

    os.environ["AGPLACE_DISABLE_PALLAS"] = "1"
    try:
        # pass buffers as lowering ARGS, never closures: baked constants
        # are the remote relay's documented 413 failure mode
        emb_fn = lambda v, im, vx: mm.apply(v, im, vx)["embedding"]
        flops = -1.0
        for attempt in range(2):  # the remote-compile relay is flaky
            try:
                flops = cost_analysis(
                    emb_fn, variables, images, vox)["flops"]
                break
            except Exception as e:
                print(f"cost_analysis attempt {attempt}: {e!r}",
                      file=sys.stderr)
        if flops <= 0:
            # fall back to a small-batch analysis scaled linearly (the
            # model is purely batch-linear; smaller program = more
            # reliable remote compile)
            try:
                small = jax.tree_util.tree_map(lambda a: a[:8], (images, vox))
                flops = cost_analysis(
                    emb_fn, variables, *small)["flops"] * (BATCH / 8)
            except Exception as e:
                print(f"cost_analysis fallback: {e!r}", file=sys.stderr)
    finally:
        del os.environ["AGPLACE_DISABLE_PALLAS"]
    mfu = flops / (dt / ITERS) / 197e12 if flops > 0 else -1.0
    print(json.dumps({
        "metric": "query_descriptors_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "desc/s/chip",
        "vs_baseline": round(value / BASELINE_DESC_PER_SEC, 3),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
