#!/usr/bin/env python
"""Training-step compute time at reference scale on the real chip.

Reference scale (BASELINE.md): 16 triplets x (1 query + 1 pos + 10 negs)
= 176 aerial tiles + 16 query images @256px + 16 LiDAR clouds per step,
both towers, triplet + geo-BCE losses, param-group Adam.

Method: the batch is made device-resident FIRST (one jit-arg upload),
then N sequential steps are chained through the evolving train state
(state_{i+1} = step(state_i, batch) — the state dependency defeats the
axon backend's identical-dispatch memoisation) and drained with ONE host
fetch at the end.  This measures device compute, not the tunnel
(BASELINE.md r2/r3 measurement notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 8
WARMUP = 2
# activations dtype: the config default (fp32, reference-parity) or
# bfloat16 (--compute_dtype bfloat16, the TPU fast path)
DTYPE = os.environ.get("TRAIN_BENCH_DTYPE", "float32")


def main() -> None:
    import dataclasses

    import jax

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import init_state, make_train_step

    cfg = kitti360_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, dataset="synthetic"),
        model=dataclasses.replace(cfg.model, compute_dtype=DTYPE))
    ds = SyntheticDataset(n_db=64, n_q=32, image_size=cfg.data.q_resize,
                          n_points=cfg.data.vox_max_points, seed=0)
    rng = np.random.default_rng(0)
    rows = TripletMiner(cfg, ds).mine_random(rng, cfg.train.train_batch_size)
    batch = collate_train(ds, rows, cfg, rng)
    nbytes = sum(np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(batch))
    print(f"batch: {nbytes / 1e6:.0f} MB host-side", file=sys.stderr)

    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)

    # device-resident batch: upload once through jit-args (the warmup
    # drain below forces the transfer + compile before timing starts)
    dev_batch = jax.jit(lambda b: b)(batch)

    for _ in range(WARMUP):
        state, metrics = step(state, dev_batch)
    float(metrics["loss"])  # drain warmup

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, dev_batch)
    loss = float(metrics["loss"])  # single drain
    dt = (time.perf_counter() - t0) / STEPS
    n_samples = cfg.train.train_batch_size
    print(json.dumps({
        "metric": "train_step_ms_compute",
        "value": round(dt * 1e3, 1),
        "triplets_per_sec": round(n_samples / dt, 1),
        "loss": round(loss, 4),
        "steps": STEPS,
        "compute_dtype": DTYPE,
    }))


if __name__ == "__main__":
    main()
