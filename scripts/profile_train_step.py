#!/usr/bin/env python
"""Decompose the train step's 48 ms (bf16) on the real chip: aerial-tower
fwd+bwd, query-tower fwd+bwd, losses, optimizer update — each timed as a
separate jitted gradient with the chained-state method."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 6
WARMUP = 2
DTYPE = os.environ.get("TRAIN_BENCH_DTYPE", "bfloat16")


def timed_state(fn, state, batch):
    """Times state -> state chained steps (the state dependency defeats
    dispatch memoisation); one drain at the end."""
    import jax
    import jax.numpy as jnp

    # fresh buffer copy: the full step donates its input state, which
    # would invalidate the shared `state` for later sub-benchmarks
    s = jax.tree_util.tree_map(jnp.array, state)
    for _ in range(WARMUP):
        s = fn(s, batch)
    float(np.asarray(jax.tree_util.tree_leaves(s.params)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s = fn(s, batch)
    float(np.asarray(jax.tree_util.tree_leaves(s.params)[0]).ravel()[0])
    return (time.perf_counter() - t0) / STEPS


def main() -> None:
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import (
        build_models,
        init_state,
        make_train_step,
        _make_tx,
    )

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
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    batch = jax.jit(lambda b: b)(batch)

    mm, db = build_models(cfg, train=True)
    tx = _make_tx(cfg)
    results = {}

    # full step
    step = make_train_step(cfg)

    def full(s, b):
        return step(s, b)[0]

    results["full_step"] = round(timed_state(full, state, batch) * 1e3, 2)

    # aerial tower fwd+bwd only (176 tiles @256px)
    @jax.jit
    def db_step(s, b):
        def loss_fn(p):
            out, _ = db.apply({"params": p["db"],
                               "batch_stats": s.batch_stats["db"]},
                              b["db_map"], mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss_fn)(s.params)
        return s.replace(params=jax.tree_util.tree_map(
            lambda a, ga: a - 1e-12 * ga, s.params, g))

    results["aerial_fwd_bwd"] = round(
        timed_state(db_step, state, batch) * 1e3, 2)

    # query tower fwd+bwd only (16 images + clouds)
    @jax.jit
    def q_step(s, b):
        def loss_fn(p):
            out, _ = mm.apply({"params": p["mm"],
                               "batch_stats": s.batch_stats["mm"]},
                              b["query_image"], b["vox"],
                              mutable=["batch_stats"])
            return jnp.sum(out["embedding"].astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss_fn)(s.params)
        return s.replace(params=jax.tree_util.tree_map(
            lambda a, ga: a - 1e-12 * ga, s.params, g))

    results["query_fwd_bwd"] = round(
        timed_state(q_step, state, batch) * 1e3, 2)

    # optimizer update alone (grads := params as a stand-in pytree)
    @jax.jit
    def opt_step(s, b):
        updates, new_opt = tx.update(s.params, s.opt_state, s.params)
        return s.replace(params=optax.apply_updates(s.params, updates),
                         opt_state=new_opt)

    results["optimizer_update"] = round(
        timed_state(opt_step, state, batch) * 1e3, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
