"""Training driver — reference ``train.py:85-413`` rebuilt.

Per epoch: ``loops_num = ceil(queries_per_epoch / cache_refresh_rate)`` mining
rounds, each refreshing triplets with the miner then running the jitted train
step over the mined batches; per-epoch evaluation; best-model tracking on
R@1+R@5+R@10 (``train.py:363-372``); checkpointing.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Dict, Optional

import jax
import numpy as np

from agplace_tpu.config import Config
from agplace_tpu.data.base import PlaceDataset, collate_train
from agplace_tpu.data.pipeline import Prefetcher, prefetch_to_device
from agplace_tpu.evaluate import evaluate
from agplace_tpu.parallel.mesh import (
    replicate_tree,
    resolve_data_mesh,
    resolve_gallery_mesh,
)
from agplace_tpu.train.checkpoint import CheckpointManager
from agplace_tpu.train.mining import TripletMiner
from agplace_tpu.train.state import TrainState
from agplace_tpu.train.step import init_state, make_infer_fns, make_train_step
from agplace_tpu.utils.common import MetricsWriter, PhaseTimer, count_params


def train(
    cfg: Config,
    train_ds: PlaceDataset,
    test_ds: PlaceDataset,
    state: Optional[TrainState] = None,
    max_steps: Optional[int] = None,
    results_logger=None,
) -> Dict:
    """Runs the full training loop; returns summary dict with the final
    state, per-epoch recalls, and best metrics."""
    log = logging.getLogger("train")
    rng = np.random.default_rng(cfg.train.seed)
    metrics_out = MetricsWriter(f"{cfg.train.save_dir}/metrics.jsonl")
    timer = PhaseTimer()

    # device meshes: batches shard over the data axis (SyncBN and gradient
    # all-reduce are implicit under GSPMD), retrieval shards the gallery.
    # The reference's whole multi-device story is DataParallel+SyncBN on one
    # host (train.py:253-256); here it is declarative and test-covered.
    mesh = resolve_data_mesh(
        cfg.mesh, (cfg.train.train_batch_size, cfg.train.infer_batch_size))
    gallery_mesh = resolve_gallery_mesh(cfg.mesh)
    if mesh is not None:
        log.info("data mesh: %s", dict(mesh.shape))
    if gallery_mesh is not None:
        log.info("gallery mesh: %s", dict(gallery_mesh.shape))

    miner = TripletMiner(cfg, train_ds)
    train_step = make_train_step(cfg)
    embed_q, embed_db = make_infer_fns(cfg)

    if state is None:
        warm = miner.mine_random(rng, cfg.train.train_batch_size)
        batch = collate_train(train_ds, warm, cfg, rng)
        state = init_state(cfg, jax.random.PRNGKey(cfg.train.seed), batch,
                           train_ds=train_ds)
    if mesh is not None:
        state = replicate_tree(mesh, state)
    log.info("params: %d", count_params(state.params))

    ckpt = CheckpointManager(cfg.train.save_dir)
    start_epoch = 0
    best_r1r5r10ep = [0.0, 0.0, 0.0, 0]
    best_r5 = 0.0  # best R@5 seen (reference meta field, train.py:384)
    not_improved_num = 0  # epochs since is_best (train.py:385)
    if cfg.train.resume:
        state, meta = ckpt.restore(cfg.train.resume, state)
        start_epoch = int(meta["epoch_num"]) + 1
        best_r5 = float(meta.get("best_r5", 0.0))
        not_improved_num = int(meta.get("not_improved_num", 0))
        log.info("resumed from %s at epoch %d", cfg.train.resume, start_epoch)

    history = []
    steps_done = 0
    profiling = False
    for epoch in range(start_epoch, cfg.train.epochs_num):
        t0 = time.time()
        epoch_losses = []
        loops_num = math.ceil(cfg.train.queries_per_epoch
                              / cfg.train.cache_refresh_rate)
        for loop in range(loops_num):
            with timer("mining"):
                triplets = miner.mine(
                    rng, cfg.train.cache_refresh_rate,
                    params=state.params, batch_stats=state.batch_stats,
                    embed_q=embed_q, embed_db=embed_db, mesh=mesh,
                    gallery_mesh=gallery_mesh)
            bs = cfg.train.train_batch_size
            n_batches = len(triplets) // bs
            row_chunks = [triplets[b * bs : (b + 1) * bs]
                          for b in range(n_batches)]
            seeds = rng.integers(0, 2 ** 31, size=n_batches)
            loader = Prefetcher(
                list(zip(row_chunks, seeds)),
                lambda it: collate_train(
                    train_ds, it[0], cfg, np.random.default_rng(it[1])),
                num_workers=cfg.data.num_workers,
            )
            # double-buffered host->device transfer; with a mesh the leading
            # batch axis is sharded over the data axis
            device_loader = prefetch_to_device(loader, sharding=mesh)
            with timer("train"):
                for batch in device_loader:
                    # flag-gated profiler trace of the first N steps
                    # (SURVEY.md §5.1: the reference has no tracing at all)
                    if (cfg.train.profile_steps > 0
                            and steps_done == 0 and epoch == start_epoch):
                        jax.profiler.start_trace(
                            f"{cfg.train.save_dir}/profile")
                        profiling = True
                    state, m = train_step(state, batch)
                    # keep the loss ON DEVICE: a float() here would block
                    # the host inside the prefetch window (a ~25 ms
                    # round-trip per step over remote links), defeating the
                    # double-buffering.  Scalars are drained once per
                    # mining round below.
                    epoch_losses.append(m["loss"])
                    steps_done += 1
                    if profiling and steps_done >= cfg.train.profile_steps:
                        jax.profiler.stop_trace()
                        profiling = False
                        log.info("profiler trace written to %s/profile",
                                 cfg.train.save_dir)
                    if max_steps is not None and steps_done >= max_steps:
                        break
            # one host sync per mining round, outside the hot loop
            epoch_losses = [float(x) for x in epoch_losses]
            if max_steps is not None and steps_done >= max_steps:
                break

        with timer("eval"):
            recalls, recalls_str = evaluate(
                cfg, test_ds, state.params, state.batch_stats,
                embed_q, embed_db, mesh=mesh, gallery_mesh=gallery_mesh)
        mean_loss = float(np.mean(epoch_losses)) if epoch_losses else 0.0
        is_best = sum(recalls[:3]) > sum(best_r1r5r10ep[:3])
        if is_best:
            best_r1r5r10ep = [recalls[0], recalls[1], recalls[2], epoch]
            not_improved_num = 0
        else:
            not_improved_num += 1
        best_r5 = max(best_r5, float(recalls[1]))
        log.info("epoch %d: loss=%.4f %s (best ep %d) [%.1fs]", epoch,
                 mean_loss, recalls_str, best_r1r5r10ep[3], time.time() - t0)
        if results_logger is not None:  # results/{exp_name}.txt parity
            results_logger.info(
                f"epoch {epoch}: loss={mean_loss:.4f} {recalls_str}")
        metrics_out.write({
            "epoch": epoch, "loss": mean_loss,
            "recalls": recalls.tolist(), "is_best": is_best,
            "phase_times": dict(timer.totals),
        })
        history.append({"epoch": epoch, "loss": mean_loss,
                        "recalls": recalls})

        if epoch > cfg.train.checkpoint_after_epoch or is_best:
            ckpt.save(state, epoch, recalls, best_r5=best_r5,
                      not_improved_num=not_improved_num, is_best=is_best)
        if max_steps is not None and steps_done >= max_steps:
            break

    if profiling:  # training ended before profile_steps: flush the trace
        jax.profiler.stop_trace()

    return {
        "state": state,
        "history": history,
        "best": best_r1r5r10ep,
        "phase_times": dict(timer.totals),
    }
