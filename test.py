"""Standalone evaluation entry — the reference's ``test.py`` surface (which
is broken as shipped, ``test.py:215-285`` imports nonexistent modules; this
one works, per SURVEY.md §7.5).

    python test.py --dataset kitti360 --resume <checkpoint-name>
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from agplace_tpu.config import parse_arguments
from agplace_tpu.data.base import collate_train
from agplace_tpu.evaluate import evaluate
from agplace_tpu.train.checkpoint import CheckpointManager
from agplace_tpu.train.mining import TripletMiner
from agplace_tpu.train.step import init_state, make_infer_fns
from agplace_tpu.utils.common import setup_logging


def main() -> None:
    cfg = parse_arguments()
    setup_logging(cfg.train.save_dir)
    log = logging.getLogger("test")

    from train import build_datasets

    train_ds, test_ds = build_datasets(cfg)

    # template state for checkpoint restore
    rng = np.random.default_rng(cfg.train.seed)
    miner = TripletMiner(cfg, train_ds)
    batch = collate_train(train_ds, miner.mine_random(
        rng, cfg.train.train_batch_size), cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(cfg.train.seed), batch)

    if cfg.train.resume:
        ckpt = CheckpointManager(cfg.train.save_dir)
        state, meta = ckpt.restore(cfg.train.resume, state)
        log.info("restored %s (epoch %d)", cfg.train.resume,
                 meta["epoch_num"])

    embed_q, embed_db = make_infer_fns(cfg)
    recalls, recalls_str = evaluate(cfg, test_ds, state.params,
                                    state.batch_stats, embed_q, embed_db)
    log.info("Recalls on %s: %s", cfg.data.dataset, recalls_str)
    print(recalls_str)


if __name__ == "__main__":
    main()
