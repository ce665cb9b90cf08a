"""Standalone evaluation entry — the reference's ``test.py`` surface (which
is broken as shipped, ``test.py:215-285`` imports nonexistent modules; this
one works, per SURVEY.md §7.5).

    python test.py --dataset kitti360 --resume <checkpoint-name>
"""

from __future__ import annotations

import logging

from agplace_tpu.config import parse_arguments
from agplace_tpu.evaluate import evaluate
from agplace_tpu.parallel.mesh import (
    replicate_tree,
    resolve_data_mesh,
    resolve_gallery_mesh,
)
from agplace_tpu.train.checkpoint import CheckpointManager
from agplace_tpu.train.step import make_infer_fns, template_state
from agplace_tpu.utils.common import setup_logging


def main() -> None:
    cfg = parse_arguments()
    setup_logging(cfg.train.save_dir)
    log = logging.getLogger("test")

    from train import build_datasets

    _, test_ds = build_datasets(cfg)

    # synthetic template for the restore — shapes only, no real-data walk
    state = template_state(cfg, seed=cfg.train.seed)

    if cfg.train.resume:
        ckpt = CheckpointManager(cfg.train.save_dir)
        state, meta = ckpt.restore(cfg.train.resume, state)
        log.info("restored %s (epoch %d)", cfg.train.resume,
                 meta["epoch_num"])
    elif cfg.data.dataset != "synthetic":
        # evaluating random-init weights on a real dataset prints
        # legitimate-looking garbage recalls; refuse (synthetic smoke
        # runs stay allowed)
        raise SystemExit(
            "test.py needs --resume <checkpoint-name> (random-init eval "
            "is only allowed with --dataset synthetic)")

    # same mesh resolution as the train driver (train/loop.py): embed
    # passes shard over the data axis, retrieval over the gallery axis
    mesh = resolve_data_mesh(
        cfg.mesh, (cfg.train.train_batch_size, cfg.train.infer_batch_size))
    gallery_mesh = resolve_gallery_mesh(cfg.mesh)
    if mesh is not None:
        state = replicate_tree(mesh, state)
        log.info("data mesh: %s", dict(mesh.shape))
    if gallery_mesh is not None:
        log.info("gallery mesh: %s", dict(gallery_mesh.shape))

    embed_q, embed_db = make_infer_fns(cfg)
    recalls, recalls_str = evaluate(cfg, test_ds, state.params,
                                    state.batch_stats, embed_q, embed_db,
                                    mesh=mesh, gallery_mesh=gallery_mesh)
    log.info("Recalls on %s: %s", cfg.data.dataset, recalls_str)
    print(recalls_str)


if __name__ == "__main__":
    main()
