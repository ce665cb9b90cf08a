"""Training entry point — the reference's ``python train.py`` surface
(``/root/reference/train.py:85-413``) on the TPU-native stack.

    python train.py --dataset kitti360 --camnames 00 --epochs_num 40
    python train.py --dataset nuscenes --camnames fl_f_fr_bl_b_br --epochs_num 100
    python train.py --dataset synthetic        # smoke run, no data needed
"""

from __future__ import annotations

import logging

from agplace_tpu.config import parse_arguments
from agplace_tpu.utils.common import setup_logging


def build_datasets(cfg):
    if cfg.data.dataset == "kitti360":
        from agplace_tpu.data.kitti360 import KITTI360Dataset

        return (KITTI360Dataset(cfg, "train"), KITTI360Dataset(cfg, "test"))
    if cfg.data.dataset == "nuscenes":
        from agplace_tpu.data.nuscenes import NuScenesDataset

        return (NuScenesDataset(cfg, "train"), NuScenesDataset(cfg, "test"))
    if cfg.data.dataset == "synthetic":
        from agplace_tpu.data.synthetic import SyntheticDataset

        return (
            SyntheticDataset(n_db=64, n_q=64, image_size=cfg.data.q_resize,
                             nmap=cfg.data.nmap, seed=cfg.train.seed),
            SyntheticDataset(n_db=64, n_q=32, image_size=cfg.data.q_resize,
                             nmap=cfg.data.nmap, seed=cfg.train.seed + 1),
        )
    raise NotImplementedError(cfg.data.dataset)


def main() -> None:
    from agplace_tpu.parallel.bootstrap import initialize_distributed
    from agplace_tpu.utils.common import ResultsLogger

    initialize_distributed()  # no-op single-host; env/pod-driven otherwise
    cfg = parse_arguments()
    setup_logging(cfg.train.save_dir)
    log = logging.getLogger("main")
    log.info("config: %s", cfg)
    results = ResultsLogger(cfg.exp_name,
                            f"{cfg.train.save_dir}/results")

    train_ds, test_ds = build_datasets(cfg)
    log.info("train: %d queries / %d tiles; test: %d queries / %d tiles",
             train_ds.queries_num, train_ds.database_num,
             test_ds.queries_num, test_ds.database_num)

    from agplace_tpu.train.loop import train

    out = train(cfg, train_ds, test_ds, results_logger=results)
    best = out["best"]
    log.info("Best: R@1 = %.1f   R@5 = %.1f   R@10 = %.1f   epoch = %d",
             best[0], best[1], best[2], best[3])
    results.info(f"Best: R@1={best[0]:.1f} R@5={best[1]:.1f} "
                 f"R@10={best[2]:.1f} epoch={best[3]}")
    results.end()


if __name__ == "__main__":
    main()
