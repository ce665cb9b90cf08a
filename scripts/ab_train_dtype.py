"""Training-dtype A/B (VERDICT r3 item 6): run the synthetic e2e recipe
(tests/test_train.py::test_end_to_end_training_improves_recall) at
compute_dtype float32 vs bfloat16 across seeds and compare the loss /
recall trajectories.  The chip-side speed numbers already exist
(BASELINE.md: 48.1 ms/step bf16 vs 72.8 fp32); this script supplies the
QUALITY evidence for the recommended training dtype.

Usage::

    python scripts/ab_train_dtype.py [--seeds 3] [--epochs 7]

Prints one summary line per (dtype, seed) plus per-dtype aggregates.
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(dtype: str, seed: int, epochs: int):
    import jax

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.evaluate import evaluate
    from agplace_tpu.train.loop import train
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import init_state, make_infer_fns

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=128,
                           negs=2)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype=dtype),
            train=dataclasses.replace(
                cfg.train, epochs_num=epochs, queries_per_epoch=16,
                cache_refresh_rate=8, lr=1e-3, lrpc=1e-3, lrdb=1e-3,
                seed=seed, save_dir=tmp))
        train_ds = SyntheticDataset(n_db=24, n_q=16, image_size=32,
                                    seed=seed)
        test_ds = SyntheticDataset(n_db=24, n_q=12, image_size=32,
                                   seed=seed + 100)
        rng = np.random.default_rng(seed)
        miner = TripletMiner(cfg, train_ds)
        batch = collate_train(train_ds, miner.mine_random(rng, 2), cfg, rng)
        state0 = init_state(cfg, jax.random.PRNGKey(seed), batch)
        embed_q, embed_db = make_infer_fns(cfg)
        r0, _ = evaluate(cfg, test_ds, state0.params, state0.batch_stats,
                         embed_q, embed_db)
        out = train(cfg, train_ds, test_ds, state=state0)
    losses = [h["loss"] for h in out["history"]]
    return {
        "dtype": dtype, "seed": seed,
        "r1_untrained": float(r0[0]), "r5_untrained": float(r0[1]),
        "best_r1": float(max(h["recalls"][0] for h in out["history"])),
        "best_r5": float(max(h["recalls"][1] for h in out["history"])),
        "loss_first": float(losses[0]), "loss_last": float(losses[-1]),
        "loss_dropped": bool(losses[-1] < losses[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=7)
    args = ap.parse_args()

    rows = []
    for dtype in ("float32", "bfloat16"):
        for seed in range(args.seeds):
            r = run_one(dtype, seed, args.epochs)
            rows.append(r)
            print(json.dumps(r), flush=True)
    for dtype in ("float32", "bfloat16"):
        sub = [r for r in rows if r["dtype"] == dtype]
        print(json.dumps({
            "dtype": dtype, "summary": True,
            "mean_best_r1": round(np.mean([r["best_r1"] for r in sub]), 2),
            "mean_best_r5": round(np.mean([r["best_r5"] for r in sub]), 2),
            "mean_loss_last": round(
                np.mean([r["loss_last"] for r in sub]), 5),
            "all_losses_dropped": all(r["loss_dropped"] for r in sub),
        }), flush=True)


if __name__ == "__main__":
    main()
