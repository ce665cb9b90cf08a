#!/usr/bin/env python
"""One-command real-weight readiness smoke (RUNBOOK step 2.5).

Chains everything the first hardware+data session needs proven BEFORE
touching a real dataset: locate pretrained weights (the mount
``scripts/fetch_weights.py`` documents), convert + graft them into both
towers (``train/step.py:apply_pretrained_backbones``), embed the
synthetic fixture end to end (both towers, the full eval path of
``evaluate.py``), and print Recall@N — one JSON line on stdout.

With no weight source the script fails LOUDLY with the fetch
instructions (exit 2) so a mis-mounted ``$AGPLACE_WEIGHTS`` can't
silently produce a random-init "success"; ``--allow-random`` runs the
same chain from random init (the CI path, tests/test_entries.py).

Reference chain being smoke-tested: pretrained init
``network_mm/image_fe.py:19,33`` -> towers -> ``test.py:89`` eval.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None,
                    help="weights dir/file (else $AGPLACE_WEIGHTS & co)")
    ap.add_argument("--allow-random", action="store_true",
                    help="proceed with random init when no weights found")
    ap.add_argument("--archs", default="resnet18",
                    help="comma list of backbone archs that must resolve")
    args = ap.parse_args()

    # load_pretrained_backbone covers BOTH sources: a mounted weights dir
    # ($AGPLACE_WEIGHTS / --weights) and an importable torchvision zoo
    # with a populated cache
    from agplace_tpu.utils.torch_convert import load_pretrained_backbone

    archs = [a for a in args.archs.split(",") if a]
    missing = [a for a in archs
               if load_pretrained_backbone(a, args.weights) is None]
    if missing and not args.allow_random:
        print(
            f"bringup_smoke: NO pretrained weights found for "
            f"{','.join(missing)}.\n"
            f"  Searched: --weights, $AGPLACE_WEIGHTS, "
            f"~/.cache/agplace_tpu/weights, <repo>/weights.\n"
            f"  On an egress host run:  python scripts/fetch_weights.py "
            f"--out ~/agplace_weights --archs {','.join(missing)}\n"
            f"  then:  export AGPLACE_WEIGHTS=~/agplace_weights\n"
            f"  (or pass --allow-random to smoke the chain from random "
            f"init)",
            file=sys.stderr)
        return 2

    import dataclasses

    import jax
    import numpy as np

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.evaluate import evaluate
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import init_state, make_infer_fns

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=128,
                           negs=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       pretrained=not missing,
                                       pretrained_path=args.weights))
    test_ds = SyntheticDataset(n_db=24, n_q=12, image_size=32, seed=1)
    train_ds = SyntheticDataset(n_db=24, n_q=16, image_size=32, seed=0)

    rng = np.random.default_rng(0)
    batch = collate_train(train_ds, TripletMiner(cfg, train_ds).mine_random(
        rng, cfg.train.train_batch_size), cfg, rng)
    # init_state converts + grafts every pretrained backbone (loud
    # warning per missing arch) — the step under test
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    embed_q, embed_db = make_infer_fns(cfg)
    recalls, recalls_str = evaluate(cfg, test_ds, state.params,
                                    state.batch_stats, embed_q, embed_db)
    print(recalls_str, file=sys.stderr)
    print(json.dumps({
        "weights": "pretrained" if not missing else "random",
        "archs": archs,
        "recalls": [round(float(r), 2) for r in np.asarray(recalls)],
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
