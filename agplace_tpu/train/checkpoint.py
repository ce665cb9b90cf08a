"""Checkpoint / resume — orbax-backed (reference: torch.save dicts at
``/root/reference/util.py:24-62`` + ``train.py:377-386``, including the
best-model copy; the resume-unpack bug at train.py:237 is *not* replicated,
per SURVEY.md §7.5).

Saved payload mirrors the reference dict: step/epoch, both towers' params &
batch stats, optimizer state, recalls, best metric, not-improved counter.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from agplace_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def _restore_path(self, name: str) -> str:
        # an absolute path — or a path that exists as given (e.g. relative
        # to the CWD) — is restored as-is; bare names resolve inside this
        # run's save_dir (ADVICE r3: --resume accepts either).  Saves only
        # ever use _path: a stray same-named dir in the CWD must never
        # redirect a write.
        if os.path.isabs(name) or os.path.exists(name):
            return os.path.abspath(name)
        return self._path(name)

    def save(self, state: TrainState, epoch_num: int,
             recalls: Optional[np.ndarray], best_r5: float,
             not_improved_num: int, is_best: bool,
             filename: Optional[str] = None) -> str:
        if filename is not None:
            name = filename
        elif recalls is not None:
            name = f"ep@{epoch_num}__r1@{recalls[0]:.0f}"
        else:
            name = f"ep@{epoch_num}"
        payload = {
            "epoch_num": epoch_num,
            "state": state,
            "recalls": (np.asarray(recalls)
                        if recalls is not None else np.zeros(4)),
            "best_r5": float(best_r5),
            "not_improved_num": int(not_improved_num),
        }
        path = self._path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, payload)
        if is_best:  # best copied aside, as util.py:26-28
            best = self._path("best_model")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
        return path

    def restore(self, name: str, template_state: TrainState
                ) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore with a structure template (required for typed pytrees)."""
        payload = self._ckpt.restore(
            self._restore_path(name),
            item={
                "epoch_num": 0,
                "state": template_state,
                "recalls": np.zeros(4),
                "best_r5": 0.0,
                "not_improved_num": 0,
            },
        )
        meta = {k: payload[k] for k in
                ("epoch_num", "recalls", "best_r5", "not_improved_num")}
        return payload["state"], meta

    def latest(self) -> Optional[str]:
        cands = [d for d in os.listdir(self.save_dir)
                 if d.startswith("ep@")
                 and os.path.isdir(self._path(d))]
        if not cands:
            return None
        return max(cands, key=lambda d: int(d.split("@")[1].split("__")[0]))
