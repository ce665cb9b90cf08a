"""Determinism, logging, and observability utilities.

Reference equivalents: ``commons.make_deterministic/setup_logging``
(``/root/reference/commons.py:17-77``) and the bespoke ``logging_info`` text
sinks (``tools/options.py:385-419``).  JAX is deterministic by construction
given a PRNG key, so "make_deterministic" reduces to key management; logging
is stdlib + a structured JSONL metrics stream (the reference had only .txt).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def make_rngs(seed: int, *names: str):
    """Split a seed into named PRNG keys (the JAX determinism story;
    replaces torch/np/cuda seeding at commons.py:17-28)."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, max(len(names), 1))
    return dict(zip(names, keys))


def setup_logging(save_dir: str, console_level: str = "INFO") -> None:
    """Root logger -> {save_dir}/info.log + debug.log + console, with
    excepthook routed to the log (commons.py:31-77)."""
    os.makedirs(save_dir, exist_ok=True)
    base_fmt = logging.Formatter("%(asctime)s   %(message)s", "%Y-%m-%d %H:%M:%S")
    logger = logging.getLogger()
    logger.handlers = []
    logger.setLevel(logging.DEBUG)

    info_h = logging.FileHandler(os.path.join(save_dir, "info.log"))
    info_h.setLevel(logging.INFO)
    info_h.setFormatter(base_fmt)
    logger.addHandler(info_h)

    debug_h = logging.FileHandler(os.path.join(save_dir, "debug.log"))
    debug_h.setLevel(logging.DEBUG)
    debug_h.setFormatter(base_fmt)
    logger.addHandler(debug_h)

    console = logging.StreamHandler()
    console.setLevel(getattr(logging, console_level))
    console.setFormatter(base_fmt)
    logger.addHandler(console)

    def exception_handler(type_, value, tb):
        logger.info("\n" + "".join(__import__("traceback").format_exception(
            type_, value, tb)))
    sys.excepthook = exception_handler


class MetricsWriter:
    """Structured metrics: one JSON object per line, append-only.
    Replaces the results/{exp}.txt free-text sink (tools/options.py:385-407)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def write(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=_json_default) + "\n")


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, (np.ndarray, jax.Array)):
        return np.asarray(o).tolist()
    return str(o)


class PhaseTimer:
    """Per-phase wall-clock timers (the reference logged only epoch time,
    train.py:391).  Use as ``with timer('mining'): ...``; read ``.totals``."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._stack: list = []  # (name, t0) — reentrant for nested phases

    def __call__(self, name: str):
        self._stack.append((name, None))
        return self

    def __enter__(self):
        name, _ = self._stack[-1]
        self._stack[-1] = (name, time.perf_counter())
        return self

    def __exit__(self, *exc):
        name, t0 = self._stack.pop()
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        return False


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def start_profiler_trace(logdir: str) -> None:
    """jax.profiler trace hook (SURVEY.md §5.1: reference has none)."""
    jax.profiler.start_trace(logdir)


def stop_profiler_trace() -> None:
    jax.profiler.stop_trace()


class ResultsLogger:
    """The reference's bespoke results-file system
    (``tools/options.py:385-419``): per-experiment ``results/{exp_name}.txt``
    plus a global ``results.txt`` aggregating across experiments, each opened
    with a timestamp header and closed with a timestamp footer."""

    def __init__(self, exp_name: str, results_dir: str = "results"):
        import datetime
        import os

        self.exp_name = exp_name
        os.makedirs(results_dir, exist_ok=True)
        self.exp_path = os.path.join(results_dir, f"{exp_name}.txt")
        self.global_path = os.path.join(
            os.path.dirname(results_dir) or ".", "results.txt")
        self._stamp = lambda: datetime.datetime.now().strftime(
            "%Y-%m-%d %H:%M:%S")
        for path, mode in ((self.exp_path, "w"), (self.global_path, "a")):
            with open(path, mode) as f:
                f.write(f"{self._stamp()}\n{exp_name}\n")

    def info(self, message: str) -> None:
        for path in (self.exp_path, self.global_path):
            with open(path, "a") as f:
                f.write(message + "\n")

    def end(self) -> None:
        for path in (self.exp_path, self.global_path):
            with open(path, "a") as f:
                f.write(f"\n{self._stamp()}\n")
