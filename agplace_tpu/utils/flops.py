"""FLOP / cost analysis — the reference stubbed this out entirely
(``util.get_flops`` returns None, ``/root/reference/util.py:15-21``).
JAX gives it for free through compiled-computation cost analysis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes-accessed / transcendentals of ``fn(*args)`` as XLA
    compiles it for the current backend."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older API returns a per-computation list
        costs = costs[0] if costs else {}
    return {
        "flops": float(costs.get("flops", -1.0)),
        "bytes_accessed": float(costs.get("bytes accessed", -1.0)),
        "transcendentals": float(costs.get("transcendentals", -1.0)),
    }


def get_flops(fn: Callable, *args, **kwargs) -> float:
    """Total FLOPs of one invocation (util.get_flops equivalent, unstubbed)."""
    return cost_analysis(fn, *args, **kwargs)["flops"]
