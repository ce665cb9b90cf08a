"""Prefetcher tests: ordering, exceptions, bounded buffer."""

import time

import numpy as np
import pytest

from agplace_tpu.data.pipeline import Prefetcher


def test_preserves_order():
    out = list(Prefetcher(list(range(50)), lambda i: i * 2, num_workers=4))
    assert out == [i * 2 for i in range(50)]


def test_single_worker_path():
    out = list(Prefetcher([1, 2, 3], lambda i: i + 1, num_workers=1))
    assert out == [2, 3, 4]


def test_propagates_exceptions():
    def boom(i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        list(Prefetcher(list(range(6)), boom, num_workers=2))


def test_parallel_speedup_on_sleepy_work():
    def slow(i):
        time.sleep(0.05)
        return i

    t0 = time.time()
    out = list(Prefetcher(list(range(16)), slow, num_workers=8))
    dt = time.time() - t0
    assert out == list(range(16))
    assert dt < 16 * 0.05 * 0.7  # meaningfully faster than serial
