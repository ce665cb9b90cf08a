"""Host-side input pipeline: threaded prefetching of fixed-shape batches.

Replaces the reference's ``DataLoader(num_workers=8/16, pin_memory)`` worker
processes (``/root/reference/train.py:283-293``): collate work (PIL decode,
transforms, the C++ voxelizer) runs in a thread pool while the device
consumes previous batches; a small bounded queue gives double-buffering
(SURVEY.md §7.1 translation table).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np


class Prefetcher:
    """Iterate ``make_batch(item)`` over ``items`` with ``num_workers``
    threads, preserving order, keeping at most ``buffer_size`` ready batches.

    ``make_batch`` must be thread-safe (ours are: pure numpy/PIL + the
    GIL-releasing native voxelizer).
    """

    def __init__(self, items: Sequence, make_batch: Callable,
                 num_workers: int = 4, buffer_size: int = 4):
        self.items = list(items)
        self.make_batch = make_batch
        self.num_workers = max(1, num_workers)
        self.buffer_size = max(1, buffer_size)

    def __len__(self) -> int:
        return len(self.items)

    def __iter__(self) -> Iterator:
        if self.num_workers == 1:
            for it in self.items:
                yield self.make_batch(it)
            return

        results: dict = {}
        results_lock = threading.Condition()
        task_q: "queue.Queue" = queue.Queue()
        for idx, it in enumerate(self.items):
            task_q.put((idx, it))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    idx, it = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = self.make_batch(it)
                    err = None
                except Exception as e:  # propagate to consumer
                    batch, err = None, e
                with results_lock:
                    # bounded buffer: wait until the consumer catches up
                    while (not stop.is_set()
                           and idx - self._next > self.buffer_size):
                        results_lock.wait(timeout=0.1)
                    results[idx] = (batch, err)
                    results_lock.notify_all()

        self._next = 0
        workers = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for w in workers:
            w.start()
        try:
            for i in range(len(self.items)):
                with results_lock:
                    while i not in results:
                        results_lock.wait(timeout=0.1)
                    batch, err = results.pop(i)
                    self._next = i + 1
                    results_lock.notify_all()
                if err is not None:
                    raise err
                yield batch
        finally:
            stop.set()
            with results_lock:
                results_lock.notify_all()
            for w in workers:
                w.join(timeout=2.0)


def prefetch_to_device(iterator: Iterable, sharding=None, depth: int = 2):
    """Double-buffered host->device transfer: keep ``depth`` batches in
    flight on the device ahead of the consumer (the device_put_sharded
    pattern from SURVEY.md §2.5)."""
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            from agplace_tpu.parallel.mesh import shard_batch

            return shard_batch(sharding, batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if not isinstance(x, jax.Array)
            else x, batch)

    it = iter(iterator)
    for batch in it:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
