"""Host->device input prefetching (the DataLoader-workers analog).

The reference overlaps input preparation with device compute through
torch DataLoader worker processes (ref: projects/NeRF-Det/configs/
mvsdet_res50_2x_low_res.py:83,107 ``num_workers``).  The functional JAX
equivalent is a single background staging thread: while the device runs
step i, the thread prepares batch i+1 (host decode / resize / view
sampling + ``jnp.asarray`` transfer enqueue), so step wall time
approaches max(compute, staging) instead of their sum.

One thread is enough — staging is dominated by the host->device copy
and numpy work, both of which release the GIL — and keeps batch order
deterministic (calls are serialised on the worker).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator


class Prefetcher:
    """Wrap a zero-arg batch producer with background prefetch.

    ``depth`` batches are kept in flight; each call returns the oldest
    staged batch and immediately schedules one more.  The producer is
    only ever invoked on the single worker thread, preserving iterator
    order and RNG sequencing.

    Note: one batch beyond the last consumed call is produced eagerly;
    producers backed by infinite iterators (the training pipelines) are
    unaffected, finite ones should be sized accordingly.
    """

    def __init__(self, producer: Callable, depth: int = 1):
        self._producer = producer
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending = [self._pool.submit(producer)
                         for _ in range(max(depth, 1))]

    def __call__(self):
        fut = self._pending.pop(0)
        self._pending.append(self._pool.submit(self._producer))
        return fut.result()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)


def prefetch_iterator(it: Iterable, depth: int = 1) -> Iterator:
    """Iterator version: yields ``it``'s items in order, staging
    ``depth`` ahead on a background thread; stops cleanly at
    StopIteration."""
    pool = ThreadPoolExecutor(max_workers=1)
    src = iter(it)
    sentinel = object()

    def pull():
        return next(src, sentinel)

    try:
        pending = [pool.submit(pull) for _ in range(max(depth, 1))]
        while True:
            item = pending.pop(0).result()
            if item is sentinel:
                break
            pending.append(pool.submit(pull))
            yield item
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
