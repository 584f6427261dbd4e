"""Tracing / profiling utilities.

The reference has only mmengine's IterTimerHook (SURVEY §5); this adds
what a production TPU deployment needs: `jax.profiler` trace capture
around training steps and a lightweight step timer with percentile
summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


def hard_sync(out):
    """Synchronise on a computation's COMPLETION, not its dispatch.

    On remote/async backends (axon tunneled TPU), `block_until_ready`
    can return once the output buffer handles exist, long before the
    step finishes — timings taken with it under-measure by 100x.  A
    device->host fetch of one element has a data dependency on the full
    computation and is a true barrier; the 4-byte transfer is noise.

    Synchronises on EVERY leaf (a composite fn's outputs may come from
    several separately-dispatched executables) with a SINGLE jitted
    probe + host fetch.  Anything per-leaf and eager would pay one
    tunnel round trip per leaf — a ~270-leaf gradient tree costs
    hundreds of ms of pure dispatch on the axon tunnel, swamping the
    timing (observed: an isolated backbone-grad phase "measured" 235 ms
    of which ~200 was per-leaf dispatch).  The probe compiles once per
    tree structure (jit cache) and dispatches once per call.

    Returns ``out`` unchanged (fetch side effect only).
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(_probe_fn()(leaves))
    return out


_PROBE = []


def _probe_fn():
    if not _PROBE:
        import jax.numpy as jnp

        _PROBE.append(jax.jit(lambda ls: sum(
            jnp.ravel(l)[0].astype(jnp.float32) for l in ls)))
    return _PROBE[0]


def timed(fn, *args, iters: int = 5, warmup: int = 2) -> float:
    """min-of-N wall time of ``fn(*args)`` with hard completion sync."""
    for _ in range(warmup):
        hard_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def dispatch_floor(iters: int = 5) -> float:
    """Measured dispatch+fetch floor of `timed` on this backend.

    On the axon tunneled TPU a trivial jitted add measures ~23 ms
    (round-trip latency), so every `timed` result carries that additive
    floor.  Subtract it when interpreting MICRO-benchmarks (a "28 ms"
    conv may be ~5 ms of compute); multi-hundred-ms step timings are
    barely affected.  Report it next to any microbenchmark numbers.
    """
    import jax.numpy as jnp

    a = jnp.ones((8, 8))
    return timed(jax.jit(lambda a: a + 1.0), a, iters=iters)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup skip and percentile summary."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "min_s": float(t.min()),
            "steps": len(self._times),
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats (bytes) where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
