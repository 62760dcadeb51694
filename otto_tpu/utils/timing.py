"""Profiling / timing harness.

The reference's observability is manual time.time() prints and hard-coded
ETA messages (reference: model/count_co_events.py:199-229,
model/w2vec_aids.py:149-154, SURVEY.md §5.1). Here: an HONEST device
timing harness with warmup (compile) separation, plus jax.profiler trace
capture for roofline work.

IMPORTANT: jax.block_until_ready is NOT a reliable sync on tunneled
runtimes (measured on the axon v5e tunnel: it returns immediately while
the device queue keeps draining — a 6 ms matmul "blocked" in 0.1 ms).
The only honest sync is a host fetch of a value that depends on the
output; `device_sync` below reduces the output pytree through one cached
jitted checksum and pulls the scalar. The ~23 ms tunnel round-trip this
costs is measured once by `sync_overhead` and subtracted by time_fn.
"""
from __future__ import annotations

import contextlib
import dataclasses
import functools
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as _np


@functools.cache
def _checksum_fn():
    import jax.numpy as jnp

    return jax.jit(
        lambda t: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t)
        )
    )


def device_sync(out) -> float:
    """Force REAL completion of `out` (and, on an in-order device queue,
    everything enqueued before it) via a dependent-scalar host fetch."""
    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return 0.0
    return float(_np.asarray(_checksum_fn()(out)))


@functools.cache
def sync_overhead(samples: int = 5) -> float:
    """Measured cost of one device_sync round-trip (tunnel latency)."""
    import jax.numpy as jnp

    x = jnp.zeros((4, 4))
    device_sync(x)
    t0 = time.perf_counter()
    for _ in range(samples):
        device_sync(x)
    return (time.perf_counter() - t0) / samples


@dataclasses.dataclass
class TimingResult:
    name: str
    compile_s: float
    mean_s: float
    std_s: float
    runs: List[float]

    @property
    def per_second(self) -> float:
        return 1.0 / self.mean_s if self.mean_s > 0 else float("inf")

    def items_per_second(self, items: int) -> float:
        return items / self.mean_s if self.mean_s > 0 else float("inf")


def time_fn(
    name: str,
    fn: Callable,
    *args,
    iters: int = 5,
    warmup: int = 1,
    **kwargs,
) -> TimingResult:
    """Time a device function: first call(s) measure compile+run, the rest
    steady state. Completion is forced by device_sync (an honest
    dependent-scalar fetch — block_until_ready does not wait on tunneled
    runtimes); the measured tunnel round-trip is subtracted."""
    base = sync_overhead()
    t0 = time.perf_counter()
    device_sync(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        device_sync(fn(*args, **kwargs))
    runs = []
    for _ in range(iters):
        t = time.perf_counter()
        device_sync(fn(*args, **kwargs))
        runs.append(max(time.perf_counter() - t - base, 0.0))
    mean = sum(runs) / len(runs)
    std = (sum((r - mean) ** 2 for r in runs) / len(runs)) ** 0.5
    return TimingResult(name, compile_s, mean, std, runs)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named stage wall-clock times (the structured version of
    the reference's scattered log lines)."""

    def __init__(self):
        self.stages: Dict[str, float] = {}
        self._start: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{name}: {s:.2f}s ({s / total * 100:.0f}%)"
                 for name, s in sorted(self.stages.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines + [f"total: {total:.2f}s"])
