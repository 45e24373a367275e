"""Timing + profiling harness.

TPU-native equivalent of the reference's PerfTimer (utils.py:518-552,
which pairs process_time with CUDA events + synchronize): wall/process
timers with explicit ``jax.block_until_ready`` on device work, and a
context-manager hook into ``jax.profiler`` traces for in-depth analysis
(SURVEY.md section 5 tracing plan).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


class PerfTimer:
    """check() returns (cpu_time, device_time) since the last reset,
    mirroring the reference API.  device_time blocks on ``sync`` targets
    passed to check()."""

    def __init__(self, activate: bool = True):
        self.activate = activate
        self.reset()

    def reset(self):
        self._cpu0 = time.process_time()
        self._wall0 = time.perf_counter()

    def check(self, sync: Any = None):
        if not self.activate:
            return 0.0, 0.0
        if sync is not None:
            jax.block_until_ready(sync)
        return (time.process_time() - self._cpu0,
                time.perf_counter() - self._wall0)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters: int = 20, warmup: int = 2, **kwargs) -> Dict:
    """Benchmark a jitted callable with proper device synchronization.

    Returns {'mean_ms', 'best_ms', 'iters'}.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {"mean_ms": 1e3 * sum(times) / len(times),
            "best_ms": 1e3 * min(times), "iters": iters}
