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


class StageProfiler:
    """Per-frame, per-stage wall-clock breakdown for the SLAM loop.

    Each frame accumulates named stage durations; ``summary()`` reports
    per-stage median / mean / p90 over frames.  The MEDIAN is the
    compile-excluded steady-state number: XLA compiles hit only the
    first frame of each (shape, executable) class, so they appear as a
    handful of outlier frames that the median ignores while the mean
    exposes.  Used by slam.System (cfg system.profile: true) to explain
    ms/frame by its parts (track / map / sync / host sampling).
    """

    def __init__(self):
        self.frames = []
        self._cur: Optional[Dict] = None

    def start_frame(self, frame: int):
        self._cur = {"frame": frame}

    def add(self, name: str, dt: float):
        if self._cur is not None:
            self._cur[name] = self._cur.get(name, 0.0) + dt

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        if self._cur is None:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync() if callable(sync) else sync)
            self.add(name, time.perf_counter() - t0)

    def mark(self, name: str):
        if self._cur is not None:
            self._cur[name] = True

    def end_frame(self):
        if self._cur is not None:
            self.frames.append(self._cur)
            self._cur = None

    def summary(self) -> Dict:
        import numpy as np

        keys = set()
        for f in self.frames:
            keys.update(k for k, v in f.items()
                        if k != "frame" and isinstance(v, float))
        out: Dict = {"n_frames": len(self.frames)}
        totals = []
        for f in self.frames:
            totals.append(sum(v for k, v in f.items()
                              if k != "frame" and isinstance(v, float)
                              and not k.endswith("_sample")))
        if totals:
            out["frame_ms"] = {
                "median": 1e3 * float(np.median(totals)),
                "mean": 1e3 * float(np.mean(totals)),
                "p90": 1e3 * float(np.percentile(totals, 90))}
        for k in sorted(keys):
            vals = np.asarray([f.get(k, 0.0) for f in self.frames])
            out[k + "_ms"] = {"median": 1e3 * float(np.median(vals)),
                              "mean": 1e3 * float(np.mean(vals)),
                              "p90": 1e3 * float(np.percentile(vals, 90))}
        return out


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
