"""Tracing / profiling.

The reference's only timing was wall-clock deltas returned as
``processing_time`` plus per-stage logs (SURVEY.md §5.1). This module keeps
that contract and adds:

* ``StageTimer`` — named per-stage wall times for one request, cheap enough
  to always run; the API returns the same ``processing_time`` fields and
  exposes aggregate p50/p95 through ``/stats``-style snapshots.
* ``device_trace`` — context manager around ``jax.profiler`` emitting an
  XPlane trace viewable in TensorBoard/xprof, for kernel-level analysis on
  TPU.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional


class StageTimer:
    """Collects named stage durations for a single request."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}
        self._start = time.time()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    @property
    def total(self) -> float:
        return time.time() - self._start

    def snapshot(self) -> Dict[str, float]:
        return {name: round(t, 4) for name, t in self.stages.items()}


class LatencyAggregator:
    """Rolling per-stage latency percentiles (the QPS/p50 counters the
    rebuild adds for the north-star metric, SURVEY.md §5.5)."""

    def __init__(self, window: int = 512) -> None:
        self._samples: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=window)
        )
        self._counts: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    def record(self, stage: str, seconds: float) -> None:
        with self._lock:
            self._samples[stage].append(seconds)
            self._counts[stage] += 1

    def record_timer(self, timer: StageTimer, prefix: str = "") -> None:
        for name, seconds in timer.stages.items():
            self.record(prefix + name, seconds)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        with self._lock:
            for stage, samples in self._samples.items():
                if not samples:
                    continue
                ordered = sorted(samples)
                n = len(ordered)
                out[stage] = {
                    "count": self._counts[stage],
                    "p50_ms": round(ordered[n // 2] * 1e3, 2),
                    "p95_ms": round(ordered[min(n - 1, int(n * 0.95))] * 1e3, 2),
                    "mean_ms": round(sum(ordered) / n * 1e3, 2),
                }
        return out


# Process-wide aggregator used by the serving path.
aggregator = LatencyAggregator()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace (TensorBoard/xprof-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_active_trace: Optional[str] = None


def start_trace(log_dir: str) -> bool:
    """Idempotent start for the HTTP-triggered profile endpoint."""
    global _active_trace
    if _active_trace is not None:
        return False
    import jax

    jax.profiler.start_trace(log_dir)
    _active_trace = log_dir
    return True


def stop_trace() -> Optional[str]:
    global _active_trace
    if _active_trace is None:
        return None
    import jax

    jax.profiler.stop_trace()
    out, _active_trace = _active_trace, None
    return out
