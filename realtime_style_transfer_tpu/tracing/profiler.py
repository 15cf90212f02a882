"""Profiling hooks: jax.profiler traces + lightweight wall-clock timers.

TPU equivalent of the reference's ``tf.profiler.experimental.Profile`` usage
(``predict_video_using_checkpoint.py:90``) and Nsight PATH hacks
(``train_network.py:5-6``): ``trace(log_dir)`` captures a TensorBoard-viewable
profile; ``FrameTimer`` tracks per-frame latency percentiles as first-class metrics
(BASELINE.md requires p50 frame latency tracking).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if a log dir is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Collects per-frame wall-clock latencies and reports percentiles."""

    def __init__(self):
        self._latencies: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        assert self._t0 is not None, "start() not called"
        self._latencies.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def frame(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def percentiles(self) -> Dict[str, float]:
        if not self._latencies:
            return {}
        xs = sorted(self._latencies)
        def pick(q):
            return xs[min(len(xs) - 1, int(q * len(xs)))]
        return {
            "p50_ms": pick(0.50) * 1e3,
            "p90_ms": pick(0.90) * 1e3,
            "p99_ms": pick(0.99) * 1e3,
            "mean_ms": sum(xs) / len(xs) * 1e3,
            "frames": float(len(xs)),
        }
