"""Tracing/profiling helpers (SURVEY.md §5: the reference's tracing is
vestigial pprof imports; the TPU equivalent is jax.profiler + per-step
timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/goctr_trace") -> Iterator[None]:
    """Capture a Perfetto/XProf trace of the enclosed block:
        with profiling.trace("/tmp/t"):
            train_step(...)
    View with xprof / tensorboard-plugin-profile."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with jitter stats (the reference prints
    epoch wall times via cheggaaa/pb; this gives programmatic access)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def median(self) -> float:
        s = sorted(self.times)
        return s[len(s) // 2] if s else 0.0

    def summary(self) -> dict:
        if not self.times:
            return {}
        s = sorted(self.times)
        n = len(s)
        return {"n": n, "median_s": s[n // 2], "min_s": s[0], "max_s": s[-1],
                "total_s": sum(s)}


def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
