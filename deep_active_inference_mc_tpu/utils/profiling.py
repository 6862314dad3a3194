"""Tracing / profiling — the aux subsystem the reference lacks
(SURVEY.md §5: wall-clock prints only, train.py:99,189-194).

TPU-native equivalents:
  - ``trace(logdir)``: a ``jax.profiler`` trace context producing
    TensorBoard/XProf traces of the jitted train rounds;
  - ``Throughput``: rolling steps/sec + env-steps/sec counters (the
    BASELINE metrics) for the epoch console line;
  - ``annotate``: named trace spans around host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed block to ``logdir`` (no-op if None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Rolling throughput meter: call ``tick(n_items)`` per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = []  # (t, n)

    def tick(self, n_items: int = 1) -> None:
        self._events.append((time.perf_counter(), n_items))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        n = sum(n for _, n in self._events[1:])
        return n / dt if dt > 0 else 0.0


class StepTimer:
    """Phase timer for the epoch console line (data/train/eval splits)."""

    def __init__(self):
        self._t = {}
        self._start = {}

    def start(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def stop(self, name: str) -> None:
        self._t[name] = self._t.get(name, 0.0) + (
            time.perf_counter() - self._start.pop(name)
        )

    @contextlib.contextmanager
    def section(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def summary(self) -> str:
        return " ".join(f"{k}={v:.2f}s" for k, v in self._t.items())

    def reset(self) -> None:
        self._t.clear()
