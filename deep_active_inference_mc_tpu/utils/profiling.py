"""Tracing / profiling — the aux subsystem the reference lacks
(SURVEY.md §5: wall-clock prints only, train.py:99,189-194).

TPU-native equivalent: a ``jax.profiler`` trace context producing
TensorBoard/XProf traces of the jitted train rounds, wired to the trainer's
``--profile_dir`` flag. Throughput counters live inline in the epoch console
line (apps/train.py) and in ``bench.py``.
"""

from __future__ import annotations

import contextlib
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
