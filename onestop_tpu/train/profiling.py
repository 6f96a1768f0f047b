"""Tracing / profiling / structured logging — subsystems the reference lacks
entirely (SURVEY.md §5.1/§5.5: its only instrumentation is one
``timeit.default_timer`` around the CV loop and Keras console logs).

- ``trace(logdir)``: context manager around ``jax.profiler`` for device
  traces viewable in TensorBoard/Perfetto.
- ``StepTimer``: per-epoch wall-clock collection.
- ``JsonlLogger``: one JSON line per epoch (metrics, lr, timing) — a
  machine-readable History.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


@contextlib.contextmanager
def trace(logdir: str | Path | None):
    """Device trace via jax.profiler when a logdir is given, no-op otherwise."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.t0 = None
        self.seconds: list[float] = []

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self.t0
        self.seconds.append(dt)
        return dt


class JsonlLogger:
    """Append-only epoch log; safe to tail while training."""

    def __init__(self, path: str | Path | None):
        self.path = Path(path) if path is not None else None
        if self.path is not None:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, record: dict):
        if self.path is None:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps({k: _clean(v) for k, v in record.items()}) + "\n")


def _clean(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return float(v)
