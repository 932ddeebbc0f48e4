"""Profiling and throughput observability.

The reference has only ad-hoc wall-clock timing (synthesizer.py:58-68,
train.py:203-216). Here:

  * :func:`trace` wraps ``jax.profiler`` capture — traces open in
    TensorBoard/XProf and show per-op device time; the train CLI exposes
    it as ``--profile-dir``;
  * :class:`StepTimer` aggregates step durations into the BASELINE-metric
    shapes (training samples/sec, synthesis audio-seconds/sec/chip) with
    warmup exclusion — a library utility for benchmark harnesses
    (bench scripts keep their own inline timing; the train loop logs a
    running per-step average itself).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[Path]):
  """jax.profiler trace context; no-op when logdir is None."""
  if logdir is None:
    yield
    return
  import jax
  logdir = Path(logdir)
  logdir.mkdir(parents=True, exist_ok=True)
  jax.profiler.start_trace(str(logdir))
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTimer:
  """Accumulates step durations and reports throughput statistics."""

  def __init__(self, warmup_steps: int = 1):
    self.warmup_steps = warmup_steps
    self._durations = []
    self._count = 0
    self._last: Optional[float] = None

  def start(self) -> None:
    self._last = time.perf_counter()

  def stop(self) -> float:
    assert self._last is not None, "start() not called"
    duration = time.perf_counter() - self._last
    self._count += 1
    if self._count > self.warmup_steps:
      self._durations.append(duration)
    self._last = None
    return duration

  @contextlib.contextmanager
  def step(self):
    self.start()
    yield
    self.stop()

  @property
  def mean_duration_s(self) -> float:
    return float(np.mean(self._durations)) if self._durations else float("nan")

  def throughput(self, units_per_step: float) -> float:
    """units/sec given a fixed per-step workload (samples, audio-seconds...)."""
    mean = self.mean_duration_s
    return units_per_step / mean if mean and np.isfinite(mean) else float("nan")

  def report(self, units_per_step: float, unit: str) -> Dict:
    return {
        "steps_measured": len(self._durations),
        "mean_step_seconds": round(self.mean_duration_s, 6),
        "throughput": round(self.throughput(units_per_step), 3),
        "unit": unit,
    }
