"""Profiling / tracing subsystem (new vs the reference, SURVEY.md §5.1).

- ``trace(logdir)``: context manager around jax.profiler for TensorBoard
  traces (xplane), usable around N train steps or a sampling run.
- ``StepTimer``: wall-clock step-time + throughput tracker with warmup
  skipping (first steps include compilation).

Enable in the CLIs with --profile_steps N --profile_dir DIR.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks post-warmup step times; reports steps/sec and samples/sec."""

    def __init__(self, warmup_steps: int = 2, batch_size: int = 1):
        self.warmup_steps = warmup_steps
        self.batch_size = batch_size
        self._count = 0
        self._t_last: Optional[float] = None
        self._total = 0.0
        self._timed_steps = 0
        self._min = float("inf")

    def step(self) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._count > self.warmup_steps and self._t_last is not None:
            dt = now - self._t_last
            self._total += dt
            self._timed_steps += 1
            self._min = min(self._min, dt)
        self._t_last = now

    def metrics(self) -> Dict[str, float]:
        if self._timed_steps == 0:
            return {}
        mean = self._total / self._timed_steps
        return {
            "perf/step_time_mean_s": mean,
            "perf/step_time_min_s": self._min,
            "perf/steps_per_sec": 1.0 / mean,
            "perf/samples_per_sec": self.batch_size / mean,
        }
