"""Profiling/observability helpers — TPU-native additions with no reference
counterpart (SURVEY.md §5.1: the reference only prints wall-clock deltas).

- `profile_trace`: context manager around jax.profiler for TensorBoard traces;
- `StepTimer`: rolling rays/s + steps/s counters (the BASELINE north-star metric)
  that a training loop can print/log every `print_every`.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into `log_dir` (view with TensorBoard's
    profile plugin). No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter: call tick() once per step."""

    def __init__(self, rays_per_step: int, window: int = 100):
        self.rays_per_step = rays_per_step
        self.times: deque = deque(maxlen=window)
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def tick_many(self, n: int) -> None:
        """Record n steps completed since the last tick (scan-fused chunks run
        n steps per dispatch); each gets an equal share of the elapsed time."""
        now = time.perf_counter()
        if self._last is not None and n > 0:
            dt = (now - self._last) / n
            for _ in range(n):
                self.times.append(dt)
        self._last = now

    @property
    def steps_per_s(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def rays_per_s(self) -> float:
        return self.steps_per_s * self.rays_per_step

    def summary(self) -> str:
        return (f"{self.steps_per_s:.2f} steps/s, "
                f"{self.rays_per_s:,.0f} rays/s")
