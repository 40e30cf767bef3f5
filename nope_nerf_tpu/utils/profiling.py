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


def summarize_trace(log_dir: str, steps: int = 1, top: int = 20) -> list:
    """Per-op device-time table from a jax.profiler trace directory.

    Parses the newest `*.trace.json.gz` under `log_dir`, keeps device-process
    events, and attributes time to LEAF events (an event containing another
    event on the same thread is a wrapper, not work). Divide by `steps` to get
    per-step numbers when the traced region ran a scan of `steps` iterations.

    Returns [(ms_per_step, count_per_step, name), ...] sorted descending —
    print it, or feed it to a dashboard. This is how the train step's
    kernel-vs-glue split was measured on v5e (pallas custom-vjp calls appear as
    `jvp__*` / `transpose_jvp__*` regions).
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace files under {log_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)

    proc_names = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    events = [e for e in trace["traceEvents"]
              if e.get("ph") == "X" and any(
                  k in proc_names.get(e["pid"], "") for k in ("TPU", "GPU", "/device"))]

    by_thread = collections.defaultdict(list)
    for e in events:
        by_thread[(e["pid"], e["tid"])].append(e)
    leaf_time: collections.Counter = collections.Counter()
    leaf_count: collections.Counter = collections.Counter()
    for es in by_thread.values():
        es.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack: list = []
        def flush(e=None):
            while stack and (e is None or
                             stack[-1]["ts"] + stack[-1].get("dur", 0) <= e["ts"]):
                s = stack.pop()
                if s.get("_leaf", True):
                    leaf_time[s["name"]] += s.get("dur", 0)
                    leaf_count[s["name"]] += 1
        for e in es:
            flush(e)
            if stack:
                stack[-1]["_leaf"] = False
            stack.append(e)
        flush()

    rows = [(dur / steps / 1e3, leaf_count[name] / steps, name)
            for name, dur in leaf_time.most_common(top)]
    return rows
