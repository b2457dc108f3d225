"""Tracing / profiling / debug utilities (SURVEY.md §5).

The reference has no profiling beyond cudnn.benchmark (train.py:166).  Here:
  - `trace(logdir)`: context manager around `jax.profiler.trace` producing
    TensorBoard-loadable device traces,
  - `StepTimer`: wall-clock step timing with warmup skip and frames/s,
  - `debug_nans(enable)`: toggles jax_debug_nans (functional race-free
    NaN detection; the TPU analog of a sanitizer pass),
  - `log_compile_time`: decorator reporting first-call (compile) latency.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device profile into `logdir` (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    """Enable jit-level NaN checking (re-runs un-jitted on detection)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Wall-clock step timer with warmup; reports mean/median step time and
    throughput.  Usage:

        timer = StepTimer(warmup=2)
        for batch in loader:
            with timer.step(batch_size):
                run_step(...)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self.samples: list[int] = []
        self._n = 0

    @contextlib.contextmanager
    def step(self, batch_size: int = 1) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
            self.samples.append(batch_size)

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def frames_per_s(self) -> float:
        total = sum(self.times)
        return sum(self.samples) / total if total > 0 else float("nan")

    def summary(self) -> str:
        if not self.times:
            return "StepTimer: no timed steps"
        st = sorted(self.times)
        med = st[len(st) // 2]
        return (
            f"steps={len(self.times)} mean={self.mean_step_s * 1e3:.1f}ms "
            f"median={med * 1e3:.1f}ms throughput={self.frames_per_s:.1f} frames/s"
        )
