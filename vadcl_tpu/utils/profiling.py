"""Tracing / profiling — the aux subsystem the reference lacks (SURVEY §5.1:
its only latency tooling is tqdm postfix and an interactive loss plot).

* ``trace_steps`` — context manager capturing a jax.profiler trace (xplane)
  for a window of steps, viewable in TensorBoard/XProf;
* ``StepTimer`` — clips/sec/step-time counters with EMA smoothing, the
  north-star throughput metric surfaced during training.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_steps(logdir: str, enabled: bool = True) -> Iterator[None]:
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, clips_per_step: int, ema: float = 0.9):
        self.clips_per_step = clips_per_step
        self.ema = ema
        self._last: Optional[float] = None
        self.step_time: Optional[float] = None

    def tick(self) -> None:
        now = time.time()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt
                if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now

    @property
    def clips_per_sec(self) -> float:
        if not self.step_time:
            return 0.0
        return self.clips_per_step / self.step_time
