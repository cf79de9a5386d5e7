"""Profiling hooks — the TPU upgrade of the reference's wall-clock
`steps_per_sec` (src/utils.py:138-146) and `print_gpu_memory_usage`
(res-vit/utils.py:487-555).

* `trace(logdir)` — context manager around `jax.profiler` for device traces
  viewable in TensorBoard/Perfetto.
* `StepTimer` — host-side steady-state step timing with compile-step
  exclusion (first N steps discarded), reporting images/sec and step-time
  percentiles.
* `annotate(name)` — `jax.profiler.TraceAnnotation` passthrough for marking
  host regions inside traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state throughput: discards the first `warmup` steps (compile),
    tracks per-step wall time."""

    def __init__(self, batch_size: int, warmup: int = 3):
        self.batch_size = batch_size
        self.warmup = warmup
        self._times: List[float] = []
        self._last: Optional[float] = None
        self._step = 0

    def tick(self) -> None:
        now = time.perf_counter()
        self._step += 1
        if self._last is not None and self._step > self.warmup:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def images_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

    def percentiles(self, qs=(50, 90, 99)) -> Dict[str, float]:
        if not self._times:
            return {f"p{q}": 0.0 for q in qs}
        s = sorted(self._times)
        return {f"p{q}": s[min(len(s) - 1, int(len(s) * q / 100))]
                for q in qs}

    def report(self) -> Dict[str, float]:
        return {"steps_per_sec": self.steps_per_sec,
                "images_per_sec": self.images_per_sec,
                **self.percentiles()}
