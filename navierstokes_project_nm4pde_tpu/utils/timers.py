"""Wall-clock timers with device synchronisation.

Replaces `dealii::Timer` usage around preconditioner init and solves
(ref: src/NavierStokes2D.cpp:543-561, src/main2D.cpp:24-37).  `Timer.stop`
blocks on outstanding device work so timings are honest; `PhaseTimers`
accumulates named phases the way the reference accumulates
time_prec/time_solve vectors (ref: include/NavierStokes2D.hpp:118-119).
For kernel-level timelines use `jax.profiler.trace` around a run.
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax


class Timer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self._t0 = None
        self.elapsed = 0.0

    def start(self):
        if self.sync:
            (jax.device_put(0.0) + 0).block_until_ready()
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        elif self.sync:
            (jax.device_put(0.0) + 0).block_until_ready()
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class PhaseTimers:
    def __init__(self):
        self.times = defaultdict(list)

    def record(self, phase: str, seconds: float):
        self.times[phase].append(seconds)

    def summary(self) -> dict:
        return {
            k: {"total": sum(v), "mean": sum(v) / len(v), "count": len(v)}
            for k, v in self.times.items()
            if v
        }
