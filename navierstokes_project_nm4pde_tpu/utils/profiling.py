"""Profiling helpers: jax.profiler trace capture around solver phases.

The reference's telemetry is wall-clock timers around preconditioner init
and GMRES solves (ref: src/NavierStokes2D.cpp:543-561).  Device-level
timelines here come from XLA's profiler; wrap any region with
`trace("outdir")` and inspect with TensorBoard/xprof."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for a code region (shows up in the timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
