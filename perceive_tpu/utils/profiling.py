"""Device-side profiling hooks.

The reference wired no tracer at all (SURVEY.md §5.1: the `tracing` crate was
a dead dependency); its only instrumentation was the host-side TimeTracker.
We keep TimeTracker for host stages and add the TPU-native piece: JAX
profiler traces (XPlane, viewable in TensorBoard/Perfetto) around any block.

Enable globally with PERCEIVE_TPU_TRACE_DIR=/path — every ``trace("name")``
block then records a device trace; without the env var the context manager
is free.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

TRACE_ENV = "PERCEIVE_TPU_TRACE_DIR"


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """Record a JAX profiler trace of the block when tracing is enabled."""
    target = trace_dir or os.environ.get(TRACE_ENV)
    if not target:
        yield
        return
    import jax

    path = os.path.join(target, f"{name}-{int(time.time() * 1000)}")
    with jax.profiler.trace(path):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace (shows up on the TraceMe track)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
