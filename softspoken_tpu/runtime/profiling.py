"""Device profiling hooks.

The reference's only perf instrumentation is wall-clock prints
(review_detections.py:97,171-172) and the live audio-sec/wall-sec label
(silencer_ui.py:152-158).  Here: the same counters live in
``runtime.metrics``, and this module adds first-class ``jax.profiler``
capture for device traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[str]:
    """Capture a jax.profiler trace around a block.

    with device_trace("/tmp/trace") as d: run_hot_path()
    """
    import jax

    log_dir = log_dir or os.environ.get("SOFTSPOKEN_TRACE_DIR", "/tmp/softspoken_trace")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Context manager marking a host-side stage in the profiler trace.

    Context-manager ONLY — jax.profiler.TraceAnnotation is not callable,
    so decorator use would raise TypeError (review r3); decorate functions
    with :func:`annotate_function` instead.
    """
    import jax

    return jax.profiler.TraceAnnotation(name)


def annotate_function(fn, name: str = None):
    """Decorator form: wraps ``fn`` in a profiler trace annotation."""
    import jax

    return jax.profiler.annotate_function(fn, name=name)
