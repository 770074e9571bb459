"""Profiler hooks: jax.profiler traces + the stage-timer print format.

Replaces the reference's ad-hoc wall-clock instrumentation
(SURVEY.md §5: time.perf_counter prints around every stage, per-frame
runtime npz) with proper XLA traces on top of the same stage-print
format (utils/timer.StageTimer).
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sam6d_tpu_trace", enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto.

    Usage:
        with profiling.trace("log/trace"):
            out = jitted_fn(...)
            jax.block_until_ready(out)
    """
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling host-side pipeline stages."""
    return jax.profiler.TraceAnnotation(name)
