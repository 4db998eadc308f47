"""Device tracing hooks.

The reference's third profiling tier is driver-level tracing (per-launch
CSV + command-queue profiling, SURVEY §5); the TPU-native equivalent is
XLA's profiler (xprof/tensorboard traces). This module wraps it with the
same toggle ergonomics as ``toggle_profiling``.
"""

from __future__ import annotations

import contextlib
import os

import jax

from ..utils.log import Channel, log

__all__ = ["trace", "start_trace", "stop_trace", "annotate"]

_DEFAULT_DIR = os.environ.get("SORTX_TRACE_DIR", "/tmp/sortx_trace")


def start_trace(log_dir: str | None = None) -> str:
    """Begin an xprof trace (view with tensorboard/xprof)."""
    log_dir = log_dir or _DEFAULT_DIR
    jax.profiler.start_trace(log_dir)
    log(f"trace started -> {log_dir}", Channel.PERF)
    return log_dir


def stop_trace() -> None:
    jax.profiler.stop_trace()
    log("trace stopped", Channel.PERF)


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Context manager: trace everything inside."""
    d = start_trace(log_dir)
    try:
        yield d
    finally:
        stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
