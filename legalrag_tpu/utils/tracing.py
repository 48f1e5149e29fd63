"""Profiling / tracing hooks.

The reference's observability is a per-stage ms log line (SURVEY.md §5.1),
which this framework keeps; on top, these hooks integrate the JAX profiler:
``trace_span`` annotates host+device timelines (visible in
TensorBoard/Perfetto), and ``profile_session`` captures a trace directory
around a code region. Used by the hybrid retriever stages and available to
operators via ``LEGALRAG_TRACE_DIR``.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_session(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a profiler trace around a region when a log dir is set
    (arg or ``LEGALRAG_TRACE_DIR``); no-op otherwise."""
    logdir = logdir or os.environ.get("LEGALRAG_TRACE_DIR")
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
