"""Profiling helpers (SURVEY.md §5.1: the reference only logs per-component
wall times at debug level; here the stages carry ``jax.named_scope``
annotations and a trace context manager wraps the JAX profiler)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir="profile", host: bool = False):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir), create_perfetto_link=False):
        yield


@contextlib.contextmanager
def stage_timer(collect: dict, name: str):
    """Accumulate wall time per stage into ``collect`` (host-side; use around
    block boundaries, not inside jit)."""
    t0 = time.perf_counter()
    yield
    collect[name] = collect.get(name, 0.0) + time.perf_counter() - t0
