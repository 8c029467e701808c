"""Profiling hooks: jax.profiler trace + named scopes."""

from __future__ import annotations

import contextlib

import jax

__all__ = ["profile_trace"]


@contextlib.contextmanager
def profile_trace(log_dir: str = None):
    """Context manager: when ``log_dir`` is set, captures an XProf trace
    viewable in TensorBoard; otherwise a no-op."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
