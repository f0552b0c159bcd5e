"""Profiling hooks (SURVEY.md §5: the reference has none beyond tqdm; the
TPU build adds jax.profiler traces + step-time meters).

Usage:
    with trace("/tmp/bdvc_trace"):        # view in TensorBoard / xprof
        run_steps()

    with step_timer() as t:
        ...
    print(t.elapsed)
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """jax.profiler trace around a region; writes an xplane/TensorBoard dump."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _Timer:
    def __init__(self):
        self.elapsed = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def step_timer() -> _Timer:
    return _Timer()


def annotate(name: str):
    """TraceAnnotation for named regions inside jitted host loops."""
    return jax.profiler.TraceAnnotation(name)
