"""Profiling / tracing hooks.

The reference's only observability is the bench harness's synchronized
wall clock (bench/util.py:8-28, SURVEY.md §5). Here the same harness
(utils/benchmark.py) is complemented with free JAX profiler integration:
``trace(...)`` wraps a block in a ``jax.profiler`` trace whose output
loads in TensorBoard/Perfetto, and ``annotate`` marks named regions.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
  """Capture a device profile for the enclosed block."""
  jax.profiler.start_trace(log_dir,
                           create_perfetto_link=create_perfetto_link)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named trace region (shows up in the profile timeline)."""
  return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def stage_timer(stats: dict, name: str):
  """Accumulate host wall-clock per pipeline stage into ``stats``."""
  t0 = time.perf_counter()
  try:
    yield
  finally:
    stats[name] = stats.get(name, 0.0) + time.perf_counter() - t0
