"""Profiling helpers.

The reference has no profiler (SURVEY.md §5: the closest analog is its
_DRAW ray-dump).  The TPU-native equivalent is the standard JAX profiler;
these helpers wrap it for the common flows so traces land in one place and
can be opened with TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/zoic_trace") -> Iterator[None]:
    """Capture a device trace of the enclosed block::

        with zoic_tpu.utils.profiling.trace("/tmp/tr"):
            rays, stats = cam.create_rays(...)
            jax.block_until_ready(rays.origin)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 5, warmup: int = 1, **kw) -> dict:
    """Steady-state timing of a jitted callable: returns min/median/mean
    seconds over ``iters`` runs after ``warmup`` (results blocked)."""
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "min": times[0],
        "median": times[len(times) // 2],
        "mean": sum(times) / len(times),
        "iters": iters,
    }
