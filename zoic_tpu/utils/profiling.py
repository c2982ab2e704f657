"""Profiling helpers.

The reference has no profiler (SURVEY.md §5: the closest analog is its
_DRAW ray-dump).  The TPU-native equivalent is the standard JAX profiler;
these helpers wrap it for the common flows so traces land in one place and
can be opened with TensorBoard/Perfetto.

Timing caveat (PERF_NOTES "prof vs no-prof, explained"): on relay-attached
devices ``jax.block_until_ready`` does NOT fence remote execution — it can
mark large-array outputs ready while the program still sits in the relay's
FIFO, so per-call wall clocks bracketed by ``block_until_ready`` measure
dispatch, not execution.  ``time_fn`` therefore uses the same burst +
scalar-drain methodology as ``bench.py``: dispatch a burst of calls, then
force completion with ONE scalar readback whose value depends on the last
program's output (the relay executes dispatched programs FIFO, so draining
the last program drains the burst).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/zoic_trace") -> Iterator[None]:
    """Capture a device trace of the enclosed block::

        with zoic_tpu.utils.profiling.trace("/tmp/tr"):
            rays, stats = cam.create_rays(...)
            drain(rays.origin)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def drain(out) -> float:
    """Force completion of every program dispatched so far on the device.

    Reduces one output leaf to a scalar ON DEVICE and reads it back: the
    reduce program depends on the output buffer so it queues after the
    producing program, and a scalar readback is the one fence the axon
    relay honors (``jax.block_until_ready`` is not reliable there; see
    module docstring).  Returns the scalar so callers can consume it.
    """
    leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(out)
        if isinstance(leaf, jax.Array)
    ]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].ravel()[:1]))


def time_fn(fn, *args, iters: int = 5, warmup: int = 1, bursts: int = 3, **kw) -> dict:
    """Steady-state burst timing of a jitted callable.

    Dispatches ``iters`` back-to-back calls and drains with one scalar
    readback (see :func:`drain`); per-call seconds = burst wall time /
    ``iters``, reported over ``bursts`` bursts.  Do NOT replace this with
    per-call ``block_until_ready`` timing — that measured dispatch, not
    execution, on relay-attached devices (the round-2 bench bug).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    drain(out)
    per_call = []
    for _ in range(bursts):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kw)
        drain(out)
        per_call.append((time.perf_counter() - t0) / iters)
    per_call.sort()
    return {
        "min": per_call[0],
        "median": per_call[len(per_call) // 2],
        "mean": sum(per_call) / len(per_call),
        "iters": iters,
        "bursts": bursts,
    }
