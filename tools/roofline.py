"""VPU roofline micro-benchmark for the trace-kernel op mix (v5e).

Measures the achievable per-element issue rate of each op class the fused
trace kernel actually uses (PERF_NOTES "Attempt micro-optimization":
without a measured peak, "0.63 effective Tops" can't be split into
op-count waste vs issue-rate waste — VERDICT r2 #1a).

Each case runs a loop-carried chain of K ops per element over a
(TILE, 128) f32 tile inside one Pallas kernel, R chain steps per grid
step, G grid steps — the same shape regime as the trace kernel (128-row
tiles, 16 (8,128) vregs of ILP per jnp op).  The loop-carried dependency
prevents folding; independent per-vreg streams give the hardware the same
ILP the real kernel has.  Reported number = element-ops/sec.

Usage: python tools/roofline.py [--tile 128] [--grid 512] [--reps 512]
Prints one JSON line per case plus a summary table to stderr.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _chain(name):
    """Return (ops_per_iter, body) where body: (x, a, b) -> x advances the
    loop-carried chain by one iteration using only ops of this class."""
    if name == "fma":
        # x = x * a + b   — one fused multiply-add
        return 1, lambda x, a, b: x * a + b
    if name == "mul":
        return 1, lambda x, a, b: x * a
    if name == "add":
        return 1, lambda x, a, b: x + a
    if name == "sqrt":
        # sqrt then add keeps the value in a stable range (~fixpoint of
        # sqrt(x)+0.5 is ~1.6) and carries the dependency
        return 2, lambda x, a, b: jnp.sqrt(x) + a
    if name == "rsqrt":
        return 2, lambda x, a, b: jax.lax.rsqrt(x) + a
    if name == "div":
        return 2, lambda x, a, b: b / x + a
    if name == "recip":
        return 2, lambda x, a, b: pl.reciprocal(x) + a
    if name == "abs":
        return 2, lambda x, a, b: jnp.abs(x) + a  # abs then add
    if name == "select":
        # compare + select + add: 3 element-ops per iter
        return 3, lambda x, a, b: jnp.where(x > a, x, b) + a
    if name == "min":
        return 2, lambda x, a, b: jnp.minimum(x, a) + b
    if name == "floor":
        return 2, lambda x, a, b: jnp.floor(x) + a
    if name == "i32mix":
        # integer multiply + xor-shift (the _hash_uniform op mix): 3 ops
        def body(x, a, b):
            h = x * jnp.int32(-1975592817)  # 0x85EBCA6B as i32
            return h ^ (h >> 13)

        return 3, body
    if name == "f2i":
        # f32<->i32 conversions (2 per iter) as used by the hash epilogue
        def body(x, a, b):
            return x.astype(jnp.int32).astype(jnp.float32) + a

        return 3, body
    raise ValueError(name)


def _make_kernel(name, reps, n_streams):
    k_ops, body = _chain(name)
    integer = name == "i32mix"

    def kernel(x_ref, out_ref):
        a = jnp.float32(0.5) if not integer else jnp.int32(0)
        b = jnp.float32(1.25) if not integer else jnp.int32(0)
        xs = [x_ref[i] for i in range(n_streams)]

        def step(i, xs):
            # n_streams independent chains: models the ILP the unrolled
            # element loop has across vregs/temporaries
            return tuple(body(x, a, b) for x in xs)

        xs = jax.lax.fori_loop(0, reps, step, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x if not integer else acc ^ x
        out_ref[:] = acc

    return kernel, k_ops


def measure(name, tile=128, grid=512, reps=512, n_streams=4, iters=5):
    integer = name == "i32mix"
    dtype = jnp.int32 if integer else jnp.float32
    kernel, k_ops = _make_kernel(name, reps, n_streams)
    x = jnp.full((n_streams, tile, LANES), 3 if integer else 1.234, dtype)

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (n_streams, tile, LANES), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid * tile, LANES), dtype),
    )
    # Timing on the axon relay: block_until_ready does NOT fence remote
    # execution (programs "complete" in ~0.04 ms); the device runs programs
    # FIFO, so the only reliable fence is a host readback of the LAST
    # program's output.  Time a burst of dispatches drained by one final
    # float() and divide; per-launch overhead (~25 ms) is amortized by
    # sizing reps so each launch runs >~100 ms.
    fn = jax.jit(lambda v: call(v).sum())
    out = fn(x)
    float(out)  # warm compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(out)  # drains the FIFO
    t = (time.perf_counter() - t0) / iters
    elem_ops = n_streams * tile * LANES * reps * k_ops * grid
    return elem_ops / t, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--reps", type=int, default=512)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--cases", type=str, default="")
    args = ap.parse_args()

    cases = args.cases.split(",") if args.cases else [
        "fma", "mul", "add", "sqrt", "rsqrt", "div", "recip", "abs",
        "select", "min", "floor", "i32mix", "f2i",
    ]
    results = {}
    for name in cases:
        tops, t = measure(
            name, tile=args.tile, grid=args.grid, reps=args.reps,
            n_streams=args.streams,
        )
        results[name] = tops
        print(f"  {name:8s} {tops / 1e12:7.3f} Top/s  ({t * 1e3:.2f} ms)",
              file=sys.stderr)
    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
