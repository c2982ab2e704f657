"""Gap-decomposition harness: time raytraced_fused variants directly.

Re-measures PERF_NOTES' "Gap decomposition" table (floor / machinery
split) on the real chip with FIFO-drain burst timing.  Usage:

    python tools/gapbench.py [--batch 4194304] [--inner 16] \
        [--variants floor,floor-lut0,uncompacted,compacted,precheck]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import zoic_tpu as zt
from zoic_tpu.ops import trace_kernel


def measure(state, n, inner, *, max_tries, compact, use_lut, use_profile,
            tile_rows=128, iters=3, bursts=3, era3_h=8, era3_rounds=1,
            precheck_draws=4, dead_heavy=None, era3_far_every=1,
            bulk_draws=0, skip_era1=False, dual_h=0, round0_draws=0):
    lens = state.lens
    u = jax.random.uniform(jax.random.PRNGKey(0), (4, n), dtype=jnp.float32)
    side = int(n ** 0.5)
    ys = (jnp.arange(side, dtype=jnp.float32) + 0.5) / side * 2 - 1
    sx = jnp.tile(ys, n // side)
    sy = jnp.repeat(ys, n // side)

    @jax.jit
    def step(seed):
        def body(i, acc):
            o, d, t, tir = trace_kernel.raytraced_fused(
                lens, sx, sy, u[2], u[3], state.sensor_width,
                seed + i, max_tries=max_tries, compact=compact,
                use_lut=use_lut, use_profile=use_profile,
                tile_rows=tile_rows, era3_h=era3_h,
                era3_rounds=era3_rounds, precheck_draws=precheck_draws,
                dead_heavy=dead_heavy, era3_far_every=era3_far_every,
                bulk_draws=bulk_draws, skip_era1=skip_era1, dual_h=dual_h,
                round0_draws=round0_draws,
            )
            return acc + jnp.sum(d[:, 0]) + jnp.sum(t.astype(jnp.float32))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    out = step(jnp.int32(1))
    float(out)  # compile + drain
    rates = []
    for b in range(bursts):
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(jnp.int32(100 * b + i))
        float(out)
        rates.append(inner * n * iters / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


VARIANTS = {
    # name: (max_tries, compact, use_lut, use_profile)
    "floor": (0, False, True, False),
    "floor-naive": (0, False, False, False),
    # floor + profile planes + the round-0 pre-check chain: the marginal
    # vs "floor" is the per-ray cost of the profile select chain + one
    # k-draw pre-check scan (isolates the shaping-table lever, VERDICT r3 #6)
    "floor-prof": (0, False, True, True),
    "uncompacted": (25, False, True, False),
    "compacted": (25, True, True, False),
    "precheck": (25, True, True, True),
    "precheck-uncompacted": (25, False, True, True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 22)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--variants", type=str,
                    default="floor,compacted,precheck")
    ap.add_argument("--sweep", type=str, default="",
                    help="schedule sweep: comma list of era3h/era3r/K "
                         "triples, e.g. 8/1/4,16/1/4,8/1/6,8/2/4 — runs "
                         "the 'precheck' variant with each")
    ap.add_argument("--lens", type=str, default="double_gauss_f2.0")
    ap.add_argument("--focal", type=float, default=5.0)
    ap.add_argument("--fstop", type=float, default=2.0)
    ap.add_argument("--focus", type=float, default=100.0)
    ap.add_argument("--dead-heavy", type=str, default="auto",
                    choices=("auto", "on", "off"),
                    help="override the lens.dead_frac>=0.3 regime pick")
    args = ap.parse_args()

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path(args.lens),
        focal_length=args.focal, fstop=args.fstop,
        focal_distance=args.focus,
        kolb_sampling_lut=True,
    )
    dead_heavy = {"auto": None, "on": True, "off": False}[args.dead_heavy]
    state = zt.compile_camera(cfg)
    out = {}
    if args.sweep:
        for spec in args.sweep.split(","):
            parts = [int(x) for x in spec.split("/")]
            h, rr, k = parts[:3]
            far = parts[3] if len(parts) > 3 else 1
            bulk = parts[4] if len(parts) > 4 else 0
            skip1 = bool(parts[5]) if len(parts) > 5 else False
            dualh = parts[6] if len(parts) > 6 else 0
            r0k = parts[7] if len(parts) > 7 else 0
            r = measure(
                state, args.batch, args.inner, max_tries=25, compact=True,
                use_lut=True, use_profile=True, tile_rows=args.tile,
                era3_h=h, era3_rounds=rr, precheck_draws=k,
                dead_heavy=dead_heavy, era3_far_every=far,
                bulk_draws=bulk, skip_era1=skip1, dual_h=dualh,
                round0_draws=r0k,
            )
            out[spec] = r
            print(f"  era3h={h:3d} rounds={rr} K={k} far={far} bulk={bulk}"
                  f" skip1={int(skip1)} dualh={dualh} r0k={r0k}"
                  f"  {r/1e6:8.1f} M rays/s",
                  file=sys.stderr)
    else:
        for name in args.variants.split(","):
            mt, comp, lut, prof = VARIANTS[name]
            r = measure(
                state, args.batch, args.inner, max_tries=mt, compact=comp,
                use_lut=lut, use_profile=prof, tile_rows=args.tile,
                dead_heavy=dead_heavy,
            )
            out[name] = r
            print(f"  {name:22s} {r/1e6:8.1f} M rays/s "
                  f"({1e9/r:.3f} ms/M)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
