"""Benchmark: camera rays/sec/chip on the BASELINE.json north-star config.

Raytraced Double-Gauss f/2.0 with exit-pupil LUT sampling.  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
value / 1e9 (the >=1e9 rays/sec/chip target — the C++ reference publishes no
numbers of its own; see BASELINE.md).

Methodology: the per-launch host round-trip on remote-attached TPUs is
~25ms, so a timed step runs ``inner`` whole-batch ray generations inside one
jitted program (a renderer would batch the same way) and throughput is
(inner * batch) / median step time.  Samples are generated in image-raster
order (sy-major), the order a renderer's bucketed sampler produces.
"""

import argparse
import json
import os
import socket
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _await_relay(max_wait_s: float) -> None:
    """Fail fast (or wait boundedly) when the axon relay tunnel is down.

    jax device init otherwise hangs SILENTLY with ~0 CPU when the
    loopback relay endpoints (127.0.0.1:8082/:8083, injected from
    outside the container) refuse connections — a wedged/torn-down
    tunnel looked exactly like a slow compile until r3.  A refused TCP
    connect is a crisp, side-effect-free probe."""
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "axon"):
        return  # explicit non-axon run (cpu tests etc.)
    deadline = time.time() + max_wait_s
    while True:
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", 8083))
            return
        except OSError:
            if time.time() > deadline:
                print(
                    "bench: axon relay tunnel is DOWN "
                    "(127.0.0.1:8083 refused for "
                    f"{max_wait_s:.0f}s) — refusing to hang at device "
                    "init; restore the tunnel and rerun",
                    file=sys.stderr,
                )
                raise SystemExit(2)
            time.sleep(5)
        finally:
            s.close()


_await_relay(float(os.environ.get("BENCH_RELAY_WAIT_S", "120")))

import jax
import jax.numpy as jnp

import zoic_tpu as zt

TARGET_RAYS_PER_SEC = 1e9

# Measured VPU issue-rate peak on this chip (tools/roofline.py, PERF_NOTES
# "Measured VPU roofline"): ~0.80e12 element-ops/s sustained for the
# kernel's op mix.  MFU below = useful-work ops / peak.
VPU_PEAK_OPS = 0.80e12
# Cost model per ray at the north-star config (PERF_NOTES "Gap
# decomposition" r3): ~560 VPU ops per traced attempt x ~1.22 expected
# traced attempts (cos4 harmonic + measured-margin bound) + ~72 ops x
# ~0.9 precheck-consumed draws (tighter bound shifts consumption from
# traces to prechecks).
USEFUL_OPS_PER_RAY = 560 * 1.22 + 72 * 0.9


def _samples(n, seed=0, raster=True):
    """Screen/lens sample arrays.  ``raster=True`` lays screen samples out
    in image scanline order (what a renderer's bucket loop produces) —
    film-radius-coherent VMEM tiles resolve their vignette retries in fewer
    masked rounds than randomly shuffled rays."""
    u = jax.random.uniform(jax.random.PRNGKey(seed), (2, n), dtype=jnp.float32)
    if raster:
        side = int(n**0.5)
        while n % side:
            side -= 1
        ny, nx = side, n // side
        ys = (jnp.arange(ny, dtype=jnp.float32) + 0.5) / ny * 2.0 - 1.0
        xs = (jnp.arange(nx, dtype=jnp.float32) + 0.5) / nx * 2.0 - 1.0
        sy = jnp.repeat(ys, nx)
        sx = jnp.tile(xs, ny)
    else:
        v = jax.random.uniform(jax.random.PRNGKey(seed + 1), (2, n), dtype=jnp.float32)
        sx, sy = v[0] * 2.0 - 1.0, v[1] * 2.0 - 1.0
    return sx, sy, u[0], u[1]


def bench_config(
    cfg: zt.CameraConfig, n: int, iters: int, inner: int = 16, warmup: int = 2,
    raster: bool = True, mesh: bool = False,
) -> dict:
    """Median steady-state throughput for one config (``inner`` whole-batch
    generations per timed launch — a renderer batches frames the same way;
    on relay-attached chips this also amortizes the fixed ~25ms launch
    round-trip).  Returns rays/sec plus per-run efficiency telemetry:
    attempts/ray (the straggler-waste signal the retry machine optimizes)
    and the vignetted fraction."""
    state = zt.compile_camera(cfg)
    sx, sy, lx, ly = _samples(n, raster=raster)
    if mesh:
        # DP over every attached chip (parallel.sharding): batch sharded
        # on the ray axis over a 1-D ICI mesh, lens state replicated,
        # stats psum-reduced — rays never communicate, so scaling is
        # linear minus the psum epilogue
        from zoic_tpu.parallel import sharding as _shd

        m = _shd.make_mesh()
        sx, sy = _shd.shard_samples(m, sx, sy)
    base_key = jax.random.PRNGKey(42)

    @jax.jit
    def step(key):
        def body(i, carry):
            acc, vig, tri = carry
            k = jax.random.fold_in(key, i)
            # fresh lens-sample uniforms EVERY generation: with
            # loop-invariant samples XLA hoists per-ray sample prep (the
            # image-bokeh CDF inversion in particular) out of the loop and
            # the bokeh configs overstate steady-state throughput
            # (VERDICT r2 #3); a renderer draws fresh lens samples per AA
            # sample anyway.  Screen samples stay fixed (the pixel grid).
            # The draws come from the counter-hash (murmur3) family the
            # kernel itself uses for retries — the renderer-sampler
            # stand-in, seeded fresh per generation; threefry for the
            # same (2, 4M) cost ~0.17 ms/M rays, 17% of the whole
            # headline generation (r5: 832 -> 973M from this swap alone).
            # Distinct salts + an independent seed keep the streams
            # uncorrelated with the kernel's internal retry draws.
            from zoic_tpu.ops import trace_kernel as _tk
            _ids = jnp.arange(sx.size, dtype=jnp.int32).reshape(sx.shape)
            _gs = jax.random.randint(
                jax.random.fold_in(k, 999), (), 0, 1 << 22
            )
            u1 = _tk._hash_uniform(_ids, _gs, jnp.int32(0), 0x77777777)
            u2 = _tk._hash_uniform(_ids, _gs, jnp.int32(0), 0x88888888)
            if mesh:
                rays, stats = _shd.create_rays_sharded(
                    m, state, cfg, sx, sy, u1, u2, k
                )
            else:
                rays, stats = zt.create_rays(
                    state, cfg, sx, sy, u1, u2, k
                )
            # consume outputs so nothing is dead-code eliminated
            acc = acc + jnp.sum(rays.weight) + jnp.sum(rays.dir[:, 0])
            return (
                acc,
                vig + stats.vignetted.astype(jnp.float32),
                tri + stats.tries_total.astype(jnp.float32),
            )
        return jax.lax.fori_loop(0, inner, body, (jnp.float32(0.0),) * 3)

    for i in range(warmup):
        out = step(jax.random.fold_in(base_key, 1000 + i))
    float(out[0])  # drain (block_until_ready doesn't fence the relay; r3)

    # burst timing: the axon relay executes dispatched programs FIFO and
    # asynchronously (jax.block_until_ready does NOT fence it — PERF_NOTES
    # r3 roofline section), so per-step wall clocks are unreliable.  Time a
    # burst of dispatches drained by one scalar readback; median of 3
    # bursts.  This also amortizes the fixed per-launch round-trip the way
    # a renderer's frame loop would.
    rates = []
    tries_sum = vig_sum = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(jax.random.fold_in(base_key, rep * iters + i))
        acc = float(out[0])  # forces the whole burst to completion
        dt = time.perf_counter() - t0
        rates.append(inner * n * iters / dt)
        vig_sum += float(out[1])
        tries_sum += float(out[2])
    rates.sort()
    rays_per_sec = rates[len(rates) // 2]

    # efficiency telemetry straight from the timed loop's own RayStats:
    # attempts/ray = 1 + mean tries (the straggler-waste signal), covering
    # every path — raytraced, thin-lens vignette, presampled bokeh
    vig_frac = vig_sum / (3 * inner * n)
    attempts = 1.0 + tries_sum / (3 * inner * n)
    # drop this config's jit cache entry: its closed-over sample/state
    # buffers otherwise stay pinned on-device for the whole --all sweep
    # (measured: the headline config degrades 5x when run last)
    step.clear_cache()
    return {
        "rays_per_sec": rays_per_sec,
        "vignetted_frac": vig_frac,
        "attempts_per_ray": attempts,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=7)
    # inner=32 (128M rays / launch): the axon relay's fixed per-launch
    # round-trip does not pipeline across dispatched programs, so 16
    # generations/launch still paid ~4.5% of the headline to launch gaps
    # (measured r5: inner 16/32/64 -> 965/1008/998M).  A renderer's frame
    # loop batches at least this much; methodology otherwise unchanged
    # (fresh per-generation draws, burst timing, one scalar drain).
    ap.add_argument("--inner", type=int, default=32)
    ap.add_argument("--random-order", action="store_true",
                    help="shuffled sample order instead of raster order")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch over ALL attached devices "
                         "(DP over ICI; reports aggregate and per-chip)")
    ap.add_argument("--all", action="store_true", help="run all baseline configs")
    ap.add_argument("--only", type=str, default="",
                    help="with --all: comma list of substrings; run only "
                         "matching extra configs (skips the headline too "
                         "unless 'headline' matches)")
    ap.add_argument("--max-tries", type=int, default=None,
                    help="override the retry budget (0 = single-attempt "
                         "floor measurement for the gap decomposition)")
    ap.add_argument("--no-precheck", action="store_true",
                    help="disable the polar pupil pre-check")
    args = ap.parse_args()
    if args.only and not args.all:
        # --only filters the --all config table; alone it would silently
        # benchmark nothing (ADVICE r3) — imply --all so the intent works
        args.all = True

    dg = zt.data.lens_path("double_gauss_f2.0")
    north_star = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=dg,
        focal_length=5.0,
        fstop=2.0,
        focal_distance=100.0,
        kolb_sampling_lut=True,
    )
    if args.max_tries is not None or args.no_precheck:
        import dataclasses

        over = {}
        if args.max_tries is not None:
            over["max_tries"] = args.max_tries
        if args.no_precheck:
            over["pupil_precheck"] = False
        north_star = dataclasses.replace(north_star, **over)

    if args.all:
        import numpy as np

        bokeh_path = "/tmp/zoic_bench_bokeh.npy"
        yy, xx = np.mgrid[-1:1:64j, -1:1:64j]
        img = ((xx**2 + yy**2) < 0.8).astype(np.float32)
        np.save(bokeh_path, np.stack([img, img, img], -1))
        extra = {
            "thinlens_f1.4": zt.CameraConfig(
                lens_model=zt.LensModel.THINLENS, focal_length=5.0, fstop=1.4,
                focal_distance=100.0, use_dof=True,
            ),
            "thinlens_vignette": zt.CameraConfig(
                lens_model=zt.LensModel.THINLENS, focal_length=5.0, fstop=1.4,
                focal_distance=100.0, use_dof=True,
                optical_vignetting_distance=1.0, optical_vignetting_radius=1.0,
            ),
            "thinlens_bokeh_image": zt.CameraConfig(
                lens_model=zt.LensModel.THINLENS, focal_length=5.0, fstop=1.4,
                focal_distance=100.0, use_dof=True,
                use_image=True, bokeh_path=bokeh_path,
            ),
            "raytraced_fisheye": zt.CameraConfig(
                lens_model=zt.LensModel.RAYTRACED,
                lens_data_path=zt.data.lens_path("fisheye_muller_f4.0"),
                focal_length=1.0, fstop=4.0, focal_distance=100.0,
            ),
            # BASELINE config 3 x 4: image-based bokeh through the full
            # raytraced path (presampled attempt-0 + streamed retry planes)
            "raytraced_bokeh_image": zt.CameraConfig(
                lens_model=zt.LensModel.RAYTRACED, lens_data_path=dg,
                focal_length=5.0, fstop=2.0, focal_distance=100.0,
                kolb_sampling_lut=True,
                use_image=True, bokeh_path=bokeh_path,
            ),
        }
        # BASELINE config 5: wide-angle/exotic suite with focus breathing —
        # petzval + telephoto swept over focus distances (each distance is
        # a fresh image-distance solve -> different originShift, the
        # breathing effect; zoic.cpp:1054-1095)
        for lens_name, focal, fstop in (
            ("petzval_f1.25", 5.0, 1.25),
            ("telephoto_f5.0", 10.0, 5.0),
        ):
            for focus in (30.0, 100.0, 1000.0):
                extra[f"raytraced_{lens_name}_focus{focus:g}"] = zt.CameraConfig(
                    lens_model=zt.LensModel.RAYTRACED,
                    lens_data_path=zt.data.lens_path(lens_name),
                    focal_length=focal, fstop=fstop, focal_distance=focus,
                )
        for name, cfg in extra.items():
            if args.only and not any(
                s in name for s in args.only.split(",")
            ):
                continue
            r = bench_config(cfg, args.batch, args.iters, args.inner)
            print(
                f"  {name}: {r['rays_per_sec']:.3e} rays/s "
                f"(vignetted {r['vignetted_frac']:.3f}, "
                f"{r['attempts_per_ray']:.2f} attempts/ray)",
                file=sys.stderr,
            )

    if args.only and "headline" not in args.only:
        return
    res = bench_config(
        north_star, args.batch, args.iters, args.inner,
        raster=not args.random_order, mesh=args.mesh,
    )
    n_dev = jax.device_count() if args.mesh else 1
    att = res["attempts_per_ray"]
    # roofline telemetry (PERF_NOTES r3): useful-work VPU ops per ray from
    # the cost model / measured issue-rate peak -> model FLOP utilization.
    # Machinery waste (folds, unsort, round fixed costs) is 1 - mfu once
    # the attempt floor itself is at the roofline.
    mfu = res["rays_per_sec"] * USEFUL_OPS_PER_RAY / VPU_PEAK_OPS
    print(
        json.dumps(
            {
                "metric": (
                    "camera_rays_per_sec_chip_double_gauss_f2.0_lut"
                    if n_dev == 1
                    else f"camera_rays_per_sec_mesh{n_dev}_double_gauss"
                ),
                "value": res["rays_per_sec"],
                "unit": "rays/sec",
                "vs_baseline": (
                    res["rays_per_sec"] / n_dev / TARGET_RAYS_PER_SEC
                ),
                "attempts_per_ray": att,
                "vignetted_frac": res["vignetted_frac"],
                "vpu_peak_tops": VPU_PEAK_OPS / 1e12,
                "mfu": mfu,
            }
        )
    )


if __name__ == "__main__":
    main()
