"""Benchmark: camera rays/sec/chip on the BASELINE.json north-star config.

Raytraced Double-Gauss f/2.0 with exit-pupil LUT sampling, 1M-sample batch.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e9 (the >=1e9 rays/sec/chip target — the C++
reference publishes no numbers of its own; see BASELINE.md).

Run on the real TPU chip: ``python bench.py``.  Extra per-config results are
printed to stderr with ``--all``.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

import zoic_tpu as zt

TARGET_RAYS_PER_SEC = 1e9


def _samples(n, seed=0):
    u = jax.random.uniform(jax.random.PRNGKey(seed), (4, n), dtype=jnp.float32)
    return u[0] * 2.0 - 1.0, u[1] * 2.0 - 1.0, u[2], u[3]


def bench_config(cfg: zt.CameraConfig, n: int, iters: int, warmup: int = 3) -> float:
    """Median-of-iters steady-state rays/sec for one config."""
    state = zt.compile_camera(cfg)
    sx, sy, lx, ly = _samples(n)
    key = jax.random.PRNGKey(42)

    def step(k):
        rays, stats = zt.create_rays(state, cfg, sx, sy, lx, ly, k)
        return rays.origin, rays.dir, rays.weight

    step_jit = jax.jit(step)
    for _ in range(warmup):
        out = step_jit(key)
    jax.block_until_ready(out)

    times = []
    for i in range(iters):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = step_jit(k)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return n / times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--all", action="store_true", help="run all 5 baseline configs")
    args = ap.parse_args()

    dg = zt.data.lens_path("double_gauss_f2.0")
    north_star = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=dg,
        focal_length=5.0,
        fstop=2.0,
        focal_distance=100.0,
        kolb_sampling_lut=True,
    )

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
        }
        for name, cfg in extra.items():
            rps = bench_config(cfg, args.batch, args.iters)
            print(f"  {name}: {rps:.3e} rays/s", file=sys.stderr)

    rays_per_sec = bench_config(north_star, args.batch, args.iters)
    print(
        json.dumps(
            {
                "metric": "camera_rays_per_sec_chip_double_gauss_f2.0_lut_1M",
                "value": rays_per_sec,
                "unit": "rays/sec",
                "vs_baseline": rays_per_sec / TARGET_RAYS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
