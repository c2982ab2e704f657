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
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

import zoic_tpu as zt

TARGET_RAYS_PER_SEC = 1e9


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
    cfg: zt.CameraConfig, n: int, iters: int, inner: int = 4, warmup: int = 2,
    raster: bool = True,
) -> float:
    """Median steady-state rays/sec for one config (inner generations per
    timed launch)."""
    state = zt.compile_camera(cfg)
    sx, sy, lx, ly = _samples(n, raster=raster)
    base_key = jax.random.PRNGKey(42)

    @jax.jit
    def step(key):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            rays, stats = zt.create_rays(state, cfg, sx, sy, lx, ly, k)
            # consume outputs so nothing is dead-code eliminated
            return (
                acc
                + jnp.sum(rays.weight)
                + jnp.sum(rays.dir[:, 0])
                + stats.vignetted.astype(jnp.float32)
            )
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    for i in range(warmup):
        out = step(jax.random.fold_in(base_key, 1000 + i))
    jax.block_until_ready(out)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = step(jax.random.fold_in(base_key, i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return inner * n / times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--random-order", action="store_true",
                    help="shuffled sample order instead of raster order")
    ap.add_argument("--all", action="store_true", help="run all baseline configs")
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
            rps = bench_config(cfg, args.batch, args.iters, args.inner)
            print(f"  {name}: {rps:.3e} rays/s", file=sys.stderr)

    rays_per_sec = bench_config(
        north_star, args.batch, args.iters, args.inner,
        raster=not args.random_order,
    )
    print(
        json.dumps(
            {
                "metric": "camera_rays_per_sec_chip_double_gauss_f2.0_lut",
                "value": rays_per_sec,
                "unit": "rays/sec",
                "vs_baseline": rays_per_sec / TARGET_RAYS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
