"""Exit-pupil sampling comparison: ground truth vs LUT-shaped point clouds.

Vectorized port of the reference's aperture self-test pipeline
(``testAperturesTruth`` zoic.cpp:1354-1388, ``testAperturesLUT``
zoic.cpp:1458-1544, rendered by ``src/triangleSamplingDraw.py``): for a grid
of film positions, (a) fire rays at the whole first element and keep the
lens-UV points whose full trace survives (the true exit pupil), and (b) draw
LUT-shaped samples; plot both and their overlay per film position.  The
visual overlap is the reference's LUT correctness test — here the data is
also returned for quantitative coverage assertions in tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import pupil, trace
from ..optics import V3
from ..sampling import concentric_disk_sample
from ..system import LensSystem

Array = jnp.ndarray

# jitted trace entry (eager per-op dispatch dominates otherwise)
_trace_jit = jax.jit(lambda lens, o, d: trace.trace_stack(lens, o, d))


def ground_truth_pupil(
    lens: LensSystem,
    film_xy: Tuple[float, float],
    key: Array,
    n_samples: int = 10_000,
) -> np.ndarray:
    """Surviving first-element target points for one film position
    (``testAperturesTruth`` semantics: concentric-disk over the whole first
    element — note the reference uses the element *diameter* as the scale,
    zoic.cpp:1374-1376)."""
    u = jax.random.uniform(key, (2, n_samples), dtype=jnp.float32)
    lx, ly = concentric_disk_sample(u[0], u[1])
    px = lx * lens.aperture[0]
    py = ly * lens.aperture[0]
    ox = jnp.full((n_samples,), film_xy[0], jnp.float32)
    oy = jnp.full((n_samples,), film_xy[1], jnp.float32)
    oz = jnp.zeros((n_samples,), jnp.float32) + lens.origin_shift
    d = V3(px - ox, py - oy, jnp.zeros((n_samples,)) - lens.thickness[0])
    res = _trace_jit(lens, V3(ox, oy, oz), d)
    ok = np.asarray(res.ok)
    return np.stack([np.asarray(px)[ok], np.asarray(py)[ok]], -1)


def lut_samples(
    lens: LensSystem,
    film_xy: Tuple[float, float],
    key: Array,
    n_samples: int = 5_000,
) -> np.ndarray:
    """LUT-shaped sample points for one film position
    (``testAperturesLUT`` semantics, zoic.cpp:1475-1530)."""
    u = jax.random.uniform(key, (2, n_samples), dtype=jnp.float32)
    lx, ly = concentric_disk_sample(u[0], u[1])
    fx = jnp.full((n_samples,), film_xy[0], jnp.float32)
    fy = jnp.full((n_samples,), film_xy[1], jnp.float32)
    px, py = pupil.shape_sample(lens.lut, lx, ly, fx, fy)
    return np.stack([np.asarray(px), np.asarray(py)], -1)


def coverage(
    lens: LensSystem, film_xy: Tuple[float, float], key: Array, n: int = 10_000
) -> float:
    """Fraction of ground-truth pupil points inside the LUT sampling disk —
    should be ~1.0 (the LUT cover must contain the pupil)."""
    gt = ground_truth_pupil(lens, film_xy, key, n)
    if len(gt) == 0:
        return 1.0
    dist = float(np.hypot(*film_xy))
    ms, tr_ = pupil.lut_lookup(lens.lut, jnp.float32(dist))
    ms = float(ms)
    cx = float(tr_)
    theta = np.arctan2(film_xy[1], film_xy[0])
    c, s = np.cos(theta), np.sin(theta)
    center = np.array([cx * c, cx * s])
    r = np.linalg.norm(gt - center, axis=1)
    return float(np.mean(r <= ms * 1.0000001))


def render_comparison(
    lens: LensSystem,
    out_path: str,
    film_grid: int = 3,
    sensor_width: float = 3.6,
    seed: int = 0,
    dpi: int = 110,
    n_gt: int = 4000,
    n_ss: int = 2000,
) -> None:
    """(2*film_grid+1)^2 panel plot: GT pupil (blue), LUT samples (orange),
    overlay — the reference's three-section comparison image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 2 * film_grid + 1
    fig, axes = plt.subplots(n, n, figsize=(2.2 * n, 2.2 * n), dpi=dpi)
    key = jax.random.PRNGKey(seed)
    for i in range(-film_grid, film_grid + 1):
        for j in range(-film_grid, film_grid + 1):
            ax = axes[film_grid - j][i + film_grid]
            fx = (i / film_grid) * (sensor_width * 0.5)
            fy = (j / film_grid) * (sensor_width * 0.5)
            key, k1, k2 = jax.random.split(key, 3)
            gt = ground_truth_pupil(lens, (fx, fy), k1, n_gt)
            ss = lut_samples(lens, (fx, fy), k2, n_ss)
            if len(gt):
                ax.plot(gt[:, 0], gt[:, 1], ".", ms=0.7, color="#3377cc", alpha=0.5)
            ax.plot(ss[:, 0], ss[:, 1], ".", ms=0.7, color="#e08833", alpha=0.35)
            ax.set_aspect("equal")
            ax.set_xticks([])
            ax.set_yticks([])
            ax.set_title(f"({fx:.1f},{fy:.1f})", fontsize=6)
    fig.suptitle("exit pupil: ground truth (blue) vs LUT cover (orange)")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def write_selftest_dump(
    lens: LensSystem,
    path: str,
    film_grid: int = 3,
    sensor_width: float = 3.6,
    n_gt: int = 10_000,
    n_ss: int = 5_000,
    seed: int = 0,
) -> None:
    """Produce a ``testApertures.zoic`` artifact exactly like the reference's
    aperture self-test (testAperturesTruth zoic.cpp:1354-1388 writes GT rows
    over a (2*film_grid+1)^2 film grid at 3.6*0.5 spacing; testAperturesLUT
    zoic.cpp:1458-1537 writes SS rows) — interchange format with the
    reference's triangleSamplingDraw.py renderer."""
    from . import dump as dump_mod

    key = jax.random.PRNGKey(seed)
    gt_rows, ss_rows = [], []
    for i in range(-film_grid, film_grid + 1):
        for j in range(-film_grid, film_grid + 1):
            fx = (i / film_grid) * (sensor_width * 0.5)
            fy = (j / film_grid) * (sensor_width * 0.5)
            key, k1 = jax.random.split(key)
            gt_rows.append(ground_truth_pupil(lens, (fx, fy), k1, n_gt))
    for i in range(-film_grid, film_grid + 1):
        for j in range(-film_grid, film_grid + 1):
            fx = (i / film_grid) * (sensor_width * 0.5)
            fy = (j / film_grid) * (sensor_width * 0.5)
            key, k2 = jax.random.split(key)
            ss_rows.append(lut_samples(lens, (fx, fy), k2, n_ss))
    dump_mod.write_aperture_test(path, gt_rows, ss_rows)
