"""Top-level camera API: setup ("lens compile") + batched ray generation.

This module replaces the reference's Arnold node lifecycle (SURVEY.md §3):

* ``node_update`` (src/zoic.cpp:1575-1720) -> :func:`compile_camera` — a
  one-shot setup producing a device-resident :class:`CameraState`, memoized
  on the same parameter tuples the reference's ``lensChanged`` /
  ``bokehChanged`` checks use (zoic.cpp:595-611).
* ``camera_create_ray`` (zoic.cpp:1752-1990) -> :func:`create_rays` — a pure
  jittable function mapping [B] sample arrays to a :class:`RayBatch`.
* ``node_finish`` stats report (zoic.cpp:1729-1732) ->
  :meth:`Camera.log_stats`.

The functional core (``compile_camera`` / ``create_rays``) is what you jit,
shard, and differentiate; :class:`Camera` is a thin convenience wrapper that
owns the caches.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bokeh as bokeh_mod
from . import lensfile, pupil, solve
from .config import CameraConfig, LensModel
from .models import raytraced, thinlens
from .system import CameraState, RayBatch, RayStats

log = logging.getLogger("zoic")

Array = jnp.ndarray


def compile_camera(
    config: CameraConfig, lut_key: Optional[Array] = None
) -> CameraState:
    """Build the device-resident camera state (the ``node_update`` pipeline).

    For THINLENS this precomputes fov/tan_fov/apertureRadius
    (zoic.cpp:1606-1608); for RAYTRACED it runs the full lens-solve pipeline
    (parse, cleanup, focal solve x2, rescale, focus solve, centers, LUT —
    zoic.cpp:1615-1698).  ``lut_key`` seeds the Monte-Carlo exit-pupil LUT
    build (default: PRNGKey(0)).
    """
    fov = 2.0 * math.atan(config.sensor_width / (2.0 * config.focal_length))
    tan_fov = math.tan(fov / 2.0)
    aperture_radius = config.focal_length / (2.0 * config.fstop)

    bokeh_state = None
    if config.use_image:
        tr_path = config.debug.image_sampling_trace
        if tr_path:
            # _DEBUGIMAGESAMPLING equivalent: dump every CDF-build
            # intermediate (zoic.cpp:248-409) while compiling the image
            with open(tr_path, "w") as tr:
                bokeh_state = bokeh_mod.load(config.bokeh_path, trace=tr)
        else:
            bokeh_state = bokeh_mod.load(config.bokeh_path)

    lens = None
    if config.lens_model is LensModel.RAYTRACED:
        rx = lensfile.load(config.lens_data_path)
        lens, report = solve.solve_lens(rx, config)
        solve.log_report(report)
        # Static kernel specializations from the concrete solve: the iris
        # refract-identity (see LensSystem.iris_identity) and the
        # per-element topological flags (TIR possible / negative
        # curvature — see LensSystem.elem_flags).
        import dataclasses

        ior = [float(x) for x in lens.ior]
        ior_nx = ior[1:] + [1.0]
        curv = [float(x) for x in lens.curvature]
        flags = tuple(
            (1 if a > b else 0) | (2 if c < 0.0 else 0)
            for a, b, c in zip(ior, ior_nx, curv)
        )
        ae = lens.aperture_element
        iris_id = bool(ae >= 0 and ior[ae] == ior_nx[ae])
        lens = dataclasses.replace(
            lens, iris_identity=iris_id, elem_flags=flags
        )
        if config.kolb_sampling_lut:
            if lut_key is None:
                lut_key = jax.random.PRNGKey(0)
            import dataclasses

            lut = pupil.build_lut(
                lens, lut_key, config.lut_film_samples, config.lut_bounds_samples
            )
            lens = dataclasses.replace(lens, lut=lut)
        if config.pupil_precheck:
            import dataclasses

            import jax as _jax

            prof_key = _jax.random.PRNGKey(1) if lut_key is None else _jax.random.fold_in(lut_key, 1)
            # image-bokeh candidates are square offsets (bokehSample,
            # zoic.cpp:441-485): the pre-check bound must be fitted and
            # validated over all of [-1,1]^2, not just the unit disk
            prof_domain = "square" if config.use_image else "disk"
            profile, key_acc = pupil.build_profile(
                lens, prof_key, domain=prof_domain
            )
            # dead-film fraction drives the retry machine's compaction
            # regime (quantized to 1 decimal so same-shape lenses share
            # jit cache entries; see LensSystem.dead_frac)
            r_max = config.sensor_width * 0.5 * math.sqrt(2.0)
            dead = pupil.dead_film_fraction(profile.keys, key_acc, r_max)
            # polynomial bound form: fit the FINAL per-key bound; the
            # kernel uses it only when the raw fit is tight (smooth
            # profiles — cliff-shaped dead regions keep the exact chain,
            # pupil.POLY_MAX_DEFICIT)
            poly, deficit = pupil.fit_profile_poly(profile, r_max=r_max)
            profile = dataclasses.replace(profile, poly=poly)
            lens = dataclasses.replace(
                lens, profile=profile, dead_frac=round(dead, 1),
                profile_domain=prof_domain,
                profile_poly=bool(deficit < pupil.POLY_MAX_DEFICIT),
            )

    f32 = jnp.float32
    return CameraState(
        fov=f32(fov),
        tan_fov=f32(tan_fov),
        aperture_radius=f32(aperture_radius),
        sensor_width=f32(config.sensor_width),
        sensor_height=f32(config.sensor_height),
        focal_distance=f32(config.focal_distance),
        ov_distance=f32(config.optical_vignetting_distance),
        ov_radius=f32(config.optical_vignetting_radius),
        exposure_control=f32(config.exposure_control),
        lens=lens,
        bokeh=bokeh_state,
    )


@partial(jax.jit, static_argnames=("config",))
def create_rays(
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    key: Optional[Array] = None,
) -> Tuple[RayBatch, RayStats]:
    """Batched ``camera_create_ray``: map [B] (screen-UV, lens-UV) samples to
    ray origins/directions/weights.  Pure and jittable; ``config`` is a
    static (hashable) argument, ``state`` is a traced pytree."""
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    lensx = jnp.asarray(lensx, jnp.float32)
    lensy = jnp.asarray(lensy, jnp.float32)
    if config.lens_model is LensModel.THINLENS:
        return thinlens.create_rays(state, config, sx, sy, lensx, lensy, key)
    return raytraced.create_rays(state, config, sx, sy, lensx, lensy, key)


class Camera:
    """Stateful convenience wrapper with the reference's caching behavior."""

    def __init__(self, config: CameraConfig, lut_key: Optional[Array] = None):
        self.config = config
        self.state = compile_camera(config, lut_key)
        self._lens_key = config.lens_key()
        self._stats_totals = np.zeros(3, np.int64)

    def update(self, config: CameraConfig) -> None:
        """Re-run setup only if the relevant parameters changed
        (``lensChanged``/``bokehChanged`` memoization, zoic.cpp:1615)."""
        if config.lens_key() != self._lens_key:
            self.state = compile_camera(config)
            self._lens_key = config.lens_key()
        else:
            log.warning(
                "[ZOIC] Skipping raytraced node update, parameters didn't change."
            )
        self.config = config

    def create_rays(
        self,
        sx: Array,
        sy: Array,
        lensx: Array,
        lensy: Array,
        key: Optional[Array] = None,
    ) -> Tuple[RayBatch, RayStats]:
        rays, stats = create_rays(
            self.state, self.config, sx, sy, lensx, lensy, key
        )
        self._stats_totals += np.array(
            [int(stats.success), int(stats.vignetted), int(stats.tir)], np.int64
        )
        return rays, stats

    def log_stats(self) -> None:
        """The ``node_finish`` report (zoic.cpp:1729-1732)."""
        ok, vig, tir = self._stats_totals
        log.info("%-40s %12d", "[ZOIC] Succesful rays", ok)
        log.info("%-40s %12d", "[ZOIC] Vignetted rays", vig)
        denom = float(ok + vig)
        pct = (vig / denom * 100.0) if denom else 0.0
        log.info("%-40s %12.8f", "[ZOIC] Vignetted Percentage", pct)
        log.info("%-40s %12d", "[ZOIC] Total internal reflection cases", tir)
