"""Thin-lens camera model.

TPU-native rebuild of the reference's THINLENS branch of
``camera_create_ray`` (src/zoic.cpp:1771-1848) plus the shared epilogue
(zoic.cpp:1971-1989): pinhole direction from ``(sx, sy) * tan(fov/2)``,
optional depth of field via aperture sampling + focal-plane refocus, and
optional empirical optical vignetting — a virtual second aperture at
``opticalVignettingDistance`` that rejects rays missing a disk of
``apertureRadius * opticalVignettingRadius`` (``empericalOpticalVignetting``,
zoic.cpp:1297-1305), with masked resample rounds standing in for the per-ray
retry loop (zoic.cpp:1802-1827).

The whole generator is one jittable batched function: [B] screen/lens
samples in, a :class:`RayBatch` out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import optics
from ..config import CameraConfig
from ..optics import V3
from ..system import CameraState, RayBatch, RayStats
from . import common

Array = jnp.ndarray


def _vignette_pass(
    ox: Array, oy: Array, dx: Array, dy: Array,
    aperture_radius: Array, ov_radius: Array, ov_distance: Array,
) -> Array:
    """``empericalOpticalVignetting`` (zoic.cpp:1297-1305).  Note the
    reference computes ``dir * distance - origin`` (not origin + dir*t);
    preserved as-is — it is the shape of the effect users tuned against."""
    px = dx * ov_distance - ox
    py = dy * ov_distance - oy
    hyp = jnp.sqrt(px * px + py * py)
    return jnp.abs(hyp) < aperture_radius * ov_radius


def _dof_attempt(
    state: CameraState,
    config: CameraConfig,
    pdx: Array, pdy: Array, pdz: Array,   # normalized pinhole direction
    u1: Array, u2: Array,
) -> Tuple[Array, tuple]:
    """One DOF attempt from uniforms (u1, u2): sample the aperture, place
    the origin on the lens, refocus through the focal plane
    (zoic.cpp:1786-1820). Returns (ok, (ox, oy, dx, dy, dz))."""
    lx, ly = common.aperture_sample(config.use_image, state.bokeh, u1, u2)
    lx = lx * state.aperture_radius
    ly = ly * state.aperture_radius

    # focal-plane intersection along the pinhole ray (zoic.cpp:1798-1800)
    t = jnp.abs(state.focal_distance / pdz)
    fx, fy, fz = pdx * t, pdy * t, pdz * t
    d = optics.normalize(V3(fx - lx, fy - ly, fz))

    if config.optical_vignetting_distance > 0.0:
        ok = _vignette_pass(
            lx, ly, d.x, d.y,
            state.aperture_radius, state.ov_radius, state.ov_distance,
        )
    else:
        ok = jnp.ones_like(lx, dtype=bool)
    return ok, (lx, ly, d.x, d.y, d.z)


def create_rays(
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    key: Optional[Array] = None,
) -> Tuple[RayBatch, RayStats]:
    """Batched THINLENS ``camera_create_ray``.

    ``sx, sy`` are screen coordinates in [-1, 1] (Arnold's ``input.sx/sy``),
    ``lensx, lensy`` the primary aperture uniforms in [0, 1].  ``key`` seeds
    the retry resampling (only consumed when empirical vignetting is on).
    """
    b = sx.shape
    if key is None:
        key = jax.random.PRNGKey(0)

    # image-based bokeh rides the fused kernel in every combination:
    # attempt-0 draws are pre-sampled in jnp and handed to the kernel as
    # raw offsets; with empirical vignetting the retry redraws come from
    # streamed per-round planes (see trace_kernel/PARITY.md)
    use_pallas = (
        config.impl != "jnp"
        and len(b) == 1
        and (config.impl == "pallas" or jax.default_backend() == "tpu")
    )
    if use_pallas:
        return _create_rays_pallas(state, config, sx, sy, lensx, lensy, key)

    # pinhole direction (zoic.cpp:1774-1777); origin starts at the camera
    # origin (0,0,0), so dir = normalize(p).
    p = V3(sx * state.tan_fov, sy * state.tan_fov, jnp.ones(b, jnp.float32))
    pd = optics.normalize(p)

    zero = jnp.zeros(b, jnp.float32)
    tries = jnp.zeros(b, jnp.int32)
    tir_total = jnp.int32(0)

    if not config.use_dof:
        origin = jnp.stack([zero, zero, zero], axis=-1)
        direction = jnp.stack([pd.x, pd.y, pd.z * -1.0], axis=-1)
        weight = common.apply_exposure(jnp.ones(b, jnp.float32), state.exposure_control)
        d_ody, d_ddy = common.fake_derivatives(tries, origin, direction)
        stats = RayStats(jnp.int32(0), jnp.int32(0), tir_total, jnp.int32(0))
        return RayBatch(origin, direction, weight, d_ody, d_ddy), stats

    ok0, payload0 = _dof_attempt(state, config, pd.x, pd.y, pd.z, lensx, lensy)

    if config.optical_vignetting_distance > 0.0:

        def retry(round_key: Array, pending: Array):
            u = jax.random.uniform(round_key, (2,) + b, dtype=jnp.float32)
            ok, payload = _dof_attempt(state, config, pd.x, pd.y, pd.z, u[0], u[1])
            return ok, payload, jnp.int32(0)

        ok, payload, tries, tir_total = common.resample_rounds(
            ok0, payload0, retry, key, config.max_tries, tir_total
        )
    else:
        ok, payload = ok0, payload0

    lx, ly, dx, dy, dz = payload
    weight, n_ok, n_vig = common.weight_and_stats(tries, config.max_tries)

    origin = jnp.stack([lx, ly, jnp.zeros_like(lx)], axis=-1)
    # looking down -Z (zoic.cpp:1845)
    direction = jnp.stack([dx, dy, dz * -1.0], axis=-1)

    d_ody, d_ddy = common.fake_derivatives(tries, origin, direction)
    weight = common.apply_exposure(weight, state.exposure_control)
    stats = RayStats(n_ok, n_vig, tir_total, jnp.sum(tries, dtype=jnp.int32))
    return RayBatch(origin, direction, weight, d_ody, d_ddy), stats


def _create_rays_pallas(
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    key: Array,
) -> Tuple[RayBatch, RayStats]:
    """Fused-kernel path (ops/trace_kernel.thinlens_fused)."""
    from ..ops import trace_kernel

    presampled = bool(config.use_image)
    has_ov = config.optical_vignetting_distance > 0.0
    retry_u1 = retry_u2 = None
    if presampled:
        # attempt-0 bokeh-CDF draw per ray; with vignetting, pregenerate
        # per-round retry draws too (zoic.cpp:1815 in-loop redraws)
        from .. import bokeh as bokeh_mod

        lensx, lensy = bokeh_mod.sample(state.bokeh, lensx, lensy)
        if has_ov and config.max_tries > 0 and config.use_dof:
            n_planes = min(trace_kernel.BOKEH_PLANES, config.max_tries + 1)
            b1 = sx.shape[0]
            # quarter-batch retry planes (tiles share blocks modulo the
            # plane's tile count; see models/raytraced.py + PARITY.md)
            bp = min(b1, max(1 << 16, b1 // 4))
            u = jax.random.uniform(
                jax.random.fold_in(key, 1), (2, n_planes * bp),
                dtype=jnp.float32,
            )
            retry_u1, retry_u2 = bokeh_mod.sample(state.bokeh, u[0], u[1])
            retry_u1 = retry_u1.reshape(n_planes, bp)
            retry_u2 = retry_u2.reshape(n_planes, bp)

    seed = jax.random.randint(key, (), 0, 1 << 22)
    origin, direction, tries = trace_kernel.thinlens_fused(
        sx, sy, lensx, lensy,
        state.tan_fov, state.aperture_radius, state.focal_distance,
        state.ov_distance, state.ov_radius, seed,
        use_dof=config.use_dof,
        has_ov=has_ov,
        max_tries=config.max_tries,
        interpret=jax.default_backend() == "cpu",
        presampled=presampled,
        retry_u1=retry_u1,
        retry_u2=retry_u2,
    )
    if config.use_dof:
        weight, n_ok, n_vig = common.weight_and_stats(tries, config.max_tries)
    else:
        weight = jnp.ones_like(sx)
        n_ok = jnp.int32(0)
        n_vig = jnp.int32(0)
    d_ody, d_ddy = common.fake_derivatives(tries, origin, direction)
    weight = common.apply_exposure(weight, state.exposure_control)
    stats = RayStats(n_ok, n_vig, jnp.int32(0), jnp.sum(tries, dtype=jnp.int32))
    return RayBatch(origin, direction, weight, d_ody, d_ddy), stats
