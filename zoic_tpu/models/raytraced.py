"""Raytraced ("Kolb") camera model.

TPU-native rebuild of the reference's RAYTRACED branch of
``camera_create_ray`` (src/zoic.cpp:1850-1964): film point at
``(sx, sy) * sensorWidth/2`` on the shifted film plane, aperture sample
targeted at the first element either naively (whole first-element disk,
zoic.cpp:1873-1887) or shaped by the exit-pupil LUT (zoic.cpp:1889-1947),
full element-stack trace (:mod:`zoic_tpu.trace`), masked resample rounds for
vignetted attempts, and the final origin/direction negation
(zoic.cpp:1960-1961).

Known deviation (documented): in the reference's LUT *retry* path the
centroid translation is added to both lens-UV components
(``lens += translation``, zoic.cpp:1933) while the first attempt and the
LUT self-test translate x only (zoic.cpp:1914, 1503).  We translate x only
everywhere — the retry behavior is taken to be the typo.  See PARITY.md.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import pupil, trace
from ..config import CameraConfig
from ..optics import V3
from ..system import CameraState, RayBatch, RayStats
from . import common

Array = jnp.ndarray


def _attempt(
    state: CameraState,
    config: CameraConfig,
    ox: Array, oy: Array, oz: Array,      # film point (reset every attempt)
    shaping: Optional[Tuple[Array, Array, Array, Array]],
    u1: Array, u2: Array,
) -> Tuple[Array, tuple, Array]:
    """One trace attempt from aperture uniforms (u1, u2).

    Returns (ok, (ox, oy, oz, dx, dy, dz), tir_count) with the post-trace
    partial state frozen exactly as the reference leaves it on failure.
    """
    lens = state.lens
    lx, ly = common.aperture_sample(config.use_image, state.bokeh, u1, u2)

    if shaping is None:
        # naive: target the whole first element; the lens-UV is scaled by the
        # element's *diameter* (zoic.cpp:1874-1875) — 2x over-cover, preserved.
        tx = lx * lens.aperture[0]
        ty = ly * lens.aperture[0]
    else:
        max_scale, translation, sin_t, cos_t = shaping
        sx_ = lx * max_scale + translation
        sy_ = ly * max_scale
        tx = sx_ * cos_t - sy_ * sin_t
        ty = sx_ * sin_t + sy_ * cos_t

    dx = tx - ox
    dy = ty - oy
    # zeros_like keeps the component batch-varying under shard_map
    dz = jnp.zeros_like(ox) - lens.thickness[0]

    res = trace.trace_stack(lens, V3(ox, oy, oz), V3(dx, dy, dz))
    payload = (res.origin.x, res.origin.y, res.origin.z,
               res.direction.x, res.direction.y, res.direction.z)
    return res.ok, payload, res.tir


def _use_pallas(config: CameraConfig) -> bool:
    """Pick the fused TPU kernel when eligible.

    All sampling paths are covered: concentric disk (naive or LUT shaping)
    with the in-kernel counter-hash draws, and image-based bokeh via
    presampled attempt-0 offsets plus streamed per-round retry-draw planes
    (the CDF inversion happens outside; zoic.cpp:1870, 1932).  On CPU the
    kernel runs interpreted (tests) only when explicitly requested."""
    if config.impl == "jnp":
        return False
    if config.impl == "pallas":
        return True
    return jax.default_backend() == "tpu"


def create_rays(
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    key: Optional[Array] = None,
) -> Tuple[RayBatch, RayStats]:
    """Batched RAYTRACED ``camera_create_ray``."""
    lens = state.lens
    assert lens is not None, "raytraced model requires a compiled LensSystem"
    b = sx.shape
    if key is None:
        key = jax.random.PRNGKey(0)

    if _use_pallas(config) and len(b) == 1:
        return _create_rays_pallas(state, config, sx, sy, lensx, lensy, key)

    ox = sx * (state.sensor_width * 0.5)
    oy = sy * (state.sensor_width * 0.5)  # width for both axes (zoic.cpp:1853-1854)
    oz = jnp.zeros_like(sx) + lens.origin_shift

    if config.kolb_sampling_lut:
        assert lens.lut is not None, "kolb_sampling_lut=True requires a built LUT"
        # Shaping params depend only on the film point: computed once per ray
        # and reused across retries, as the reference does (zoic.cpp:1891-1911).
        dist = jnp.abs(jnp.sqrt(ox * ox + oy * oy))
        max_scale, translation = pupil.lut_lookup(lens.lut, dist)
        theta = jnp.arctan2(oy, ox)
        from .. import optics as _optics

        shaping = (max_scale, translation, _optics.fast_sin(theta), _optics.fast_cos(theta))
    else:
        shaping = None

    ok0, payload0, tir0 = _attempt(state, config, ox, oy, oz, shaping, lensx, lensy)

    def retry(round_key: Array, pending: Array):
        u = jax.random.uniform(round_key, (2,) + b, dtype=jnp.float32)
        ok, payload, tir = _attempt(state, config, ox, oy, oz, shaping, u[0], u[1])
        # count TIR events only on lanes that actually retried this round
        return ok, payload, jnp.sum(tir & pending, dtype=jnp.int32)

    ok, payload, tries, tir_total = common.resample_rounds(
        ok0, payload0, retry, key, config.max_tries,
        jnp.sum(tir0, dtype=jnp.int32),
    )

    pox, poy, poz, pdx, pdy, pdz = payload
    weight, n_ok, n_vig = common.weight_and_stats(tries, config.max_tries)

    # flip ray direction and origin (zoic.cpp:1960-1961)
    origin = jnp.stack([-pox, -poy, -poz], axis=-1)
    direction = jnp.stack([-pdx, -pdy, -pdz], axis=-1)

    d_ody, d_ddy = common.fake_derivatives(tries, origin, direction)
    weight = common.apply_exposure(weight, state.exposure_control)
    stats = RayStats(n_ok, n_vig, tir_total, jnp.sum(tries, dtype=jnp.int32))
    return RayBatch(origin, direction, weight, d_ody, d_ddy), stats


def _shaping_params(
    state: CameraState, config: CameraConfig, ox: Array, oy: Array
) -> Tuple[Array, Array, Array, Array]:
    """Per-ray aperture-shaping constants, unified across naive and LUT
    modes: sample' = R(theta) @ (sample * max_scale + (translation, 0)).
    Naive mode (zoic.cpp:1874-1876) is (aperture0, 0, identity)."""
    lens = state.lens
    if config.kolb_sampling_lut:
        from .. import optics as _optics

        dist = jnp.abs(jnp.sqrt(ox * ox + oy * oy))
        max_scale, translation = pupil.lut_lookup(lens.lut, dist)
        theta = jnp.arctan2(oy, ox)
        return max_scale, translation, _optics.fast_sin(theta), _optics.fast_cos(theta)
    zero = jnp.zeros_like(ox)
    return (
        zero + lens.aperture[0],
        zero,
        zero,
        zero + 1.0,
    )


def _create_rays_pallas(
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    key: Array,
) -> Tuple[RayBatch, RayStats]:
    """Fused-kernel path: the whole sample->shape->trace->retry pipeline,
    including the LUT/profile shaping lookups (from SMEM tables), runs in
    one Pallas kernel (ops/trace_kernel.py); only the weight/exposure/
    derivative epilogue stays in jnp.

    Image-based bokeh: the CDF inversions happen out here (attempt-0 from
    the caller's uniforms, retry draws pregenerated per round from counted
    keys — the batched form of the reference's in-loop redraws at
    zoic.cpp:1881, 1932) and enter the kernel as offset planes."""
    from ..ops import trace_kernel

    lens = state.lens
    seed = jax.random.randint(key, (), 0, 1 << 22)

    presampled = bool(config.use_image)
    retry_u1 = retry_u2 = None
    if presampled:
        from .. import bokeh as bokeh_mod

        lensx, lensy = bokeh_mod.sample(state.bokeh, lensx, lensy)
        if config.max_tries > 0:
            n_planes = min(trace_kernel.BOKEH_PLANES, config.max_tries + 1)
            b = sx.shape[0]
            # quarter-batch retry planes: draws are cross-ray shared by
            # construction (position-based assignment, PARITY.md), so grid
            # tiles reuse plane blocks modulo the plane's tile count; this
            # cuts the dominant per-generation bokeh.sample volume from
            # (1+P)*B to (1+P/4)*B draws (the CDF inversion was ~70% of
            # the raytraced-bokeh generation cost, PERF_NOTES r3)
            # eighth-batch planes (r5, was quarter): expected retry-draw
            # consumption is ~0.5/ray (attempts/ray 1.46) so P * b/8 = b/2
            # plane draws still oversupply ~2x before rotation reuse even
            # starts; the CDF-inversion volume is most of the
            # raytraced+bokeh generation cost (PERF_NOTES r4/r5), and
            # cross-ray sharing stays iid under position-based assignment
            # (PARITY.md) — only the sharing factor changes (8 tiles per
            # plane block at the 4M bench batch)
            bp = min(b, max(1 << 16, b // 8))
            # plane uniforms come from the kernel's counter-hash, not
            # threefry: these are INTERNAL retry draws (the reference's
            # in-loop xor128 redraws, zoic.cpp:1932), and jax.random's
            # threefry costs ~5.6 ms per (2, 4M) on-chip — ~25% of the
            # whole bokeh generation (PERF_NOTES r4)
            ids = jnp.arange(n_planes * bp, dtype=jnp.int32)
            pseed = seed + jnp.int32(0x5BD1)
            zero = jnp.int32(0)
            pu1 = trace_kernel._hash_uniform(ids, pseed, zero, 0x33333333)
            pu2 = trace_kernel._hash_uniform(ids, pseed, zero, 0x44444444)
            retry_u1, retry_u2 = bokeh_mod.sample(state.bokeh, pu1, pu2)
            retry_u1 = retry_u1.reshape(n_planes, bp)
            retry_u2 = retry_u2.reshape(n_planes, bp)

    origin, direction, tries, tir = trace_kernel.raytraced_fused(
        lens, sx, sy, lensx, lensy,
        state.sensor_width, seed,
        max_tries=config.max_tries,
        use_lut=bool(config.kolb_sampling_lut),
        use_profile=bool(
            config.pupil_precheck
            and lens.profile is not None
            # presampled (bokeh) candidates are square offsets: the
            # pre-check is sound only under a square-domain-fitted bound
            # (compile_camera fits "square" when use_image)
            and (not presampled or lens.profile_domain == "square")
        ),
        interpret=jax.default_backend() == "cpu",
        presampled=presampled,
        retry_u1=retry_u1,
        retry_u2=retry_u2,
    )
    weight, n_ok, n_vig = common.weight_and_stats(tries, config.max_tries)
    d_ody, d_ddy = common.fake_derivatives(tries, origin, direction)
    weight = common.apply_exposure(weight, state.exposure_control)
    stats = RayStats(
        n_ok, n_vig, jnp.sum(tir, dtype=jnp.int32),
        jnp.sum(tries, dtype=jnp.int32),
    )
    return RayBatch(origin, direction, weight, d_ody, d_ddy), stats
