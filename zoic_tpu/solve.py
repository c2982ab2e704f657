"""On-device lens solvers — the "lens compile" pipeline.

TPU-native rebuild of the reference's ``node_update`` setup pipeline for the
raytraced model (src/zoic.cpp:1615-1698) and its solver traces:

* ``traceThroughLensElementsForFocalLength`` (zoic.cpp:1161-1228)
  -> :func:`trace_focal_length` — fires a near-axis parallel ray through the
  stack, intersects the principal plane and the focal point, and returns the
  traced focal length.
* ``adjustFocalLength`` (zoic.cpp:1231-1237) -> :func:`rescale` — scales all
  ROC/thickness/aperture by ``userFocal / tracedFocal``.
* ``calculateImageDistance`` (zoic.cpp:1054-1095) -> :func:`image_distance`
  — traces a ray *backwards* from the focus point through the stack and
  intersects y = 0 behind the rear element, yielding the film-plane shift
  (this reproduces focus breathing).
* ``computeLensCenters`` (zoic.cpp:963-969) -> :func:`lens_centers`.
* aperture-distance loop (zoic.cpp:1678-1685) -> :func:`aperture_distance`.

All solvers are pure jittable functions on the SoA element arrays; the
per-element traversal is a ``lax.scan`` carrying (origin, direction, running
thickness).  Scalar accumulations follow the reference's float32 order so
golden values agree to float precision.
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lensfile, optics
from .config import CameraConfig
from .optics import V3, v3
from .system import LensSystem

log = logging.getLogger("zoic")

Array = jnp.ndarray


class Prescription(NamedTuple):
    """Device-side element arrays prior to solving (rear-first, cm)."""

    curvature: Array
    thickness: Array
    ior: Array
    abbe: Array
    aperture: Array


def from_lensfile(rx: lensfile.LensPrescription) -> Prescription:
    return Prescription(
        jnp.asarray(rx.curvature),
        jnp.asarray(rx.thickness),
        jnp.asarray(rx.ior),
        jnp.asarray(rx.abbe),
        jnp.asarray(rx.aperture),
    )


class FocalTrace(NamedTuple):
    focal_length: Array
    principal_plane: Array
    focal_point: Array


def trace_focal_length(p: Prescription) -> FocalTrace:
    """Trace a near-axis parallel ray to find the (rear) principal plane and
    focal point (zoic.cpp:1161-1228).

    The probe ray starts at height ``aperture[0] * 0.1`` with the reference's
    un-normalized direction ``(0, 0, 99999)`` (normalized inside the sphere
    intersection).  On TIR the direction is left unchanged and the trace
    continues, matching the reference's non-fatal handling in this solver.
    """
    e = p.curvature.shape[0]
    height = p.aperture[0] * 0.1
    origin = v3(0.0, height, 0.0)
    direction = v3(0.0, 0.0, 99999.0)

    ior_next = jnp.concatenate([p.ior[1:], jnp.ones((1,), jnp.float32)])

    def body(carry, elem):
        o, d, summed = carry
        curv, ior1, ior2, thick = elem
        summed = summed + thick
        center_z = summed - curv
        hit, _ = optics.ray_sphere_intersect(
            o, d, center_z, curv, reverse=False, cull_miss=False
        )
        n = optics.sphere_normal(hit, center_z, curv)
        d_new, tir = optics.refract(d, n, ior1, ior2, check_tir=True)
        d_out = optics.where_v3(tir, d, d_new)
        return (hit, d_out, summed), (o, d_out)

    init = (origin, direction, jnp.float32(0.0))
    (_, _, _), (origins, dirs) = jax.lax.scan(
        body, init, (p.curvature, p.ior, ior_next, p.thickness)
    )
    # The reference computes the principal plane / focal point inside the last
    # iteration using the ray origin *before* it moves to the final hit point
    # (zoic.cpp:1186-1211): that origin is the (E-1)-th element's entry point,
    # i.e. the hit of iteration E-2 — which scan exposed as origins[E-1].
    o_last = V3(origins.x[e - 1], origins.y[e - 1], origins.z[e - 1])
    d_last = V3(dirs.x[e - 1], dirs.y[e - 1], dirs.z[e - 1])

    pp_line1_start = v3(0.0, height, 0.0)
    pp_line1_end = v3(0.0, height, 999999.0)
    pp_line2_end = v3(
        0.0,
        o_last.y + d_last.y * 100000.0,
        o_last.z + d_last.z * 100000.0,
    )
    principal_plane, _ = optics.line_line_zy(
        pp_line1_start, pp_line1_end, o_last, pp_line2_end
    )
    focal_point = optics.line_plane_y0(o_last, d_last).z
    return FocalTrace(focal_point - principal_plane, principal_plane, focal_point)


def rescale(p: Prescription, ratio: Array) -> Prescription:
    """``adjustFocalLength`` (zoic.cpp:1231-1237): scale ROC, thickness and
    aperture by the focal-length ratio (IOR and Abbe untouched)."""
    return Prescription(
        p.curvature * ratio,
        p.thickness * ratio,
        p.ior,
        p.abbe,
        p.aperture * ratio,
    )


def image_distance(p: Prescription, object_distance: Array) -> Array:
    """``calculateImageDistance`` (zoic.cpp:1054-1095): trace backwards from
    the in-focus object point through the stack (front to rear) and intersect
    y = 0 to find the film-plane z for the requested focal distance."""
    e = p.curvature.shape[0]
    origin = V3(
        jnp.float32(0.0), jnp.float32(0.0), jnp.asarray(object_distance, jnp.float32)
    )
    direction = V3(
        jnp.float32(0.0),
        (p.aperture[e - 1] / 2.0) * 0.05,
        -jnp.asarray(object_distance, jnp.float32),
    )

    # Conditioning fix over the reference: starting the trace at
    # z = objectDistance makes every float32 intersection lose
    # ~objectDistance * 2^-24 of absolute precision (the reference degrades
    # the same way beyond ~100m focus).  Advancing the origin along the ray
    # to z ~ 1 (front vertex is at z = 0 by construction) leaves the ray
    # line identical but keeps all positions O(1).
    d0 = optics.normalize(direction)
    t0 = jnp.maximum((1.0 - origin.z) / d0.z, 0.0)
    origin = origin + d0.scale(t0)

    total = jnp.sum(p.thickness)  # float32 reduction, matches float accumulation

    # Iteration i touches element E-1-i; the running thickness subtracts
    # thickness[E-i] for i >= 1 (zoic.cpp:1066).
    idx = jnp.arange(e)
    rev = e - 1 - idx
    sub = jnp.where(idx == 0, 0.0, p.thickness[jnp.clip(e - idx, 0, e - 1)])
    # ior pair: i==0 -> (1.0, ior[E-1]); else (ior[E-i], ior[E-i-1])
    ior1 = jnp.where(idx == 0, 1.0, p.ior[jnp.clip(e - idx, 0, e - 1)])
    ior2 = p.ior[rev]

    def body(carry, elem):
        o, d, summed = carry
        curv, ap, s, n1, n2 = elem
        summed = summed - s
        center_z = summed - curv
        hit, _ = optics.ray_sphere_intersect(
            o, d, center_z, curv, reverse=True, cull_miss=False
        )
        nrm = optics.sphere_normal(hit, center_z, -curv)
        d_new, _ = optics.refract(d, nrm, n1, n2, check_tir=False)
        return (hit, d_new, summed), (hit, d_new)

    init = (origin, direction, total)
    _, (hits, dirs) = jax.lax.scan(
        body, init, (p.curvature[rev], p.aperture[rev], sub, ior1, ior2)
    )
    h_last = V3(hits.x[e - 1], hits.y[e - 1], hits.z[e - 1])
    d_last = V3(dirs.x[e - 1], dirs.y[e - 1], dirs.z[e - 1])
    return optics.line_plane_y0(h_last, d_last).z


def lens_centers(p: Prescription) -> Array:
    """``computeLensCenters`` (zoic.cpp:963-969): per-element sphere center
    z = cumulative thickness - curvature."""
    return jnp.cumsum(p.thickness) - p.curvature


def aperture_distance(p: Prescription, aperture_element: int) -> Array:
    """Film-to-iris distance: cumulative thickness through the aperture
    element inclusive (zoic.cpp:1678-1685)."""
    return jnp.sum(p.thickness[: aperture_element + 1])


def solve_lens(
    rx: lensfile.LensPrescription, config: CameraConfig
) -> Tuple[LensSystem, dict]:
    """Run the full raytraced-model setup pipeline (zoic.cpp:1615-1698),
    excluding the exit-pupil LUT (attached separately by
    :func:`zoic_tpu.pupil.build_lut`).

    Returns the compiled :class:`LensSystem` (``lut=None``) and a dict of the
    solver's derived quantities — the same numbers the reference logs, which
    double as golden test values.

    The whole pipeline runs as ONE jitted computation: eager per-op dispatch
    would cost a device round-trip per scalar op (expensive on remote-
    attached TPUs).
    """
    import functools

    jitted = functools.partial(
        _solve_lens_impl,
        aperture_element=rx.aperture_element,
        focal_length=float(config.focal_length),
        fstop=float(config.fstop),
        focal_distance=float(config.focal_distance),
        sensor_width=float(config.sensor_width),
        sensor_height=float(config.sensor_height),
    )
    return jax.jit(jitted)(from_lensfile(rx))


def _solve_lens_impl(
    p: Prescription,
    *,
    aperture_element: int,
    focal_length: float,
    fstop: float,
    focal_distance: float,
    sensor_width: float,
    sensor_height: float,
) -> Tuple[LensSystem, dict]:
    t1 = trace_focal_length(p)
    ratio = jnp.float32(focal_length) / t1.focal_length
    p2 = rescale(p, ratio)
    t2 = trace_focal_length(p2)

    user_ap = t2.focal_length / (2.0 * jnp.float32(fstop))
    # Clamp if the requested f-stop is wider than the iris allows.  The
    # reference compares the radius against the element's *diameter* value
    # (zoic.cpp:1668-1671) — a quirk preserved deliberately.  Prescriptions
    # without an iris row (ROC == 0) leave ``apertureElement`` uninitialized
    # in the reference (UB); we define aperture_element = -1: no clamp and
    # no iris cull.
    if aperture_element >= 0:
        iris_max = p2.aperture[aperture_element]
        user_ap = jnp.minimum(user_ap, iris_max)

    origin_shift = image_distance(p2, jnp.float32(focal_distance))
    ap_dist = aperture_distance(p2, aperture_element)
    centers = lens_centers(p2)

    film_diag = jnp.sqrt(
        jnp.float32(sensor_width) ** 2 + jnp.float32(sensor_height) ** 2
    )

    system = LensSystem(
        curvature=p2.curvature,
        thickness=p2.thickness,
        ior=p2.ior,
        abbe=p2.abbe,
        aperture=p2.aperture,
        center=centers,
        user_aperture_radius=user_ap,
        origin_shift=origin_shift,
        aperture_distance=ap_dist,
        focal_length_ratio=ratio,
        traced_focal_length=t2.focal_length,
        film_diagonal=film_diag,
        focal_distance=jnp.float32(focal_distance),
        lut=None,
        aperture_element=aperture_element,
    )
    report = {
        "traced_focal_length_raw": t1.focal_length,
        "principal_plane_raw": t1.principal_plane,
        "focal_point_raw": t1.focal_point,
        "focal_length_ratio": ratio,
        "traced_focal_length": t2.focal_length,
        "principal_plane": t2.principal_plane,
        "focal_point": t2.focal_point,
        "user_aperture_radius": user_ap,
        "image_distance": origin_shift,
        "aperture_distance": ap_dist,
    }
    return system, report


def log_report(report: dict) -> None:
    """Structured logging of the derived quantities, mirroring the
    reference's aligned ``%-40s %12.8f`` messages (zoic.cpp:1198-1224,
    1091-1092, 1655-1682)."""
    labels = {
        "principal_plane_raw": "[ZOIC] Principle Plane distance [cm]",
        "focal_point_raw": "[ZOIC] Focal point distance [cm]",
        "traced_focal_length_raw": "[ZOIC] Raytraced Focal Length [cm]",
        "focal_length_ratio": "[ZOIC] Focal length ratio",
        "principal_plane": "[ZOIC] Adj. PP distance [cm]",
        "focal_point": "[ZOIC] Adj. Focal point distance [cm]",
        "traced_focal_length": "[ZOIC] Adj. Raytraced Focal Length [cm]",
        "user_aperture_radius": "[ZOIC] User aperture radius [cm]",
        "image_distance": "[ZOIC] Image distance [cm]",
        "aperture_distance": "[ZOIC] Aperture distance [cm]",
    }
    for key, label in labels.items():
        if key in report:
            log.info("%-40s %12.8f", label, float(np.asarray(report[key])))
