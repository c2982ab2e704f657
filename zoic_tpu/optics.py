"""Vectorized geometric-optics primitives.

TPU-native rebuild of the reference's L1 optics math kernel
(reference: src/zoic.cpp:973-1049):

* ``raySphereIntersection``       (zoic.cpp:973-995)  -> :func:`ray_sphere_intersect`
* ``intersectionNormal``          (zoic.cpp:999-1004) -> :func:`sphere_normal`
* ``calculateTransmissionVector`` (zoic.cpp:1008-1025)-> :func:`refract`
* ``lineLineIntersection``        (zoic.cpp:1029-1039)-> :func:`line_line_zy`
* ``linePlaneIntersection``       (zoic.cpp:1043-1049)-> :func:`line_plane_y0`
* ``fastSin``/``fastCos``         (zoic.cpp:661-681)  -> :func:`fast_sin`/:func:`fast_cos`
* ``linearInterpolate``           (zoic.cpp:655-657)  -> :func:`lerp`

Everything operates on *components*: vectors are ``(x, y, z)`` triples of
arrays of any (broadcast-compatible) shape.  This structure-of-arrays form is
what the VPU wants — each component is one full vector register lane set —
and the identical functions run unchanged inside Pallas kernel bodies and in
plain jnp code.  Branches become masks; every function is shape-polymorphic
and jit/vmap/scan-safe.

All math is float32 (the reference's working precision; AtVector is float).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Scalar = Union[float, Array]

# float32 pi, matching Arnold's AI_PI literal in float arithmetic.
PI = 3.14159265358979323
PI_OVER_2 = PI / 2.0
PI_OVER_4 = 0.78539816339  # literal used by the reference (zoic.cpp:695)


class V3(NamedTuple):
    """A 3-vector as three same-shaped arrays (SoA)."""

    x: Array
    y: Array
    z: Array

    def __add__(self, o: "V3") -> "V3":
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "V3") -> "V3":
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def scale(self, s: Scalar) -> "V3":
        return V3(self.x * s, self.y * s, self.z * s)

    def neg(self) -> "V3":
        return V3(-self.x, -self.y, -self.z)


def v3(x: Scalar, y: Scalar, z: Scalar, dtype=jnp.float32) -> V3:
    return V3(jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype))


def dot(a: V3, b: V3) -> Array:
    return a.x * b.x + a.y * b.y + a.z * b.z


def norm2(a: V3) -> Array:
    return dot(a, a)


def normalize(a: V3) -> V3:
    """AiV3Normalize equivalent: a / |a| via rsqrt."""
    inv = jax.lax.rsqrt(norm2(a))
    return a.scale(inv)


def where_v3(mask: Array, a: V3, b: V3) -> V3:
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def lerp(perc: Scalar, a: Scalar, b: Scalar) -> Array:
    """linearInterpolate (zoic.cpp:655-657): a + perc * (b - a)."""
    return a + perc * (b - a)


def fast_sin(x: Array) -> Array:
    """The reference's Bhaskara-style sine approximation (zoic.cpp:661-668).

    The approximation itself — not an accurate sine — is part of the
    reference's numerics (it feeds the concentric disk map and the LUT
    rotation), so it is reproduced op-for-op for bit parity.
    Assumes ``x + pi >= 0`` (true for every call site).
    """
    x = jnp.fmod(x + PI, PI * 2) - PI
    B = 4.0 / PI
    C = -4.0 / (PI * PI)
    y = B * x + C * x * jnp.abs(x)
    P = 0.225
    return P * (y * jnp.abs(y) - y) + y


def fast_cos(x: Array) -> Array:
    """fastCos (zoic.cpp:671-681): fast_sin shifted by pi/2."""
    return fast_sin(x + PI * 0.5)


def ray_sphere_intersect(
    origin: V3,
    direction: V3,
    center_z: Scalar,
    radius: Scalar,
    *,
    reverse: bool,
    cull_miss: bool,
) -> Tuple[V3, Array]:
    """Ray/sphere intersection for an on-axis sphere at ``(0, 0, center_z)``.

    Mirrors ``raySphereIntersection`` (zoic.cpp:973-995): the direction is
    normalized internally; with a *signed* radius the intersection picks the
    surface facing the incoming ray (``sign`` flip), and ``reverse`` selects
    the near solution (used by the backwards focus trace).  When
    ``cull_miss`` (the reference's ``tracingRealRays``) the ray "misses" when
    its closest approach exceeds |radius|; otherwise the square root of the
    absolute discriminant keeps the trace alive (paraxial solver behavior).

    Returns ``(hit_point, miss_mask)``.  When ``miss_mask`` is True the hit
    point is undefined (caller must mask), matching the reference's
    early-return leaving the output untouched.
    """
    d = normalize(direction)
    L = V3(0.0 - origin.x, 0.0 - origin.y, center_z - origin.z)
    tca = dot(L, d)
    r2 = radius * radius
    d2 = norm2(L) - tca * tca
    miss = (d2 > r2) if cull_miss else jnp.zeros_like(tca, dtype=bool)
    thc = jnp.sqrt(jnp.abs(r2 - d2))
    sign = jnp.where(radius < 0.0, -1.0, 1.0).astype(jnp.float32)
    t = tca - thc * sign if reverse else tca + thc * sign
    hit = origin + d.scale(t)
    return hit, miss


def sphere_normal(hit: V3, center_z: Scalar, radius: Scalar, *, exact: bool = True) -> V3:
    """Surface normal at ``hit`` on the on-axis sphere (zoic.cpp:999-1004):
    ``normalize(center - hit) * sign(radius)``.

    With ``exact=False``, uses the algebraic identity
    ``|center - hit| == |radius|`` to replace the rsqrt with a single divide
    by the signed radius — same value to ~1 ulp, cheaper on the VPU.
    """
    c = V3(0.0 - hit.x, 0.0 - hit.y, center_z - hit.z)
    if exact:
        sign = jnp.where(radius < 0.0, -1.0, 1.0).astype(jnp.float32)
        return normalize(c).scale(sign)
    inv_r = 1.0 / radius
    return c.scale(inv_r)


def refract(
    incident: V3,
    normal: V3,
    ior1: Scalar,
    ior2: Scalar,
    *,
    check_tir: bool,
    pre_normalized: bool = False,
) -> Tuple[V3, Array]:
    """Snell refraction (``calculateTransmissionVector``, zoic.cpp:1008-1025).

    ``eta = ior1 / ior2`` (the reference's ``ior2 == 1 ? ior1 : ior1/ior2``
    is the same value).  Total internal reflection is only *flagged* when
    ``check_tir`` (the reference's ``tracingRealRays``) and only when
    ``ior1 > ior2`` — the refracted vector is still produced with
    ``sqrt(abs(1 - cs2))``, matching the reference's unconditional write.

    Returns ``(transmitted, tir_mask)``.
    """
    i = incident if pre_normalized else normalize(incident)
    n = normal if pre_normalized else normalize(normal)
    eta = ior1 / ior2
    c1 = -dot(i, n)
    cs2 = (eta * eta) * (1.0 - c1 * c1)
    if check_tir:
        tir = (ior1 > ior2) & (cs2 > 1.0)
    else:
        tir = jnp.zeros_like(cs2, dtype=bool)
    k = eta * c1 - jnp.sqrt(jnp.abs(1.0 - cs2))
    t = V3(i.x * eta + n.x * k, i.y * eta + n.y * k, i.z * eta + n.z * k)
    return t, tir


def line_plane_y0(origin: V3, direction: V3) -> V3:
    """Intersection of a ray with the plane y = 0
    (``linePlaneIntersection``, zoic.cpp:1043-1049).

    The reference builds this from a generic plane equation whose constant
    term is exactly zero (its plane point ``(100,0,100)`` normalized has
    y = 0), so it reduces to ``origin + d_norm * (-origin.y / d_norm.y)``.
    """
    d = normalize(direction)
    t = (0.0 - origin.y) / d.y
    return origin + d.scale(t)


def line_line_zy(p1: V3, p2: V3, p3: V3, p4: V3) -> Tuple[Array, Array]:
    """2D line-line intersection in the (z, y) plane through point pairs
    (p1,p2) and (p3,p4) (``lineLineIntersection``, zoic.cpp:1029-1039).

    Returns ``(z, y)`` of the intersection — the reference returns these as
    ``AtVector2(x=z, y=y)`` and reads ``.x`` for the principal-plane z.
    """
    a1 = p2.y - p1.y
    b1 = p1.z - p2.z
    c1 = a1 * p1.z + b1 * p1.y
    a2 = p4.y - p3.y
    b2 = p3.z - p4.z
    c2 = a2 * p3.z + b2 * p3.y
    delta = a1 * b2 - a2 * b1
    return (b2 * c1 - b1 * c2) / delta, (a1 * c2 - a2 * c1) / delta
