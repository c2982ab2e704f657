"""Fused Pallas TPU kernels for the camera hot paths.

The reference's per-ray hot loop (src/zoic.cpp:1752-1964: sample aperture ->
trace element stack -> retry up to 25 times on vignette) is rebuilt here as
single fused TPU kernels over (rows, 128) ray tiles:

* the element loop is fully unrolled in-kernel (element scalars prefetched
  to SMEM), keeping every intermediate in VMEM/registers — the ``lax.scan``
  formulation pays a full HBM round-trip of the ray state per element
  (~25ms/M rays measured on v5e); the fused kernel reads each ray's inputs
  once and writes outputs once;
* the resample-retry loop runs in-kernel with a counter-hash PRNG
  (:func:`_hash_uniform`) whose per-ray counter is the ray's own try count,
  so retry *scheduling* cannot change results — which enables the
  in-kernel straggler compaction (fold eras + bitonic unsort, see
  ``_compaction_schedule``) that keeps late retry rounds running on a
  small row prefix instead of the whole tile;
* aperture-sample shaping (naive first-element or exit-pupil LUT,
  zoic.cpp:1873-1924) and the pupil-precheck profile are computed in-kernel
  from small SMEM tables (``_shaping_from_table``) — the kernel is bound by
  per-grid-step fixed costs, so streaming 7 precomputed per-ray planes from
  HBM costs more than recomputing them per tile.

Per-element math uses two algebraic identities over the reference ops (both
documented at the site): the sphere normal divides by the signed radius
instead of renormalizing (|center-hit| == |radius|), and ray directions are
normalized once per attempt rather than once per element (Snell of unit
vectors returns unit vectors).  Agreement with the exact jnp path is ~1e-6,
well inside the 1e-5 parity gate (tests/test_pallas.py).

Image-based bokeh also rides the fused kernels: attempt-0 offsets are
pre-sampled through the CDF outside, and retry redraws stream in as a few
per-round offset planes reused with distinct row rotations (exact per-ray
draw distribution; cross-ray sharing documented in PARITY.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..optics import PI, PI_OVER_2, PI_OVER_4
from ..system import LensSystem

Array = jnp.ndarray

LANES = 128
DEF_TILE_ROWS = 64   # thin-lens tile sweet spot on v5e (r1 sweep)
DEF_RT_TILE_ROWS = 128  # raytraced tile: with in-kernel straggler
# compaction the old small-tile advantage (early exit soon after the
# slowest ray) disappears and amortizing the fixed per-grid-step cost wins
# (r2 sweep, compacted: 64: 357M, 128: 403M, 256: 332M rays/s — 256 loses
# to fold-scan cost growing with rows)


def _pack_elements(lens: LensSystem) -> Array:
    """Pack per-element trace constants into an f32[E, 8] SMEM table:
    [center_z, eta_sq, inv_curvature, r_sq, cull_r_sq, eta, tir_thr,
    sign_r].  ``eta_sq = eta*eta`` is precomputed — the refract chain
    needs it every element and a packed constant beats a hot-loop
    multiply (the curvature itself is derivable from r_sq/sign and was
    never read).

    ``tir_thr`` is the cs2 threshold for total internal reflection: 1.0
    where TIR is possible (ior decreasing, zoic.cpp:1135) and +inf where it
    is not — folding the reference's ``ior > ior_next`` gate into the
    compare itself saves a vector AND per element in the hot loop."""
    e = lens.count
    ior_next = jnp.concatenate([lens.ior[1:], jnp.ones((1,), jnp.float32)])
    half_ap = lens.aperture * 0.5
    cull_r_sq = half_ap * half_ap
    if lens.aperture_element >= 0:
        ua_sq = lens.user_aperture_radius * lens.user_aperture_radius
        cull_r_sq = cull_r_sq.at[lens.aperture_element].set(
            jnp.minimum(cull_r_sq[lens.aperture_element], ua_sq)
        )
    eta = lens.ior / ior_next
    tir_thr = jnp.where(lens.ior > ior_next, 1.0, jnp.inf).astype(jnp.float32)
    sign_r = jnp.where(lens.curvature < 0.0, -1.0, 1.0).astype(jnp.float32)
    return jnp.stack(
        [
            lens.center,
            eta * eta,
            1.0 / lens.curvature,
            lens.curvature * lens.curvature,
            cull_r_sq,
            eta,
            tir_thr,
            sign_r,
        ],
        axis=1,
    )


def _fast_sin(x):
    # zoic.cpp:661-668 semantics (see optics.fast_sin)
    x = x - jnp.floor((x + PI) / (2 * PI)) * (2 * PI)
    b = 4.0 / PI
    c = -4.0 / (PI * PI)
    y = b * x + c * x * jnp.abs(x)
    p = 0.225
    return p * (y * jnp.abs(y) - y) + y


def _fast_cos(x):
    return _fast_sin(x + PI * 0.5)


def _sin_poly(x):
    """The fastSin quadratic-fit polynomial WITHOUT range reduction —
    callers guarantee x in [-pi, pi] (the poly equals zoic.cpp:661-668
    exactly there: its floor reduction is the identity on that range;
    both endpoints evaluate to 0 either way)."""
    b = 4.0 / PI
    c = -4.0 / (PI * PI)
    y = b * x + c * x * jnp.abs(x)
    p = 0.225
    return p * (y * jnp.abs(y) - y) + y


def _concentric(u1, u2):
    """Concentric disk map, zoic.cpp:686-704 semantics (see
    sampling.concentric_disk_sample), restructured per the measured
    roofline (PERF_NOTES r3): ONE divide (num/den selected by branch)
    instead of two, and the fastSin floor reductions replaced by a single
    conditional 2pi shift — phi is in (-pi/4, 3pi/4], so sin needs no
    reduction and cos(phi) = sin(phi + pi/2) needs one subtract iff
    phi > pi/2 (bit-equal to the floor form on this range)."""
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    use_a = (a * a) > (b * b)
    r = jnp.where(use_a, a, b)
    num = jnp.where(use_a, b, a)
    den = jnp.where(use_a, a, b)
    den = jnp.where(den == 0.0, 1.0, den)
    q = PI_OVER_4 * (num / den)
    phi = jnp.where(use_a, q, PI_OVER_2 - q)
    xc = phi + PI * 0.5
    xc = jnp.where(xc > PI, xc - 2 * PI, xc)
    return r * _sin_poly(xc), r * _sin_poly(phi)


def _fast_sqrt(x):
    """sqrt(x) for x >= 0 as x * rsqrt(x): the measured v5e rooflines are
    sqrt 3.7 cycles vs rsqrt 1.0 (PERF_NOTES r3), and the ~2-ulp error is
    far inside the 1e-5 parity gate.  The max() guard keeps x=0 exact
    (0 * rsqrt(tiny) = 0) instead of 0 * inf = NaN."""
    return x * jax.lax.rsqrt(jnp.maximum(x, jnp.float32(1e-35)))


def _trace_block(elems_ref, n_elems, ox, oy, oz, dx, dy, dz,
                 iris_idx=-1, flags=()):
    """Unrolled element-stack trace on one ray tile (values, not refs).

    Returns (ox, oy, oz, dx, dy, dz, ok, tir_any) with the reference's
    frozen-state failure semantics (zoic.cpp:1099-1158): a ray that misses
    / culls / TIRs keeps the position of its last reached hit and its
    pre-failure direction.  Directions are normalized once here; see module
    docstring for the precision argument.

    Restructured in r3 against the measured VPU roofline (PERF_NOTES):
    ~49 cycles/element vs ~66 for the mask-chain form.  The per-element
    control state is ONE latched ``fail`` flag; position updates merge
    through 3 selects, direction updates through a masked (eta, k) pair
    (fail -> (1, 0), i.e. identity) instead of per-component selects; both
    sqrts use the rsqrt form; the TIR gate is a single compare against the
    packed per-element threshold (1 or +inf).

    The chord distance uses the perpendicular-component form
    ``d2 = |L - tca*d|^2`` rather than ``|L|^2 - tca^2``: for rays near
    the axis the two squares cancel catastrophically (measured max rel
    error 1.3e-1 vs 1.7e-4 on the A/B batch), wide enough that borderline
    aperture culls flipped between differently-fused XLA programs and made
    the compaction A/B gates flaky.  Costs ~1 extra op/element; buys
    ~800x tighter cull margins."""
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv, dy * inv, dz * inv
    fail = jnp.zeros_like(ox, dtype=jnp.bool_)
    tir_any = jnp.zeros_like(ox, dtype=jnp.bool_)

    for i in range(n_elems):
        cz = elems_ref[i, 0]
        eta_sq = elems_ref[i, 1]
        inv_r = elems_ref[i, 2]
        r_sq = elems_ref[i, 3]
        cull_r_sq = elems_ref[i, 4]
        eta = elems_ref[i, 5]
        # static per-element flags (LensSystem.elem_flags) replace the
        # packed sign_r multiply and the tir_thr compare when present —
        # both are topological, stable across focus/rescale
        can_tir = (flags[i] & 1) if flags else None
        neg_r = (flags[i] & 2) if flags else None
        tir_thr = None if flags else elems_ref[i, 6]
        sign_r = None if flags else elems_ref[i, 7]

        # sphere intersect with the on-axis center (0, 0, cz):
        # L = c - o has Lx = -ox, Ly = -oy, so the dot products reduce
        lz = cz - oz
        tca = lz * dz - (ox * dx + oy * dy)
        # perpendicular component of L w.r.t. d (signs fold into squares)
        px = ox + tca * dx
        py = oy + tca * dy
        pz = lz - tca * dz
        d2 = px * px + py * py + pz * pz
        thc = _fast_sqrt(jnp.abs(r_sq - d2))
        if flags:
            t = tca - thc if neg_r else tca + thc
        else:
            t = tca + thc * sign_r
        hx = ox + dx * t
        hy = oy + dy * t
        h2 = hx * hx + hy * hy
        fail = fail | (d2 > r_sq) | (h2 > cull_r_sq)

        # move live rays only: frozen state = last reached hit
        ox = jnp.where(fail, ox, hx)
        oy = jnp.where(fail, oy, hy)
        oz = jnp.where(fail, oz, oz + dz * t)

        if i == iris_idx:
            # Iris: packed eta == 1.0 (gated statically by
            # LensSystem.iris_identity) makes the refract chain the
            # bit-exact identity: tir_thr = +inf (no TIR), and
            # k = c1 - |c1| = 0 because c1 ~ |dz| + O(1/R) > 0 at the
            # flattened (R ~ 1e5) stop for every forward ray — so
            # d' = 1*d - 0*w IS d, bitwise.  Skips ~20 ops/attempt;
            # the oracle 1e-5 gates run with the skip active.
            continue

        # refract via the unscaled w = c - hit (one inv_r scale on the dot
        # and one on k instead of three on the normal components):
        # c1 = -(d . w)/R = ((ox dx + oy dy) - wz dz) * inv_r
        wz = cz - oz
        c1 = ((ox * dx + oy * dy) - wz * dz) * inv_r
        cs2 = eta_sq * (1.0 - c1 * c1)
        if flags and not can_tir:
            pass  # ior non-decreasing: TIR impossible (zoic.cpp:1135)
        else:
            thr = jnp.float32(1.0) if flags else tir_thr
            tir = (cs2 > thr) & ~fail
            tir_any = tir_any | tir
            fail = fail | tir
        k = eta * c1 - _fast_sqrt(jnp.abs(1.0 - cs2))
        # failed rays refract by the identity: d' = 1*d + 0*w
        kk = jnp.where(fail, 0.0, k * inv_r)
        ee = jnp.where(fail, 1.0, eta)
        dx = dx * ee - ox * kk
        dy = dy * ee - oy * kk
        dz = dz * ee + wz * kk

    return ox, oy, oz, dx, dy, dz, ~fail, tir_any


def _lane_ids(shape, row_base):
    """Globally unique int32 id per ray lane: (row_base + row) * 128 + lane."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (row_base + rows) * LANES + lanes


def _hash_uniform(ids, seed, rnd, salt):
    """Counter-based U[0,1): murmur3-style integer mixer over
    (ray id, seed, retry round, stream salt).

    The counted-key analog of the reference's shared ``xor128() / 2^32``
    stream (zoic.cpp:1806) — deterministic, stateless, and identical across
    compiled TPU and interpreter runs (the hardware PRNG primitive is a
    zero stub under ``InterpretParams``, which is why this is a hash and
    not ``pltpu.prng_random_bits``).
    """
    h = (
        ids.astype(jnp.uint32) * jnp.uint32(2654435761)
        + seed.astype(jnp.uint32)
        + (rnd.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        + jnp.uint32(salt)
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    # 24-bit value via int32: Mosaic has no uint32->f32 conversion
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(2.0**-24)


PRECHECK_DRAWS = 4  # candidate draws per retry round in profile mode (6 measured -4.5%)
_DEBUG_ROUND0_ONLY = False  # diagnostics: return state right after round 0
_DEBUG_NO_UNSORT = False  # diagnostics: emit raw packed words, skip unsort

BOKEH_PLANES = 4  # streamed retry-draw planes in presampled (bokeh) mode

# Compacted-machine i32 state is ONE packed plane per ray:
#   bit 0      ok flag
#   bits 1-6   tries   (compact requires max_total+1 < 64)
#   bits 7-12  tir count
#   bits 13+   home row within the tile (sort key: row occupies the high
#              bits, so ascending-packed order IS home-row order per lane)
# Global ray ids for the PRNG are recomputed as
# (row_base + home_row) * 128 + lane, bit-identical to the uncompacted
# path's _lane_ids.  One plane instead of four (ids/tries/tir/ok) cuts
# fold-swap traffic and carries the retry results through the unsort key.


def _pk_make(ok_i, tries, tir, row):
    return ok_i | (tries << 1) | (tir << 7) | (row << 13)


def _pk_fields(p):
    return p & 1, (p >> 1) & 63, (p >> 7) & 63, p >> 13


def _pk_pending(p, max_total):
    return ((p & 1) == 0) & (((p >> 1) & 63) < max_total)


def _plane_layout(use_lut: bool, use_profile: bool):
    """f32 scratch-plane name -> index for the compacted retry machine.
    Shaping planes exist only in LUT mode (naive shaping is scalar);
    profile planes only when the pupil pre-check is active."""
    names = ["fx", "fy", "ox", "oy", "oz", "dx", "dy", "dz"]
    if use_lut:
        # folded shaping affine (sa, sb, kx, ky): see attempt_on — the
        # scale/translate/rotate chain and the film-point subtraction
        # collapse into 4 per-ray coefficients, so each traced attempt
        # costs 4 fmas instead of the 8-op ms/trn/sn/cs chain
        names += ["sa", "sb", "kx", "ky"]
    if use_profile:
        names += ["pc0", "pc1", "pc2", "pc4"]
    return {n: i for i, n in enumerate(names)}


def _atan(x):
    """atan on [0, 1] (cephes atanf reduction at tan(pi/8)); ~2ulp f32."""
    big = x > 0.4142135623730950
    xr = jnp.where(big, (x - 1.0) / (x + 1.0), x)
    t = xr * xr
    p = jnp.float32(8.05374449538e-2)
    p = p * t - jnp.float32(1.38776856032e-1)
    p = p * t + jnp.float32(1.99777106478e-1)
    p = p * t - jnp.float32(3.33329491539e-1)
    y = xr + xr * t * p
    return jnp.where(big, y + jnp.float32(PI_OVER_4), y)


def _atan2(y, x):
    """Polynomial atan2 (Mosaic has no atan2 primitive); matches
    jnp.arctan2 to ~5e-7 absolute, well inside the 1e-5 parity gate."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = num / jnp.maximum(den, jnp.float32(1e-30))
    a = _atan(r)
    a = jnp.where(swap, jnp.float32(PI_OVER_2) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(PI) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _shaping_from_table(shap_ref, prof_ref, n_keys, spacing, inv_dmax,
                        fx, fy, use_lut, use_profile, use_poly,
                        circles=False):
    """In-kernel LUT/profile lookup: the uniform-key bracketing + lerp of
    pupil.lut_lookup / pupil.profile_lookup, with the per-lane table gather
    as an n_keys-step select chain over SMEM scalars.  Runs once per tile —
    streaming the 7 per-ray results from HBM costs more than recomputing
    them (the kernel is grid-DMA-bound; see PERF_NOTES).

    ``use_poly`` evaluates the profile coefficients from ``prof_ref``
    (Horner in t = clamp(dist/dmax, 0, 1); pupil.fit_profile_poly) in
    4*(D+1) fmas instead of adding 4 columns to the select chain — the
    chain's profile share measured ~0.365 ms/M with the round-0 scan
    (gapbench floor-prof, PERF_NOTES r4)."""
    dist = jnp.sqrt(fx * fx + fy * fy)
    # ceil(dist / spacing), NOT ceil(dist * (1/spacing)): the reciprocal-
    # multiply can round differently at key multiples and flip the bracket
    # vs pupil.lut_lookup / the C++ oracle (ADVICE r2)
    i_lb = jnp.clip(
        jnp.ceil(dist / spacing).astype(jnp.int32), 0, n_keys - 1
    )
    i_prev = jnp.maximum(i_lb - 1, 0)
    lower = i_lb.astype(jnp.float32) * spacing
    prev = i_prev.astype(jnp.float32) * spacing
    denom = prev - lower
    perc = jnp.where(denom != 0.0, (dist - lower) / denom, 0.0)
    perc = jnp.where(dist == 0.0, 0.0, perc)

    chain_profile = use_profile and not use_poly
    cols = ([0, 1] if use_lut else []) + (
        [2, 3, 4, 5] if chain_profile else []
    )
    lb = [jnp.zeros_like(fx) for _ in cols]
    pr = [jnp.zeros_like(fx) for _ in cols]
    for k in range(n_keys):
        sel_lb = i_lb == k
        sel_pr = i_prev == k
        for j, c in enumerate(cols):
            v = shap_ref[k, c]
            lb[j] = jnp.where(sel_lb, v, lb[j])
            pr[j] = jnp.where(sel_pr, v, pr[j])
    # lerp(perc, at_lb, at_prev)  (zoic.cpp:1910-1911 orientation)
    vals = [a + perc * (b - a) for a, b in zip(lb, pr)]

    out = {}
    if use_lut:
        out["ms"], out["trn"] = vals[0], vals[1]
        theta = _atan2(fy, fx)
        out["sn"] = _fast_sin(theta)
        out["cs"] = _fast_cos(theta)
        vals = vals[2:]
    if chain_profile:
        out["pc0"], out["pc1"], out["pc2"], out["pc4"] = vals
    elif use_profile:
        # t normalizer is the poly's own fit-domain edge (poly_scale =
        # min(film-corner radius, keys[-1]), pupil.fit_precheck_poly); film
        # radii beyond it (|sx| > 1 overscan callers) are outside the
        # fitted/validated domain, so the pre-check is DISABLED for those
        # rays (bound -> +inf: every candidate passes to a full trace)
        # instead of evaluating the unfitted extrapolation (ADVICE r4 #2).
        t_raw = dist * inv_dmax
        t = jnp.minimum(t_raw, 1.0)
        deg = prof_ref.shape[1] - 1
        for j, name in enumerate(("pc0", "pc1", "pc2", "pc4")):
            acc = jnp.zeros_like(t) + prof_ref[j, deg]
            for k in range(deg - 1, -1, -1):
                acc = acc * t + prof_ref[j, k]
            out[name] = acc
        big = jnp.float32(1e9)
        off = t_raw > 1.0
        if circles:
            # circle slots are (a1, q1, a2, q2): disable = q -> +inf (a
            # must stay finite — a huge center would reject half the disk)
            out["pc1"] = jnp.where(off, big, out["pc1"])
            out["pc4"] = jnp.where(off, big, out["pc4"])
        else:
            out["pc0"] = jnp.where(off, big, out["pc0"])
    if use_profile and circles:
        # pre-double the circle centers: _bound_pass computes
        # rho^2 - 2 a lx as one fma per circle (2 a arrives here)
        out["pc0"] = out["pc0"] * 2.0
        out["pc2"] = out["pc2"] * 2.0
    return out


def _prep_retry_planes(retry_u1, retry_u2, tile_rows):
    """Shape [P, Bp] presampled retry-draw planes for streaming.

    ``Bp`` may be SMALLER than the ray batch: grid tiles read plane block
    ``i % plane_tiles``, so a quarter-size plane serves the whole batch
    with 4-way cross-tile sharing.  Retry draws are shared across rays by
    construction (position-based assignment, PARITY.md), so shrinking the
    planes only widens that sharing — each cell is still an iid draw from
    the bokeh CDF — while cutting the dominant per-generation
    ``bokeh.sample`` cost.  Short planes wrap (tile) rather than zero-pad
    so padded rows keep the bokeh distribution.

    Returns ([u1_planes, u2_planes] shaped (P, R, 128), plane_tiles)."""
    n_planes, bp = retry_u1.shape
    tile_area = tile_rows * LANES
    target = -(-bp // tile_area) * tile_area
    planes = []
    for pa in (retry_u1, retry_u2):
        if target > bp:
            reps = -(-target // bp)
            pa = jnp.tile(pa, (1, reps))[:, :target]
        planes.append(pa.reshape(n_planes, target // LANES, LANES))
    return planes, target // tile_area


def _plane_draws(bu1_ref, bu2_ref, h, base, count, plane_tiles):
    """Materialize ``count`` streamed retry-draw plane pairs on rows
    [0, h), for global draw indices ``base .. base+count-1``.

    Draw index ``idx`` reads plane ``idx % P`` under a distinct (row,
    lane) rotation per reuse cycle ``idx // P`` (rotation schedule shared
    with the uncompacted loop); ``plane_tiles`` adds the cross-tile
    reuse-index rotation (ADVICE r3) when grid tiles share plane blocks.
    Each (plane, rotation) pair is unique per draw index and positions
    within a round are distinct, so every plane cell is consumed by at
    most one ray per draw index — draws stay iid bokeh samples under
    position-based assignment (PARITY.md)."""
    outs = []
    n_p = bu1_ref.shape[0]
    for j in range(count):
        idx = base + j
        cyc = idx // n_p
        pidx = idx - cyc * n_p
        u1 = bu1_ref[pl.ds(pidx, 1), 0:h, :].reshape(h, LANES)
        u2 = bu2_ref[pl.ds(pidx, 1), 0:h, :].reshape(h, LANES)
        sh = (3 * cyc) % h
        lsh = (7 * (cyc // 8)) % LANES
        u1 = _roll_rows_dyn(u1, sh, max_shift=h)
        u2 = _roll_rows_dyn(u2, sh, max_shift=h)
        u1 = _roll_lanes_dyn(u1, lsh)
        u2 = _roll_lanes_dyn(u2, lsh)
        if plane_tiles:
            t_reuse = pl.program_id(0) // plane_tiles
            tsh = (t_reuse * 5) % h
            tlsh = (t_reuse * 21) % LANES
            u1 = _roll_rows_dyn(u1, tsh, max_shift=h)
            u2 = _roll_rows_dyn(u2, tsh, max_shift=h)
            u1 = _roll_lanes_dyn(u1, tlsh)
            u2 = _roll_lanes_dyn(u2, tlsh)
        outs.append((u1, u2))
    return outs


def _compaction_schedule(rows: int, max_total: int,
                         dead_heavy: bool = False,
                         draws_per_round: int = 1,
                         era3_h: int = 8,
                         era3_rounds: int = 1,
                         era2_drain: bool = False,
                         era3_far_every: int = 1,
                         bulk_draws: int = 0,
                         skip_era1: bool = False,
                         r0_burned: bool = False):
    """Era pyramid for in-kernel straggler compaction.

    Each era = (region_h, fold_src_offsets, rounds_per_rep, max_reps,
    drain_above): fold passes swap pending rays from rows [src, src+h)
    into done lanes of rows [0, h), then retry rounds run on rows [0, h)
    only.  ``drain_above`` (when not None) makes the era's while-loop
    exit as soon as no ray at row >= drain_above is pending — the era's
    JOB is to evacuate the high rows, and it keeps folding until they
    are clear, so LATER eras never need fold sources up there.

    ``max_reps == 0`` means the era runs ONCE as straight-line code — no
    while loop.  The r3 shape (exhaustive mid era + narrow final era)
    replaced the r2 full-sweep final era when the floor measurement moved
    the fold:attempt cost ratio: scanning all rows//era3_h fold sources
    per final-era rep cost ~90 tile-equivalent ops against a 35-op
    region round (PERF_NOTES r3 "era2-exhaustive" section).

    ``dead_heavy`` selects the low-acceptance regime (lens.dead_frac high:
    fisheye-class designs where a large film fraction is vignetted by
    design, zoic.cpp:1458-1544): those rays stay pending until the budget
    exhausts, so folds cannot shrink the working set — run whole-tile
    rounds (each consuming ``draws_per_round`` draws via the pre-check)
    until the budget drains, then a small pyramid mops up stragglers.

    ``r0_burned`` (r4): round 0's pre-check scan already covered the WHOLE
    try budget (round0_draws >= max_total), so dead rays arrive here with
    tries == max_total — no bulk budget-burn era is needed, and the only
    pending rays are failed-trace stragglers (~2% measured on the
    telephoto/petzval class), which the ordinary fold pyramid resolves
    without further whole-tile traces.  The bulk era cost 3-4 full-tile
    traces per tile for those stragglers alone (telephoto focus-30
    measured 145M with the bulk era; the budget-burn work itself is
    ~26 x 50 pre-check ops/ray either way)."""
    if dead_heavy and not r0_burned:
        # budget-burn rounds are whole-tile (16 vregs of ILP ->
        # throughput-bound), so they take a HIGHER pre-check draw count
        # than the latency-bound prefix mop-up rounds: K applies per era
        # (measured: global K=13 wins on fisheye's budget rounds but
        # loses 1.6x through the mop-up pyramid; PERF_NOTES r3)
        bulk = bulk_draws if bulk_draws else draws_per_round
        n_budget = -(-max_total // max(bulk, 1)) + 1
        sched = [(rows, (), 1, n_budget, None, 1, bulk_draws)]
        if rows > era3_h:
            sched.append(
                (era3_h, tuple(range(era3_h, rows, era3_h)),
                 era3_rounds, max_total + 16, None, era3_far_every, None)
            )
        return sched
    sched = []
    if rows >= 16 and not skip_era1:
        h = rows // 2
        sched.append((h, (h,), 1, 1, None, 1, None))
    mid = rows // 4
    top = rows
    if rows >= 32 and era2_drain and mid > era3_h:
        # exhaustive mid era: fold until rows [mid, rows) hold no pending
        # ray, so the final era's sources stay inside [era3_h, mid).
        # Pays when rounds are cheap single-draw (no pre-check): +12%
        # measured (393 -> 441M no-precheck).  With the 4-draw pre-check
        # the extra h=mid rounds cost more than the final era's wide
        # fold sweeps they replace (-2.4%), so era2_drain stays off for
        # profile mode (PERF_NOTES r3).
        sched.append(
            (mid, (mid, 2 * mid, 3 * mid), 1, max_total + 16, mid, 1, None)
        )
        top = mid
    elif rows >= 32:
        sched.append((mid, (mid, 2 * mid, 3 * mid), 1, 2, None, 1, None))
    if rows > era3_h:
        # final-era knobs (era3_h, era3_rounds) are static sweep
        # parameters (PERF_NOTES r3 schedule sweep).  r2-rejected
        # variants under the OLD cost model: 2 rounds/rep -6%, rotating
        # 4 sources/rep via dynamic pl.ds slices -12%.
        sched.append(
            (era3_h, tuple(range(era3_h, top, era3_h)),
             era3_rounds, max_total + 16, None, era3_far_every, None)
        )
    return sched


def _sched_group_stride(sched, rows):
    """Largest row-class stride the fold schedule preserves: the gcd of
    every fold source offset.  Rays never leave their row class mod g, so
    the unsort can run as independent (rows//g)-member grouped bitonics.
    Returns ``rows`` when the schedule has no folds at all (rays never
    move -> the unsort is the identity and can be skipped)."""
    import math

    g = 0
    for _h, srcs, _r, _m, _d, _f, _k in sched:
        for o in srcs:
            g = math.gcd(g, o)
    return g if g else rows


def _run_compaction(st_f, st_i, n_f32, rows, max_total, region_round,
                    sched):
    """Drive the era-fold straggler compaction over VMEM scratch state.

    ``st_f`` holds ``n_f32`` per-ray f32 planes, ``st_i[0]`` the packed
    ok/tries/tir/home-row word (see ``_pk_make``).  ``region_round(h)``
    runs one model-specific retry round on rows [0, h) of the scratch.
    Fold passes swap pending rays (with all their planes) into done lanes
    of the shrinking row prefix; a guard of full-tile rounds bounds
    pathological acceptance rates.  Scheduling is invisible to results as
    long as the round's PRNG counters are per-ray try counts."""

    def any_pending(above=None):
        p = _pk_pending(st_i[0, :, :], max_total)
        if above is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
            p = p & (row >= above)
        return jnp.any(p)

    def fold_pass(h, src_lo):
        # Unconditional vector code: predicating on "source has pending"
        # (jnp.any + pl.when) measured 2x SLOWER end-to-end — every branch
        # forces a VPU->scalar sync costing more than the swap it saves.
        p_d = st_i[0, 0:h, :]
        p_s = st_i[0, src_lo:src_lo + h, :]
        m = _pk_pending(p_s, max_total) & ~_pk_pending(p_d, max_total)
        for k in range(n_f32):
            a = st_f[k, 0:h, :]
            b = st_f[k, src_lo:src_lo + h, :]
            st_f[k, 0:h, :] = jnp.where(m, b, a)
            st_f[k, src_lo:src_lo + h, :] = jnp.where(m, a, b)
        st_i[0, 0:h, :] = jnp.where(m, p_s, p_d)
        st_i[0, src_lo:src_lo + h, :] = jnp.where(m, p_d, p_s)

    for h, srcs, n_rounds, max_rep, drain_above, far_every, era_k in sched:
        if max_rep == 0:
            for src_lo in srcs:
                fold_pass(h, src_lo)
            for _ in range(n_rounds):
                region_round(h, era_k)
            continue

        def era_cond(rep, max_rep=max_rep, drain_above=drain_above):
            return (rep < max_rep) & any_pending(drain_above)

        def era_body(rep, h=h, srcs=srcs, n_rounds=n_rounds,
                     far_every=far_every, era_k=era_k):
            if far_every > 1 and len(srcs) > 3:
                # throttled sweep: scan the 3 nearest fold sources every
                # rep, the full source list only every ``far_every``-th —
                # high-row stragglers wait a few reps (they have budget
                # to burn anyway) and the per-rep fold cost drops ~3x.
                # Branching here is ONE scalar compare on the rep counter
                # per rep, not the per-pass vector->scalar any() that
                # made predicated folds 2x slower (r2 note above).
                is_far = (rep % far_every) == (far_every - 1)

                @pl.when(is_far)
                def _():
                    for src_lo in srcs:
                        fold_pass(h, src_lo)

                @pl.when(jnp.logical_not(is_far))
                def _():
                    for src_lo in srcs[:3]:
                        fold_pass(h, src_lo)
            else:
                for src_lo in srcs:
                    fold_pass(h, src_lo)
            for _ in range(n_rounds):
                region_round(h, era_k)
            return rep + 1

        jax.lax.while_loop(era_cond, era_body, jnp.int32(0))

    # guard: full-tile rounds finish anything the eras left pending
    # (pathological acceptance rates); bounded by the try budget.
    def guard_cond(rep):
        return (rep < max_total + 2) & any_pending()

    def guard_body(rep):
        region_round(rows, None)
        return rep + 1

    jax.lax.while_loop(guard_cond, guard_body, jnp.int32(0))


def _bound_pass(lx, ly, pcs, circles):
    """Pre-check bound test for one candidate offset (the kernel's inner
    ~10 VPU ops).  ``circles`` (PupilProfile.kind == "circles") tests the
    2-circle intersection cover — centers arrive PRE-DOUBLED from
    _shaping_from_table so each circle is 1 fma + 1 compare, no
    rsqrt/trig; harmonic tests the polar cos-series bound."""
    if circles:
        a1d, q1, a2d, q2 = pcs
        rr = lx * lx + ly * ly
        return ((rr - a1d * lx) <= q1) & ((rr - a2d * lx) <= q2)
    pc0, pc1, pc2, pc4 = pcs
    rho2 = lx * lx + ly * ly
    # one shared rsqrt gives both rho and cphi = lx/rho (the div form
    # costs 1.8 cycles vs 1 for the mul; roofline r3)
    r_inv = jax.lax.rsqrt(jnp.maximum(rho2, 1e-18))
    rho = rho2 * r_inv
    cphi = lx * r_inv
    # Chebyshev: cos2 = 2c^2-1, cos4 = 2 cos2^2 - 1
    t2 = 2.0 * cphi * cphi - 1.0
    t4 = 2.0 * t2 * t2 - 1.0
    return rho <= pc0 + pc1 * cphi + pc2 * t2 + pc4 * t4


def _bound_dead(pcs, circles):
    """Whether the per-ray pre-check bound provably rejects the ENTIRE
    candidate domain (the dead-key short-circuit, r5).

    A ray on fully-vignetted film (fisheye edge, telephoto cat-eye cutoff:
    the reference burns all 26 retries tracing there, zoic.cpp:1927-1947)
    has a reject-all fitted bound (pupil.build_precheck emits ``q = -1`` /
    ``c0 = -1`` at keys with no accepted cover sample).  When the
    INTERPOLATED per-ray bound rejects every candidate, each of the ray's
    draws would be pre-check-rejected individually — so the whole budget
    can be consumed in O(1), skipping the scan.  Pure strength reduction:
    outputs (tries = budget, ok = 0, tir = 0, payload untouched) are
    bit-identical to running the scan, and per-ray PRNG counters mean no
    other ray's stream shifts.

    Candidates live in the unit disk (concentric map) or [-1, 1]^2 (bokeh
    offsets); both contain the x-axis segment ly = 0, |lx| <= 1, where the
    circle test's LHS attains its domain minimum, so one formula is sound
    for both domains.  Harmonic: all-reject iff max_phi B(phi) < 0,
    conservatively bounded by c0 + |c1| + |c2| + |c4| (rho >= 0 always).
    """
    if circles:
        a1d, q1, a2d, q2 = pcs  # centers pre-doubled (_shaping_from_table)
        def mn(a):
            # min over the domain of (lx^2 + ly^2 - a*lx): ly = 0,
            # lx = clamp(a/2, -1, 1) -> -a^2/4 inside, 1 - |a| outside
            aa = jnp.abs(a)
            return jnp.where(aa <= 2.0, -0.25 * a * a, 1.0 - aa)
        return (mn(a1d) > q1) | (mn(a2d) > q2)
    pc0, pc1, pc2, pc4 = pcs
    return (pc0 + jnp.abs(pc1) + jnp.abs(pc2) + jnp.abs(pc4)) < 0.0


def _round_core(
    attempt, seed, max_total, use_profile,
    ids, pcs, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count,
    draws=None, k_draws=PRECHECK_DRAWS, first_draws=None, dual=False,
    offset_draws=None, circles=False,
):
    """One batched retry round (the body of zoic.cpp's resample loop,
    1879-1947) on arrays of any (h, 128) shape.

    PRNG counter is the per-ray ``tries`` value, NOT a global round index:
    every ray consumes its own uniform stream in try order, so results are
    bit-identical under any retry scheduling (whole-tile loops, compacted
    regions) — the batched analog of the reference's sequential per-ray
    draw order.  ``draws`` (presampled-bokeh mode, no pre-check)
    overrides the hash draws with ONE externally-sampled aperture-offset
    plane pair for this round.  ``offset_draws`` (presampled +
    pre-check) is a LIST of ``k_draws`` offset plane pairs: the profile
    scan consumes them in order, testing each against the polar bound
    DIRECTLY — no concentric warp; bokeh offsets live in [-1,1]^2,
    which is why the profile must be square-domain-fitted
    (pupil.build_profile(domain="square"))."""
    pending = (ok_i == 0) & (tries < max_total)
    if not use_profile:
        if draws is not None:
            # presampled: the plane cells ARE [-1,1] aperture offsets
            lx, ly = draws
        else:
            u1 = _hash_uniform(ids, seed, tries, 0x11111111)
            u2 = _hash_uniform(ids, seed, tries, 0x22222222)
            lx, ly = _concentric(u1, u2)
        nox, noy, noz, ndx, ndy, ndz, nok, ntir = attempt(lx, ly)
        consumed = pending.astype(jnp.int32)
        merge = pending
    else:
        # Profile pre-check: a candidate outside the fitted support bound
        # (harmonic polar series, or the r5 2-circle intersection cover —
        # see _bound_pass) provably fails the trace, so up to ``k_draws``
        # failed tries are consumed per round for ~30-40 VPU ops each
        # instead of a full trace.  The draw sequence and per-try
        # outcomes are exactly the reference's (PARITY.md).
        found = jnp.zeros_like(ok_i)
        consumed = jnp.zeros_like(ok_i)
        cand1 = jnp.zeros_like(ox)
        cand2 = jnp.zeros_like(ox)
        # ``first_draws`` makes this round 0: draw 0 is the caller's
        # sample (the reference's first attempt, zoic.cpp:1870) and is
        # FREE — it consumes no retry and shifts the hash counters so
        # draw j >= 1 is retry #(j-1), exactly the stream the old bare
        # attempt-0 + retry-round flow consumed (bit-identical per-ray
        # try trajectories; only the round grouping differs).
        n_draws = k_draws + 1 if first_draws is not None else k_draws
        for j in range(n_draws):
            if first_draws is not None and j == 0:
                u1, u2 = first_draws
                can = pending
            else:
                # draw j of this round is the ray's retry
                # #(tries + j - first_free): all previous draws this
                # round were consumed while found == 0
                if offset_draws is not None:
                    u1, u2 = offset_draws[
                        j - 1 if first_draws is not None else j
                    ]
                else:
                    ctr = tries + (j - 1 if first_draws is not None else j)
                    u1 = _hash_uniform(ids, seed, ctr, 0x11111111)
                    u2 = _hash_uniform(ids, seed, ctr, 0x22222222)
                can = pending & (found == 0) & (tries + consumed < max_total)
                consumed = consumed + can.astype(jnp.int32)
            if offset_draws is not None:
                # presampled candidates ARE offsets (bokeh CDF output)
                lx, ly = u1, u2
            else:
                lx, ly = _concentric(u1, u2)
            take = can & _bound_pass(lx, ly, pcs, circles)
            # latch the WARPED candidate: attempt() takes (lx, ly)
            # directly, so the concentric warp is not recomputed for the
            # traced draw (bit-identical — same function of the same u's)
            cand1 = jnp.where(take, lx, cand1)
            cand2 = jnp.where(take, ly, cand2)
            found = jnp.where(take, 1, found)
        nox, noy, noz, ndx, ndy, ndz, nok, ntir = attempt(cand1, cand2)
        merge = pending & (found == 1)
        nok = nok & (found == 1)
        assert not (dual and offset_draws is not None), (
            "dual-trace scans hash draws; presampled rounds gate it off"
        )
        if dual:
            # Speculative second candidate (mop-up eras, PERF_NOTES r3):
            # keep scanning for the NEXT bound-passing draw and trace it
            # alongside candidate 1 — the two trace chains are
            # independent, so on a one-vreg region the second hides
            # inside the first's pipeline latency.  Per-ray try
            # trajectories stay bit-identical to sequential scheduling
            # (the existing compact-vs-uncompacted A/B gates prove it):
            # the scan uses exactly the counters the NEXT round would
            # consume, and its draws only count (a) unconditionally for
            # rays that found no candidate in the first k draws —
            # ordinary consumption — or (b) for rays whose candidate-1
            # trace FAILS (cover slop) — the speculative case.
            found2 = jnp.zeros_like(ok_i)
            consumed2 = jnp.zeros_like(ok_i)
            cand1b = jnp.zeros_like(ox)
            cand2b = jnp.zeros_like(ox)
            for _ in range(k_draws):
                ctr = tries + consumed + consumed2  # next unconsumed draw
                can = pending & (found2 == 0) & (ctr < max_total)
                u1 = _hash_uniform(ids, seed, ctr, 0x11111111)
                u2 = _hash_uniform(ids, seed, ctr, 0x22222222)
                consumed2 = consumed2 + can.astype(jnp.int32)
                lx, ly = _concentric(u1, u2)
                take = can & _bound_pass(lx, ly, pcs, circles)
                cand1b = jnp.where(take, lx, cand1b)
                cand2b = jnp.where(take, ly, cand2b)
                found2 = jnp.where(take, 1, found2)
            nbx, nby, nbz, nbdx, nbdy, nbdz, nbok, nbtir = attempt(
                cand1b, cand2b
            )
            a_fail = merge & ~nok        # candidate 1 traced and failed
            no_a = pending & (found == 0)
            b_live = a_fail | no_a       # scan-2 draws actually consumed
            useB = b_live & (found2 == 1)
            tir_add = (merge & ntir).astype(jnp.int32) + (
                useB & nbtir
            ).astype(jnp.int32)
            nox = jnp.where(useB, nbx, nox)
            noy = jnp.where(useB, nby, noy)
            noz = jnp.where(useB, nbz, noz)
            ndx = jnp.where(useB, nbdx, ndx)
            ndy = jnp.where(useB, nbdy, ndy)
            ndz = jnp.where(useB, nbdz, ndz)
            # bitwise merge, not jnp.where: Mosaic has no i1 vector selects
            # (a bool where lowers through i8 and dies in trunci i8->i1)
            nok = (nbok & useB) | (nok & ~useB)
            consumed = consumed + jnp.where(b_live, consumed2, 0)
            merge = merge | useB
        else:
            tir_add = (merge & ntir).astype(jnp.int32)
    if not use_profile:
        tir_add = (merge & ntir).astype(jnp.int32)
    ox = jnp.where(merge, nox, ox)
    oy = jnp.where(merge, noy, oy)
    oz = jnp.where(merge, noz, oz)
    dx = jnp.where(merge, ndx, dx)
    dy = jnp.where(merge, ndy, dy)
    dz = jnp.where(merge, ndz, dz)
    tries = tries + jnp.where(pending, consumed, 0)
    tir_count = tir_count + tir_add
    ok_i = jnp.where(pending, nok.astype(jnp.int32), ok_i)
    return ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count


def _bitonic_unsort_rows(key, arrays, rows, group_stride=1):
    """Per-lane-column bitonic sort of ``rows`` sublanes ascending by
    ``key`` (distinct i32), carrying ``arrays`` — restores rays moved by
    fold passes to their home rows (keys are the original lane ids).

    ``group_stride`` g > 1 sorts independently WITHIN each row group
    {r : r = c (mod g)} — every fold offset in ``_compaction_schedule`` is
    a multiple of 8, so a ray never leaves its row class mod 8 and a
    16-member grouped sort (10 compare stages) replaces the full 128-row
    network (28 stages)."""
    g = group_stride
    n_members = rows // g
    row = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    m = row // g  # member index within the ray's row group
    k = 2
    while k <= n_members:
        j = k // 2
        while j >= 1:
            low = (m & j) == 0
            dir_up = (m & k) == 0

            def partner(a, j=j, low=low):
                return jnp.where(
                    low,
                    pltpu.roll(a, rows - g * j, axis=0),  # a[(r + gj) % rows]
                    pltpu.roll(a, g * j, axis=0),         # a[(r - gj) % rows]
                )

            pk = partner(key)
            take = (pk < key) == (low == dir_up)
            key = jnp.where(take, pk, key)
            arrays = [jnp.where(take, partner(a), a) for a in arrays]
            j //= 2
        k *= 2
    return key, arrays


def _roll_rows_dyn(a, shift, max_shift=None):
    """Circular row shift by a TRACED amount: bit-decomposed composition of
    static ``pltpu.roll``s (Mosaic requires static shifts).  ``max_shift``
    (static, exclusive) bounds the decomposition when the caller knows the
    shift's range — fewer roll/select stages."""
    rows = a.shape[0]
    hi = rows if max_shift is None else min(rows, max_shift)
    b = 1
    while b < hi:
        a = jnp.where(shift & b != 0, pltpu.roll(a, b % rows, axis=0), a)
        b *= 2
    return a


def _roll_lanes_dyn(a, shift, max_shift=None):
    """Circular LANE shift by a traced amount (axis-1 twin of
    :func:`_roll_rows_dyn`)."""
    hi = LANES if max_shift is None else min(LANES, max_shift)
    b = 1
    while b < hi:
        a = jnp.where(shift & b != 0, pltpu.roll(a, b % LANES, axis=1), a)
        b *= 2
    return a


def _raytraced_kernel(
    n_elems: int,
    n_keys: int,       # shaping-table rows (LUT/profile film-radius keys)
    max_total: int,    # retry ceiling = max_tries + 1 (zoic.cpp:1767)
    use_lut: bool,     # exit-pupil LUT shaping (vs naive first-element)
    use_profile: bool,  # polar pupil pre-check (PupilProfile) available
    use_poly: bool,    # profile bound from prof_ref Horner coefficients
    #                    instead of the shap_ref select chain
    circles: bool,     # PupilProfile.kind == "circles": the pre-check is
    #                    the 2-circle intersection cover (_bound_pass)
    compact: bool,     # in-kernel straggler compaction (fold eras)
    presampled: bool,  # u refs are [-1,1] bokeh offsets; retry draws from
    #                    streamed planes (image-based bokeh mode)
    dead_heavy: bool,  # low-acceptance schedule regime (lens.dead_frac)
    iris_idx: int,     # static iris index for the refract-identity skip
    #                    (-1 = disabled; see LensSystem.iris_identity)
    elem_flags: tuple,  # static per-element flags (LensSystem.elem_flags)
    sched_knobs: tuple,  # (era3_h, era3_rounds, k_draws, era3_far_every,
    #                      bulk_draws, skip_era1, dual_h, round0_draws) —
    #                      static sweep parameters (PERF_NOTES r3)
    plane_tiles: int,  # presampled retry planes: tiles share plane block
    #                    i % plane_tiles; >0 when blocks ARE shared (grid >
    #                    plane_tiles), enabling the per-reuse decorrelating
    #                    rotation (ADVICE r3)
    *refs,
    # ref layout (in order):
    #   elems_ref   SMEM (E, 8)
    #   scal_ref    SMEM (8,): origin_shift, dz0, seed, naive_scale,
    #                          key_spacing, batch_size, sensor_half,
    #                          profile inv_dmax
    #   shap_ref    SMEM (n_keys, 6): ms*1.05, centroid, c0, c1, c2, c4
    #   prof_ref    SMEM (4, D+1): profile-poly Horner coefficients
    #   sx_ref, sy_ref, u1_ref, u2_ref          VMEM (rows, 128)
    #   [bu1_ref, bu2_ref]                      VMEM (P, rows, 128)
    #                                           — presampled only
    #   out_ox..out_dz, out_packed              VMEM (rows, 128)
    #   [st_f, st_i]                            VMEM scratch — compact only
):
    (
        elems_ref, scal_ref, shap_ref, prof_ref,
        sx_ref, sy_ref, u1_ref, u2_ref,
    ), refs = (refs[:8], refs[8:])
    if presampled:
        (bu1_ref, bu2_ref), refs = refs[:2], refs[2:]
    (out_ox, out_oy, out_oz, out_dx, out_dy, out_dz, out_packed), refs = (
        refs[:7], refs[7:],
    )
    if compact:
        (st_f, st_i), refs = refs[:2], refs[2:]
    else:
        st_f = st_i = None
    ctr_ref = refs[0] if (compact and presampled) else None
    seed = scal_ref[2].astype(jnp.int32)
    origin_shift = scal_ref[0]
    dz0 = scal_ref[1]
    naive_scale = scal_ref[3]
    spacing = scal_ref[4]
    batch_size = scal_ref[5].astype(jnp.int32)
    sensor_half = scal_ref[6]
    rows = sx_ref.shape[0]
    pf = _plane_layout(use_lut, use_profile)
    n_f32 = len(pf)

    def attempt_on(fx, fy, sa, sb, kx, ky):
        """Build the per-attempt tracer over folded shaping coefficients.

        ``attempt(lx, ly)`` takes the APERTURE-DISK candidate directly
        (callers do the concentric warp / bokeh passthrough once, in the
        pre-check scan, and latch the selected (lx, ly) — recomputing the
        warp per trace cost ~25 VPU ops/attempt).  The LUT shaping chain
        (scale ms, translate trn, rotate by theta, subtract the film
        point; zoic.cpp:1891-1924) is an affine map, folded per ray into
            sa = ms*cos t,  sb = ms*sin t,
            kx = trn*cos t - fx,  ky = trn*sin t - fy
        so the ray direction is 4 fmas: dx = lx*sa - ly*sb + kx,
        dy = lx*sb + ly*sa + ky.  Naive mode (no rotation/translation,
        zoic.cpp:1874) passes kx=ky=None with scalar sa."""
        fz = jnp.zeros_like(fx) + origin_shift

        def attempt(lx, ly):
            if kx is None:
                dx = lx * sa - fx
                dy = ly * sa - fy
            else:
                dx = lx * sa - ly * sb + kx
                dy = lx * sb + ly * sa + ky
            return _trace_block(
                elems_ref, n_elems, fx, fy, fz, dx, dy,
                jnp.zeros_like(fx) + dz0, iris_idx=iris_idx,
                flags=elem_flags,
            )

        return attempt

    # film point (zoic.cpp:1853-1854): both axes scale by sensorWidth/2
    fx = sx_ref[:] * sensor_half
    fy = sy_ref[:] * sensor_half
    shaping = (
        _shaping_from_table(
            shap_ref, prof_ref, n_keys, spacing, scal_ref[7],
            fx, fy, use_lut, use_profile, use_poly, circles,
        )
        if (use_lut or use_profile)
        else {}
    )
    if use_lut:
        ms, trn = shaping["ms"], shaping["trn"]
        sn, cs = shaping["sn"], shaping["cs"]
        sa, sb = ms * cs, ms * sn
        kx, ky = trn * cs - fx, trn * sn - fy
    else:
        sa, sb = naive_scale, None
        kx = ky = None
    pcs = (
        (shaping["pc0"], shaping["pc1"], shaping["pc2"], shaping["pc4"])
        if use_profile else None
    )
    ids = _lane_ids(fx.shape, pl.program_id(0) * rows)
    attempt = attempt_on(fx, fy, sa, sb, kx, ky)

    # pad lanes (beyond the true batch) never enter the retry rounds
    tries = jnp.where(ids < batch_size, 0, max_total + 1)
    # round-0 scan depth is separately sweepable: the full-width chain is
    # throughput-bound, where deeper pre-check scans are cheap relative
    # to what they keep out of the era machine (cf. the dead-heavy K=13
    # lesson, PERF_NOTES)
    r0_draws = sched_knobs[7] or sched_knobs[2]
    if use_profile:
        # Round 0 IS a pre-checked round (r3): draw 0 is the caller's
        # sample (the reference's first sample, zoic.cpp:1870), and a
        # first sample the profile provably rejects consumes tries
        # without tracing, exactly like the retry rounds — run at full
        # tile width where the draw chain is throughput-bound.  This
        # cuts the pending fraction entering the era machine (~46% ->
        # ~25% on the double-gauss) at the cost of one pre-check chain.
        # Presampled (bokeh) mode feeds the scan from the streamed offset
        # planes (draw indices 0..r0_draws-1) under the square-domain
        # profile.
        # dead-key short-circuit: rays whose interpolated bound rejects
        # the whole candidate domain consume their full budget here in
        # O(1) — bit-identical to scanning (every draw would be rejected),
        # and they never enter the era machine, so the straggler pyramid
        # only ever sees live rays (_bound_dead; the r4 whole-budget
        # round-0 scan this replaces cost ~26 draw chains for EVERY ray
        # and left live-heavy lenses' stragglers to a pyramid tuned for
        # ~2% pending — fisheye measured 103M under it, PERF_NOTES r5)
        tries = jnp.where(
            _bound_dead(pcs, circles) & (tries < max_total),
            max_total, tries,
        )
        z = jnp.zeros_like(fx)
        zi = jnp.zeros_like(tries)
        (ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count) = _round_core(
            attempt, seed, max_total, True,
            ids, pcs, z, z, z, z, z, z, zi, tries, zi,
            k_draws=r0_draws, circles=circles,
            first_draws=(u1_ref[:], u2_ref[:]),
            offset_draws=(
                _plane_draws(
                    bu1_ref, bu2_ref, rows, 0, r0_draws, plane_tiles
                )
                if presampled else None
            ),
        )
    else:
        # attempt #0 from the caller's uniforms; consumes no retry
        if presampled:
            l0x, l0y = u1_ref[:], u2_ref[:]
        else:
            l0x, l0y = _concentric(u1_ref[:], u2_ref[:])
        ox, oy, oz, dx, dy, dz, ok, tir0 = attempt(l0x, l0y)
        # loop-carried masks are int32: Mosaic has no i1 vector selects
        ok_i = ok.astype(jnp.int32)
        tir_count = tir0.astype(jnp.int32)

    if _DEBUG_ROUND0_ONLY:
        # round-0 (tries, ok) rides in bits 21+ of the FINAL packed word:
        # the real machine still runs and produces the low bits
        dbg_r0 = (tries << 21) | (ok_i << 27)

    if not compact:
        # Whole-tile masked rounds: every round retraces the full tile
        # until its slowest ray resolves (A/B + bitwise validation of the
        # compacted machine; also the only valid scheduling for the
        # presampled-bokeh mode, whose retry draws are per-ROUND planes).
        def cond(carry):
            rnd = carry[0]
            return (rnd <= max_total) & jnp.any(
                (carry[7] == 0) & (carry[8] < max_total)
            )

        def body(carry):
            rnd, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count = carry
            draws = None
            offset_draws = None
            if presampled:
                # retry draws come from streamed planes under per-cycle
                # rotations (_plane_draws): every round's draw indices are
                # unique, so every ray's draw SEQUENCE is distinct iid
                # bokeh samples (cross-ray sharing only; PARITY.md).
                rows_ = sx_ref.shape[0]
                if use_profile:
                    # pre-checked round: k_draws planes, draw indices
                    # r0k + (rnd-1)*K .. (round 0 consumed the first r0k)
                    k = sched_knobs[2]
                    base = r0_draws + (rnd - 1) * k
                    offset_draws = _plane_draws(
                        bu1_ref, bu2_ref, rows_, base, k, plane_tiles
                    )
                else:
                    (draws,) = _plane_draws(
                        bu1_ref, bu2_ref, rows_, rnd - 1, 1, plane_tiles
                    )
            out = _round_core(
                attempt, seed, max_total, use_profile,
                ids, pcs, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count,
                draws=draws, k_draws=sched_knobs[2],
                offset_draws=offset_draws, circles=circles,
            )
            return (rnd + 1,) + out

        (_, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count) = (
            jax.lax.while_loop(
                cond, body,
                (jnp.int32(1), ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count),
            )
        )
    else:
        # ---- compacted retry machine ----------------------------------
        # State lives in VMEM scratch planes; fold passes swap pending rays
        # (with ALL their per-ray state) into done lanes of the low rows so
        # retry rounds run on a shrinking row prefix.  Ray identity (home
        # row) and the retry counters travel in one packed i32 plane; a
        # final per-column bitonic sort restores home order.
        vals = {
            "fx": fx, "fy": fy,
            "ox": ox, "oy": oy, "oz": oz, "dx": dx, "dy": dy, "dz": dz,
        }
        if use_lut:
            vals.update(sa=sa, sb=sb, kx=kx, ky=ky)
        if use_profile:
            vals.update(pc0=pcs[0], pc1=pcs[1], pc2=pcs[2], pc4=pcs[3])
        for name, plane in pf.items():
            st_f[plane, :, :] = vals[name]
        home_row = jax.lax.broadcasted_iota(jnp.int32, fx.shape, 0)
        st_i[0, :, :] = _pk_make(ok_i, tries, tir_count, home_row)
        row_base = pl.program_id(0) * rows
        if presampled:
            # SMEM scratch persists across grid steps: reset the draw
            # counter for THIS tile (round 0's pre-check scan consumed
            # the first r0_draws plane indices in profile mode)
            ctr_ref[0] = r0_draws if use_profile else 0

        def region_round(h, era_k=None):
            """One retry round on rows [0, h) of the scratch state.
            ``era_k`` overrides the pre-check draw count for this era
            (whole-tile budget eras take more draws per round than the
            latency-bound prefix mop-up; see _compaction_schedule)."""
            if use_lut:
                r_shape = tuple(
                    st_f[pf[nm], 0:h, :] for nm in ("sa", "sb", "kx", "ky")
                )
            else:
                r_shape = (sa, sb, kx, ky)  # scalar scale, no affine
            att = attempt_on(
                st_f[pf["fx"], 0:h, :], st_f[pf["fy"], 0:h, :], *r_shape
            )
            r_pcs = (
                tuple(
                    st_f[pf[nm], 0:h, :]
                    for nm in ("pc0", "pc1", "pc2", "pc4")
                )
                if use_profile else None
            )
            p = st_i[0, 0:h, :]
            r_ok, r_tries, r_tir, r_row = _pk_fields(p)
            r_lane = jax.lax.broadcasted_iota(jnp.int32, (h, LANES), 1)
            r_ids = (row_base + r_row) * LANES + r_lane
            draws = None
            offset_draws = None
            k_round = era_k if era_k else sched_knobs[2]
            if presampled:
                # Draw-counter-indexed draws (r4): the round reads
                # streamed planes at draw indices ``ctr .. ctr+k-1``
                # (plane ``idx % P`` under a per-cycle rotation,
                # _plane_draws), where ``ctr`` is a per-tile SCALAR
                # counter — one dynamic slice + log2 roll stages per
                # draw, instead of the per-ray try-indexed P x C
                # rotated-variant select loop (~170 vector ops/round;
                # measured ~45 of the bokeh config's 72 ms/generation,
                # PERF_NOTES r4).  Position-based assignment, same
                # PARITY.md class as before.
                r_ctr = ctr_ref[0]
                if use_profile:
                    offset_draws = _plane_draws(
                        bu1_ref, bu2_ref, h, r_ctr, k_round, plane_tiles
                    )
                    ctr_ref[0] = r_ctr + k_round
                else:
                    (draws,) = _plane_draws(
                        bu1_ref, bu2_ref, h, r_ctr, 1, plane_tiles
                    )
                    ctr_ref[0] = r_ctr + 1
            out = _round_core(
                att, seed, max_total, use_profile,
                r_ids, r_pcs,
                st_f[pf["ox"], 0:h, :], st_f[pf["oy"], 0:h, :],
                st_f[pf["oz"], 0:h, :], st_f[pf["dx"], 0:h, :],
                st_f[pf["dy"], 0:h, :], st_f[pf["dz"], 0:h, :],
                r_ok, r_tries, r_tir,
                draws=draws,
                k_draws=k_round,
                offset_draws=offset_draws,
                circles=circles,
                # dual-trace the latency-bound mop-up regions only:
                # regions at or below ``dual_h`` rows run on ~one vreg,
                # where the second independent trace chain is nearly
                # free (PERF_NOTES r3).  Presampled rounds gate it off
                # (the speculative scan consumes hash draws).
                dual=(use_profile and not presampled
                      and h <= sched_knobs[6]),
            )
            nox, noy, noz, ndx, ndy, ndz, nok, ntries, ntir = out
            st_f[pf["ox"], 0:h, :] = nox
            st_f[pf["oy"], 0:h, :] = noy
            st_f[pf["oz"], 0:h, :] = noz
            st_f[pf["dx"], 0:h, :] = ndx
            st_f[pf["dy"], 0:h, :] = ndy
            st_f[pf["dz"], 0:h, :] = ndz
            st_i[0, 0:h, :] = _pk_make(nok, ntries, ntir, r_row)

        sched = _compaction_schedule(
            rows, max_total, dead_heavy,
            sched_knobs[2] if use_profile else 1,
            sched_knobs[0], sched_knobs[1],
            era2_drain=not use_profile,
            era3_far_every=sched_knobs[3],
            bulk_draws=sched_knobs[4] if use_profile else 0,
            skip_era1=sched_knobs[5],
            r0_burned=use_profile and r0_draws >= max_total,
        )
        _run_compaction(
            st_f, st_i, n_f32, rows, max_total, region_round, sched
        )

        # unsort: the packed word's high bits are the home row, so sorting
        # ascending by the packed key restores home order per lane column
        # (ties impossible: rows are unique within a lane) and the retry
        # counters ride along in the key's low bits.  Group stride = gcd of
        # the fold offsets (rays never leave their row class mod gcd); a
        # schedule with no folds needs no unsort at all.
        g = _sched_group_stride(sched, rows)
        if _DEBUG_NO_UNSORT:
            key = st_i[0, :, :]
            ox, oy, oz = (st_f[pf["ox"], :, :], st_f[pf["oy"], :, :],
                          st_f[pf["oz"], :, :])
            dx, dy, dz = (st_f[pf["dx"], :, :], st_f[pf["dy"], :, :],
                          st_f[pf["dz"], :, :])
            # raw packed word as exact f32 (word < 2^24) for decoding
            out_ox[:] = key.astype(jnp.float32)
            out_oy[:] = oy
            out_oz[:] = oz
            out_dx[:] = dx
            out_dy[:] = dy
            out_dz[:] = dz
            out_packed[:] = key
            return
        if g < rows:
            key, arrays = _bitonic_unsort_rows(
                st_i[0, :, :],
                [
                    st_f[pf["ox"], :, :], st_f[pf["oy"], :, :],
                    st_f[pf["oz"], :, :], st_f[pf["dx"], :, :],
                    st_f[pf["dy"], :, :], st_f[pf["dz"], :, :],
                ],
                rows,
                group_stride=g,
            )
            ox, oy, oz, dx, dy, dz = arrays
        else:
            key = st_i[0, :, :]
            ox, oy, oz = st_f[pf["ox"], :, :], st_f[pf["oy"], :, :], st_f[pf["oz"], :, :]
            dx, dy, dz = st_f[pf["dx"], :, :], st_f[pf["dy"], :, :], st_f[pf["dz"], :, :]
        k_ok, k_tries, k_tir, _ = _pk_fields(key)
        packed = k_tries | (k_tir << 10) | (k_ok << 20)

    if not compact:
        packed = tries | (tir_count << 10) | (ok_i << 20)

    if _DEBUG_ROUND0_ONLY:
        packed = packed | dbg_r0

    # flip (zoic.cpp:1960-1961)
    out_ox[:] = -ox
    out_oy[:] = -oy
    out_oz[:] = -oz
    out_dx[:] = -dx
    out_dy[:] = -dy
    out_dz[:] = -dz
    out_packed[:] = packed


def _pad_rows(a: Array, rows: int) -> Array:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _thinlens_kernel(
    use_dof: bool,
    has_ov: bool,
    max_tries: int,
    presampled: bool,  # u refs hold [-1,1] aperture offsets (image bokeh)
    compact: bool,     # era-fold straggler compaction (concentric OV only)
    plane_tiles: int,  # >0: retry-plane blocks shared across tiles; fold
    #                    the reuse index into the rotation (ADVICE r3)
    *refs,
    # ref layout:
    #   scal_ref  SMEM (8,): tan_fov, ap_radius, focal_dist, ovd, ovr, seed
    #   sx_ref, sy_ref, u1_ref, u2_ref            VMEM (rows, 128)
    #   [bu1_ref, bu2_ref]   VMEM (P, rows, 128)  — presampled+has_ov only
    #   out_ox, out_oy, out_dx, out_dy, out_dz, out_tries
    #   [st_f, st_i]                              VMEM scratch — compact only
):
    """Fused THINLENS branch (zoic.cpp:1771-1848): pinhole direction, DOF
    refocus, empirical-vignette retry rounds — one VMEM-resident kernel."""
    (scal_ref, sx_ref, sy_ref, u1_ref, u2_ref), refs = refs[:5], refs[5:]
    if presampled and has_ov:
        (bu1_ref, bu2_ref), refs = refs[:2], refs[2:]
    (out_ox, out_oy, out_dx, out_dy, out_dz, out_tries), refs = (
        refs[:6], refs[6:],
    )
    st_f, st_i = refs if compact else (None, None)
    seed = scal_ref[5].astype(jnp.int32)
    tan_fov = scal_ref[0]
    ap_radius = scal_ref[1]
    focal_dist = scal_ref[2]
    ovd = scal_ref[3]
    ovr = scal_ref[4]
    rows = sx_ref.shape[0]

    sx = sx_ref[:]
    sy = sy_ref[:]
    px = sx * tan_fov
    py = sy * tan_fov
    inv = jax.lax.rsqrt(px * px + py * py + 1.0)
    pdx, pdy, pdz = px * inv, py * inv, inv  # normalized pinhole dir

    if not use_dof:
        out_ox[:] = jnp.zeros_like(sx)
        out_oy[:] = jnp.zeros_like(sx)
        out_dx[:] = pdx
        out_dy[:] = pdy
        out_dz[:] = -pdz
        out_tries[:] = jnp.zeros_like(sx, dtype=jnp.int32)
        return

    t = jnp.abs(focal_dist / pdz)
    fx_, fy_, fz_ = pdx * t, pdy * t, pdz * t

    def attempt_on(fxr, fyr, fzr):
        def attempt(u1, u2, raw=False):
            if raw:
                # pre-sampled [-1,1] offsets (image-based bokeh,
                # zoic.cpp:1787): only the apertureRadius scaling applies
                lx, ly = u1, u2
            else:
                lx, ly = _concentric(u1, u2)
            lx = lx * ap_radius
            ly = ly * ap_radius
            ddx = fxr - lx
            ddy = fyr - ly
            inv2 = jax.lax.rsqrt(ddx * ddx + ddy * ddy + fzr * fzr)
            dx, dy, dz = ddx * inv2, ddy * inv2, fzr * inv2
            if has_ov:
                vx = dx * ovd - lx
                vy = dy * ovd - ly
                # reference wraps this in ABS() (zoic.cpp:1303) — identity
                # on a sqrt, so dropped with the fast rsqrt form
                hyp = _fast_sqrt(vx * vx + vy * vy)
                ok = hyp < ap_radius * ovr
            else:
                ok = jnp.ones_like(lx, dtype=jnp.bool_)
            return lx, ly, dx, dy, dz, ok

        return attempt

    attempt = attempt_on(fx_, fy_, fz_)
    lx, ly, dx, dy, dz, ok = attempt(u1_ref[:], u2_ref[:], raw=presampled)
    tries = jnp.zeros_like(sx, dtype=jnp.int32)
    max_total = max_tries + 1
    row_base = pl.program_id(0) * rows

    if has_ov and compact:
        # ---- era-fold compacted retry machine (concentric draws) -------
        # PRNG counter is the per-ray try index (tries + 1, matching the
        # whole-tile loop's round numbering), so scheduling is invisible
        # and results are bit-identical to the uncompacted loop.
        planes = (fx_, fy_, fz_, lx, ly, dx, dy, dz)
        for k, v in enumerate(planes):
            st_f[k, :, :] = v
        home_row = jax.lax.broadcasted_iota(jnp.int32, sx.shape, 0)
        ok_i = ok.astype(jnp.int32)
        # pad lanes (ids beyond the true batch were handled by benign
        # samples in prep; OV accepts or rejects them — mark done instead)
        st_i[0, :, :] = _pk_make(
            jnp.maximum(ok_i, (_lane_ids(sx.shape, row_base)
                               >= scal_ref[6].astype(jnp.int32))
                        .astype(jnp.int32)),
            tries, jnp.zeros_like(tries), home_row,
        )

        def region_round(h, era_k=None):
            # era_k is the raytraced machine's per-era pre-check knob;
            # the vignette machine has no pre-check, so it is unused
            p = st_i[0, 0:h, :]
            r_ok, r_tries, _, r_row = _pk_fields(p)
            r_lane = jax.lax.broadcasted_iota(jnp.int32, (h, LANES), 1)
            r_ids = (row_base + r_row) * LANES + r_lane
            att = attempt_on(
                st_f[0, 0:h, :], st_f[1, 0:h, :], st_f[2, 0:h, :]
            )
            pending = (r_ok == 0) & (r_tries < max_total)
            ctr = r_tries + 1
            u1 = _hash_uniform(r_ids, seed, ctr, 0x11111111)
            u2 = _hash_uniform(r_ids, seed, ctr, 0x22222222)
            nlx, nly, ndx, ndy, ndz, nok = att(u1, u2)
            new = [
                jnp.where(pending, n, st_f[3 + k, 0:h, :])
                for k, n in enumerate((nlx, nly, ndx, ndy, ndz))
            ]
            for k, v in enumerate(new):
                st_f[3 + k, 0:h, :] = v
            ntries = jnp.where(pending, ctr, r_tries)
            nok_i = jnp.where(pending, nok.astype(jnp.int32), r_ok)
            st_i[0, 0:h, :] = _pk_make(
                nok_i, ntries, jnp.zeros_like(ntries), r_row
            )

        tl_sched = _compaction_schedule(rows, max_total, era2_drain=True)
        _run_compaction(st_f, st_i, 8, rows, max_total, region_round,
                        tl_sched)

        key, arrays = _bitonic_unsort_rows(
            st_i[0, :, :],
            [st_f[3, :, :], st_f[4, :, :], st_f[5, :, :],
             st_f[6, :, :], st_f[7, :, :]],
            rows,
            group_stride=_sched_group_stride(tl_sched, rows),
        )
        lx, ly, dx, dy, dz = arrays
        _, tries, _, _ = _pk_fields(key)
    elif has_ov:
        ids = _lane_ids(sx.shape, row_base)
        # mark pad lanes done at entry (as the compacted branch does) so
        # ragged batches don't spin spare retry rounds on them; pad rows
        # are dropped by the caller either way (VERDICT r2 #9)
        ok_i = jnp.maximum(
            ok.astype(jnp.int32),
            (ids >= scal_ref[6].astype(jnp.int32)).astype(jnp.int32),
        )

        def cond(carry):
            rnd = carry[0]
            return (rnd <= max_total) & jnp.any(carry[6] == 0)

        def body(carry):
            rnd, lx, ly, dx, dy, dz, ok_i, tries = carry
            if presampled:
                # per-round streamed bokeh draws with row-rotation reuse
                # (same scheme as the raytraced kernel; PARITY.md)
                p = bu1_ref.shape[0]
                cyc = (rnd - 1) // p
                pidx = (rnd - 1) - cyc * p
                rows_ = sx.shape[0]
                u1 = bu1_ref[pl.ds(pidx, 1), :, :].reshape(rows_, LANES)
                u2 = bu2_ref[pl.ds(pidx, 1), :, :].reshape(rows_, LANES)
                shift = cyc * 3
                if plane_tiles:
                    # distinct rotation per tile-reuse index (ADVICE r3)
                    t_reuse = pl.program_id(0) // plane_tiles
                    shift = shift + t_reuse * 5
                    lsh = t_reuse * 21
                    u1 = _roll_lanes_dyn(u1, lsh)
                    u2 = _roll_lanes_dyn(u2, lsh)
                u1 = _roll_rows_dyn(u1, shift)
                u2 = _roll_rows_dyn(u2, shift)
            else:
                u1 = _hash_uniform(ids, seed, rnd, 0x11111111)
                u2 = _hash_uniform(ids, seed, rnd, 0x22222222)
            nlx, nly, ndx, ndy, ndz, nok = attempt(u1, u2, raw=presampled)
            pending = ok_i == 0
            lx = jnp.where(pending, nlx, lx)
            ly = jnp.where(pending, nly, ly)
            dx = jnp.where(pending, ndx, dx)
            dy = jnp.where(pending, ndy, dy)
            dz = jnp.where(pending, ndz, dz)
            tries = jnp.where(pending, rnd, tries)
            ok_i = jnp.where(pending, nok.astype(jnp.int32), ok_i)
            return rnd + 1, lx, ly, dx, dy, dz, ok_i, tries

        (_, lx, ly, dx, dy, dz, ok_i, tries) = jax.lax.while_loop(
            cond, body, (jnp.int32(1), lx, ly, dx, dy, dz, ok_i, tries)
        )

    out_ox[:] = lx
    out_oy[:] = ly
    out_dx[:] = dx
    out_dy[:] = dy
    out_dz[:] = -dz  # looking down -Z (zoic.cpp:1845)
    out_tries[:] = tries


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_dof", "has_ov", "max_tries", "tile_rows", "interpret",
        "presampled", "compact",
    ),
)
def thinlens_fused(
    sx: Array,
    sy: Array,
    u1: Array,
    u2: Array,
    tan_fov: Array,
    aperture_radius: Array,
    focal_distance: Array,
    ov_distance: Array,
    ov_radius: Array,
    seed: Array,
    *,
    use_dof: bool,
    has_ov: bool,
    max_tries: int,
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
    presampled: bool = False,
    compact: bool = True,
    retry_u1: Array | None = None,
    retry_u2: Array | None = None,
) -> Tuple[Array, Array, Array]:
    """Fused thin-lens generation.  Returns (origin[B,3], dir[B,3],
    tries[B]).  With ``presampled=True`` the (u1, u2) inputs are [-1,1]
    aperture offsets already drawn by an external sampler (image-based
    bokeh); combined with empirical vignetting, the retry redraws come
    from the streamed ``retry_u1/retry_u2`` ([P, Bp], Bp <= B; see
    ``_prep_retry_planes``) planes with row-rotation reuse (same scheme
    as the raytraced kernel, PARITY.md)."""
    b = sx.shape[0]
    if has_ov and not presampled and tile_rows == DEF_TILE_ROWS:
        # the era-fold compacted vignette machine prefers bigger tiles
        # (v5e sweep: 32: 1083M, 64: 1298M, 128: 1499M rays/s); 64 stays
        # the default for the retry-free paths (r1 sweep)
        tile_rows = 128
    n_pad = -b % LANES
    rows = (b + n_pad) // LANES
    while tile_rows >= 32 and rows <= tile_rows // 2:
        tile_rows //= 2
    row_pad = -rows % tile_rows
    total_rows = rows + row_pad

    def prep(a, fill=0.0):
        a = jnp.pad(a, (0, n_pad), constant_values=fill)
        return _pad_rows(a.reshape(rows, LANES), total_rows)

    ins = [prep(sx), prep(sy), prep(u1, 0.5), prep(u2, 0.5)]
    n_planes = 0
    plane_tiles = 1
    if presampled and has_ov:
        if retry_u1 is None:
            retry_u1 = jnp.zeros((1, LANES), jnp.float32)
            retry_u2 = jnp.zeros((1, LANES), jnp.float32)
        n_planes = retry_u1.shape[0]
        planes, plane_tiles = _prep_retry_planes(retry_u1, retry_u2, tile_rows)
        ins += planes
    scal = jnp.stack(
        [
            jnp.asarray(tan_fov, jnp.float32),
            jnp.asarray(aperture_radius, jnp.float32),
            jnp.asarray(focal_distance, jnp.float32),
            jnp.asarray(ov_distance, jnp.float32),
            jnp.asarray(ov_radius, jnp.float32),
            jnp.asarray(seed, jnp.float32),
            jnp.float32(b),
            jnp.float32(0.0),
        ]
    )
    # era-fold compaction for the vignette retry loop (concentric draws
    # only: presampled retry planes are round-indexed); same field-width
    # and tile constraints as the raytraced machine
    compact = (
        compact
        and has_ov
        and not presampled
        and max_tries + 2 < 64
        and 16 <= tile_rows <= 256
        and (tile_rows & (tile_rows - 1)) == 0
    )

    grid = (total_rows // tile_rows,)
    blk = pl.BlockSpec(
        (tile_rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32) for _ in range(5)
    ] + [jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32)]

    in_specs = [blk] * 4
    if presampled and has_ov:
        in_specs += [
            pl.BlockSpec(
                (n_planes, tile_rows, LANES),
                lambda i, *_, _pt=plane_tiles: (0, i % _pt, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 2
    kernel = functools.partial(
        _thinlens_kernel, use_dof, has_ov, max_tries, presampled, compact,
        plane_tiles if plane_tiles < total_rows // tile_rows else 0,
    )
    scratch_shapes = (
        [
            pltpu.VMEM((8, tile_rows, LANES), jnp.float32),
            pltpu.VMEM((1, tile_rows, LANES), jnp.int32),
        ]
        if compact
        else []
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[blk] * 6,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(scal, *ins)

    def unprep(a):
        return a.reshape(-1)[:b]

    zeros = jnp.zeros((b,), jnp.float32)
    origin = jnp.stack([unprep(outs[0]), unprep(outs[1]), zeros], -1)
    direction = jnp.stack([unprep(outs[2]), unprep(outs[3]), unprep(outs[4])], -1)
    return origin, direction, unprep(outs[5])


def _shaping_table(lens: LensSystem, use_lut: bool, use_profile: bool):
    """SMEM shaping table (n_keys, 6): [max_scale*1.05, centroid_x, c0, c1,
    c2, c4] per film-radius key, plus the uniform key spacing.  The x1.05
    margin (zoic.cpp:1463, 1891) is folded into the table — lerp is
    linear."""
    from .. import pupil as _pupil

    if use_lut:
        keys = lens.lut.keys
        ms = lens.lut.max_scale * jnp.float32(_pupil.SAMPLING_ERROR_CORRECTION)
        ce = lens.lut.centroid_x
    elif use_profile:
        keys = lens.profile.keys
        ms = jnp.zeros_like(keys)
        ce = jnp.zeros_like(keys)
    else:
        return jnp.zeros((1, 6), jnp.float32), jnp.float32(1.0)
    if use_profile:
        c0, c1, c2, c4 = (lens.profile.c0, lens.profile.c1,
                          lens.profile.c2, lens.profile.c4)
    else:
        c0 = c1 = c2 = c4 = jnp.zeros_like(keys)
    spacing = keys[1] - keys[0]
    return jnp.stack([ms, ce, c0, c1, c2, c4], axis=1), spacing


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_tries", "tile_rows", "interpret", "compact", "use_lut",
        "use_profile", "presampled", "era3_h", "era3_rounds",
        "precheck_draws", "dead_heavy", "era3_far_every",
        "bulk_draws", "skip_era1", "dual_h", "round0_draws",
    ),
)
def raytraced_fused(
    lens: LensSystem,
    sx: Array,
    sy: Array,
    u1: Array,
    u2: Array,
    sensor_width: Array,
    seed: Array,
    *,
    max_tries: int,
    use_lut: bool,
    use_profile: bool = False,
    tile_rows: int = DEF_RT_TILE_ROWS,
    interpret: bool = False,
    compact: bool = True,
    presampled: bool = False,
    retry_u1: Array | None = None,
    retry_u2: Array | None = None,
    era3_h: int = 8,
    era3_rounds: int = 1,
    precheck_draws: int | None = None,
    dead_heavy: bool | None = None,
    era3_far_every: int = 1,
    bulk_draws: int = 0,
    skip_era1: bool = False,
    dual_h: int = 8,  # r4 chip sweep: 688 vs 651M at dual_h=0 (PERF_NOTES)
    round0_draws: int = 0,
) -> Tuple[Array, Array, Array, Array]:
    """Fused raytraced camera-ray generation, single launch: the whole
    retry budget runs in-kernel.

    Flat [B] inputs; returns (origin[B,3], dir[B,3], tries[B], tir[B])
    matching the jnp path's semantics (``tir`` counts per-ray TIR-failed
    attempts).  Aperture-sample shaping (exit-pupil LUT interp + rotation,
    zoic.cpp:1874-1924, when ``use_lut``) and the pupil-precheck profile
    (``use_profile``) are computed IN-KERNEL from SMEM tables — the kernel
    is grid-DMA-bound, so streaming 7 precomputed per-ray planes from HBM
    costs more than recomputing them per tile.

    ``compact=True`` runs the retry rounds on an in-kernel straggler-
    compacted row prefix (see ``_compaction_schedule``); results are
    bit-identical to ``compact=False`` because the per-ray PRNG stream is
    indexed by the ray's own try counter.

    ``presampled=True`` is the image-based-bokeh mode (zoic.cpp:1870, 1932
    redraws): (u1, u2) hold [-1,1] bokeh offsets for attempt #0 and
    ``retry_u1/retry_u2`` ([P, Bp], Bp <= B — grid tiles share plane
    blocks modulo the plane's tile count, ``_prep_retry_planes``) hold
    streamed retry-draw planes.  The
    pupil precheck is disabled (it assumes concentric-disk candidates), but
    compaction stays on: each compacted retry round reads plane
    ``ctr % P`` under a distinct (row, lane) rotation per reuse cycle
    ``ctr // P``, where ``ctr`` is a per-tile scalar round counter — every
    round has a unique (plane, rotation) pair and region positions are
    distinct, so draws remain iid bokeh samples under position-based
    assignment (PARITY.md).  The uncompacted loop reads plane
    ``(round-1) % P`` the same way, round-synchronously.
    """
    b = sx.shape[0]
    max_total = max_tries + 1
    # presampled + use_profile is the image-bokeh pre-check: candidates
    # are square offsets, so the profile must be square-domain-fitted — a
    # disk-fitted bound is unsound at the corners.  models/raytraced.py
    # gates on lens.profile_domain; this guard keeps DIRECT callers
    # (tests, tools, future call sites) sound too (ADVICE r4 #3).
    assert not (presampled and use_profile) or (
        lens.profile_domain == "square"
    ), "presampled (bokeh) pre-check requires a square-domain profile fit"
    # the compacted machine packs ok/tries/tir/home-row into one i32 plane
    # (6-bit try fields -> max_total+1 < 64; row field sized for <=256
    # rows), and the bitonic network needs power-of-2 rows.  Presampled
    # (bokeh) retries compact too: draws select per-lane among P x C
    # rotated plane variants by the ray's own try counter.
    compact = (
        compact
        and max_total < 63
        and 16 <= tile_rows <= 256
        and (tile_rows & (tile_rows - 1)) == 0
    )

    n_pad = -b % LANES
    rows = (b + n_pad) // LANES
    # shrink the tile for small batches: don't pad a 1-row shard out to the
    # full default tile (matters for per-shard batches under shard_map and
    # for interpret-mode tests; 16 is the compaction minimum)
    while tile_rows >= 32 and rows <= tile_rows // 2:
        tile_rows //= 2
    row_pad = -rows % tile_rows
    total_rows = rows + row_pad

    def prep(a, fill=0.0):
        a = jnp.pad(a, (0, n_pad), constant_values=fill)
        return _pad_rows(a.reshape(rows, LANES), total_rows)

    # pad uniforms with 0.5 (center sample -> benign trace for pad lanes)
    ins = [prep(sx), prep(sy), prep(u1, 0.5), prep(u2, 0.5)]
    n_planes = 0
    plane_tiles = 1
    if presampled:
        if retry_u1 is None:
            retry_u1 = jnp.zeros((1, LANES), jnp.float32)
            retry_u2 = jnp.zeros((1, LANES), jnp.float32)
        n_planes = retry_u1.shape[0]
        planes, plane_tiles = _prep_retry_planes(retry_u1, retry_u2, tile_rows)
        ins += planes

    elems = _pack_elements(lens)
    shap, spacing = _shaping_table(lens, use_lut, use_profile)
    n_keys = shap.shape[0]
    use_poly = bool(use_profile and lens.profile_poly)
    prof = (
        lens.profile.poly
        if (use_profile and lens.profile is not None
            and lens.profile.poly is not None)
        else jnp.zeros((4, 7), jnp.float32)
    )
    inv_dmax = (
        1.0
        / (
            lens.profile.poly_scale
            if (use_poly and lens.profile.poly_scale is not None)
            else lens.profile.keys[-1]
        )
        if use_profile and lens.profile is not None
        else jnp.float32(1.0)
    )
    scal = jnp.stack(
        [
            lens.origin_shift,
            -lens.thickness[0],
            jnp.asarray(seed, jnp.float32),
            lens.aperture[0],
            jnp.asarray(spacing, jnp.float32),
            jnp.float32(b),
            jnp.asarray(sensor_width, jnp.float32) * 0.5,
            jnp.asarray(inv_dmax, jnp.float32),
        ]
    )

    n_elems = lens.count
    grid = (total_rows // tile_rows,)
    # index_map receives (grid_idx, *scalar_prefetch_refs)
    blk = pl.BlockSpec(
        (tile_rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [blk] * 4
    if presampled:
        in_specs += [
            pl.BlockSpec(
                (n_planes, tile_rows, LANES),
                lambda i, *_, _pt=plane_tiles: (0, i % _pt, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 2
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32) for _ in range(6)
    ] + [jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32)]

    if dead_heavy is None:
        # with the profile pre-check active, fully-dead rays are consumed
        # by the round-0 dead-key short-circuit (_bound_dead) in O(1), so
        # the era machine sees only live stragglers and the normal pyramid
        # is the right schedule regardless of dead_frac; the bulk
        # budget-burn regime only pays when dead rays must actually
        # TRACE their budget out (no pre-check)
        dead_heavy = lens.dead_frac >= 0.3 and not use_profile
    # Whole-budget round 0 (r4): on dead-heavy lenses most rays burn the
    # full try budget through pre-check rejections (dead film keys), so
    # round 0's full-tile, throughput-bound scan covers max_total draws in
    # one pass and the bulk budget-burn era (with its unconditional
    # full-tile trace per round) disappears — the fold pyramid only mops
    # up failed-trace stragglers (_compaction_schedule r0_burned).
    # Presampled (bokeh) mode keeps the per-round plane streaming instead
    # of materializing max_total offset planes.
    r0_burn = (
        dead_heavy and use_profile and not presampled and round0_draws == 0
        and compact
    )
    if r0_burn:
        round0_draws = max_total
    if precheck_draws is None:
        # per-lens pre-check draw budget (r3 K sweep, PERF_NOTES): deep
        # chains only pay in whole-tile budget-burn rounds.  With the
        # whole-budget round 0 those rounds are gone — every post-r0
        # round is latency-bound mop-up where the shallow chain wins
        # (K=13: 63.9 vs K=4: 99.6M on the telephoto class, r3).
        if r0_burn or not dead_heavy:
            # with the dead-key short-circuit the pyramid sees only live
            # stragglers whatever dead_frac says — shallow chain wins
            precheck_draws = PRECHECK_DRAWS
        else:
            precheck_draws = 13 if lens.dead_frac >= 0.6 else PRECHECK_DRAWS
    circles = bool(
        use_profile
        and lens.profile is not None
        and getattr(lens.profile, "kind", "harmonic") == "circles"
    )
    kernel = functools.partial(
        _raytraced_kernel, n_elems, n_keys, max_total, use_lut, use_profile,
        use_poly, circles, compact, presampled, dead_heavy,
        (lens.aperture_element if lens.iris_identity else -1),
        lens.elem_flags if len(lens.elem_flags) == n_elems else (),
        (era3_h, era3_rounds, precheck_draws, era3_far_every, bulk_draws,
         skip_era1, dual_h, round0_draws),
        plane_tiles if plane_tiles < total_rows // tile_rows else 0,
    )
    n_f32 = len(_plane_layout(use_lut, use_profile))
    scratch_shapes = (
        [
            pltpu.VMEM((n_f32, tile_rows, LANES), jnp.float32),
            pltpu.VMEM((1, tile_rows, LANES), jnp.int32),
        ]
        if compact
        else []
    )
    if compact and presampled:
        # per-tile scalar round counter for the streamed retry planes
        scratch_shapes.append(pltpu.SMEM((1,), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=[blk] * 7,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        # the compacted machine's fold/unsort temporaries push scoped VMEM
        # slightly past the 16M default at tile_rows=64
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        # TPU-semantics interpreter for CPU tests (plain interpret=True lacks
        # the TPU PRNG primitives)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(elems, scal, shap, prof, *ins)

    def unprep(a):
        return a.reshape(-1)[:b]

    origin = jnp.stack([unprep(outs[0]), unprep(outs[1]), unprep(outs[2])], -1)
    direction = jnp.stack([unprep(outs[3]), unprep(outs[4]), unprep(outs[5])], -1)
    packed = unprep(outs[6])
    if _DEBUG_ROUND0_ONLY:
        return origin, direction, packed, packed
    tries = packed & 0x3FF
    tir = (packed >> 10) & 0x3FF
    return origin, direction, tries, tir
