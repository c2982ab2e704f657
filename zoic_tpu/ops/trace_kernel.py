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
  (:func:`_hash_uniform`) and a whole-block early exit: a block whose
  rays have all succeeded stops iterating (the batched analog of the
  reference's per-ray early exit at zoic.cpp:1879);
* aperture-sample shaping (naive first-element or exit-pupil LUT,
  zoic.cpp:1873-1924) is a per-ray affine+rotation whose 4 coefficients are
  constant across retries — they are precomputed outside and streamed in.

Per-element math uses two algebraic identities over the reference ops (both
documented at the site): the sphere normal divides by the signed radius
instead of renormalizing (|center-hit| == |radius|), and ray directions are
normalized once per attempt rather than once per element (Snell of unit
vectors returns unit vectors).  Agreement with the exact jnp path is ~1e-6,
well inside the 1e-5 parity gate (tests/test_pallas.py).

The image-based-bokeh retry path stays on the jnp side (per-round CDF
gathers); only non-bokeh configs use the fused retry kernel.
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
DEF_TILE_ROWS = 64  # (64, 128) tiles: measured sweet spot on v5e — small
# enough that a tile's retry loop exits soon after its slowest ray resolves
# (grid steps pipeline their DMA), large enough to amortize per-step
# overhead (tile 16: 126M, 32: 186M, 64: 192M, 128: 148M, 256: 120M rays/s)


def _pack_elements(lens: LensSystem) -> Array:
    """Pack per-element trace constants into an f32[E, 8] SMEM table:
    [center_z, curvature, inv_curvature, r_sq, cull_r_sq, eta, tir_possible,
    sign_r]."""
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
    tir_possible = (lens.ior > ior_next).astype(jnp.float32)
    sign_r = jnp.where(lens.curvature < 0.0, -1.0, 1.0).astype(jnp.float32)
    return jnp.stack(
        [
            lens.center,
            lens.curvature,
            1.0 / lens.curvature,
            lens.curvature * lens.curvature,
            cull_r_sq,
            eta,
            tir_possible,
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


def _concentric(u1, u2):
    # zoic.cpp:686-704 semantics (see sampling.concentric_disk_sample)
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    use_a = (a * a) > (b * b)
    r = jnp.where(use_a, a, b)
    safe_a = jnp.where(use_a, a, 1.0)
    safe_b = jnp.where(use_a, 1.0, jnp.where(b == 0.0, 1.0, b))
    phi = jnp.where(
        use_a, PI_OVER_4 * (b / safe_a), PI_OVER_2 - PI_OVER_4 * (a / safe_b)
    )
    return r * _fast_cos(phi), r * _fast_sin(phi)


def _trace_block(elems_ref, n_elems, ox, oy, oz, dx, dy, dz):
    """Unrolled element-stack trace on one ray tile (values, not refs).

    Returns (ox, oy, oz, dx, dy, dz, ok, tir_any) with the reference's
    frozen-state failure semantics (zoic.cpp:1099-1158).  Directions are
    normalized once here; see module docstring for the precision argument.
    """
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv, dy * inv, dz * inv
    active = jnp.ones_like(ox, dtype=jnp.bool_)
    tir_any = jnp.zeros_like(ox, dtype=jnp.bool_)

    for i in range(n_elems):
        cz = elems_ref[i, 0]
        inv_r = elems_ref[i, 2]
        r_sq = elems_ref[i, 3]
        cull_r_sq = elems_ref[i, 4]
        eta = elems_ref[i, 5]
        tir_possible = elems_ref[i, 6]
        sign_r = elems_ref[i, 7]

        lx = 0.0 - ox
        ly = 0.0 - oy
        lz = cz - oz
        tca = lx * dx + ly * dy + lz * dz
        d2 = (lx * lx + ly * ly + lz * lz) - tca * tca
        miss = d2 > r_sq
        thc = jnp.sqrt(jnp.abs(r_sq - d2))
        t = tca + thc * sign_r
        hx = ox + dx * t
        hy = oy + dy * t
        hz = oz + dz * t
        hit2 = hx * hx + hy * hy
        cull = hit2 > cull_r_sq

        reached = active & ~miss & ~cull
        ox = jnp.where(reached, hx, ox)
        oy = jnp.where(reached, hy, oy)
        oz = jnp.where(reached, hz, oz)

        # normal = (center - hit) / signed_radius  (== normalize * sign)
        nx = (0.0 - hx) * inv_r
        ny = (0.0 - hy) * inv_r
        nz = (cz - hz) * inv_r
        c1 = -(dx * nx + dy * ny + dz * nz)
        cs2 = (eta * eta) * (1.0 - c1 * c1)
        tir = reached & (tir_possible > 0.0) & (cs2 > 1.0)
        k = eta * c1 - jnp.sqrt(jnp.abs(1.0 - cs2))
        alive = reached & ~tir
        dx = jnp.where(alive, dx * eta + nx * k, dx)
        dy = jnp.where(alive, dy * eta + ny * k, dy)
        dz = jnp.where(alive, dz * eta + nz * k, dz)
        tir_any = tir_any | tir
        active = alive

    return ox, oy, oz, dx, dy, dz, active, tir_any


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


PRECHECK_DRAWS = 4  # candidate draws per retry round in profile mode


def _raytraced_kernel(
    n_elems: int,
    n_rounds: int,     # retry rounds to run in this kernel invocation
    max_total: int,    # global retry ceiling = max_tries + 1 (zoic.cpp:1767)
    skip_initial: bool,  # phase-B: no input-uniform attempt, all-PRNG rounds
    sub_rows: int,     # retry-loop granularity in rows (straggler early-exit)
    use_profile: bool,  # polar pupil pre-check (PupilProfile) available
    # refs:
    elems_ref,      # SMEM (E, 8)
    scal_ref,       # SMEM (4,): origin_shift, dz0, seed, _pad
    ox_ref, oy_ref, u1_ref, u2_ref, ms_ref, tr_ref, sin_ref, cos_ref, tries_ref,
    c0_ref, c1_ref, c2_ref,
    out_ox, out_oy, out_oz, out_dx, out_dy, out_dz, out_tries, out_tir, out_ok,
):
    seed = scal_ref[2].astype(jnp.int32)

    origin_shift = scal_ref[0]
    dz0 = scal_ref[1]

    tile_rows = ox_ref.shape[0]
    n_sub = max(1, tile_rows // max(1, sub_rows))

    # The retry while-loop can run per sub-chunk of the tile (finer
    # straggler early-exit), but measured on v5e the per-while overhead
    # outweighs the saved masked rounds (sub_rows=8: 77M rays/s vs
    # sub_rows=256: 120M).  Default is therefore one loop per tile.
    for s in range(n_sub):
        sl = pl.ds(s * sub_rows, sub_rows)
        fx = ox_ref[sl, :]
        fy = oy_ref[sl, :]
        fz = jnp.zeros_like(fx) + origin_shift
        ms = ms_ref[sl, :]
        trn = tr_ref[sl, :]
        sn = sin_ref[sl, :]
        cs = cos_ref[sl, :]
        tries_in = tries_ref[sl, :]
        if use_profile:
            pc0 = c0_ref[sl, :]
            pc1 = c1_ref[sl, :]
            pc2 = c2_ref[sl, :]

        def attempt(u1, u2, fx=fx, fy=fy, fz=fz, ms=ms, trn=trn, sn=sn, cs=cs):
            lx, ly = _concentric(u1, u2)
            ax = lx * ms + trn
            ay = ly * ms
            tx = ax * cs - ay * sn
            ty = ax * sn + ay * cs
            return _trace_block(
                elems_ref, n_elems, fx, fy, fz, tx - fx, ty - fy,
                jnp.zeros_like(fx) + dz0,
            )

        if skip_initial:
            zero = jnp.zeros_like(fx)
            ox, oy, oz, dx, dy, dz = fx, fy, fz, zero, zero, zero
            ok_i = jnp.zeros_like(fx, dtype=jnp.int32)
            tir_count = jnp.zeros_like(fx, dtype=jnp.int32)
        else:
            # attempt #0 from the caller's uniforms; consumes no retry
            ox, oy, oz, dx, dy, dz, ok, tir0 = attempt(u1_ref[sl, :], u2_ref[sl, :])
            # loop-carried masks are int32: Mosaic has no i1 vector selects
            ok_i = ok.astype(jnp.int32)
            tir_count = tir0.astype(jnp.int32)
        tries = tries_in

        def cond(carry, tries_in=tries_in):
            rnd = carry[0]
            return (rnd <= n_rounds) & jnp.any(
                (carry[7] == 0) & (carry[8] < max_total)
            )

        ids = _lane_ids(fx.shape, pl.program_id(0) * tile_rows + s * sub_rows)

        def body(carry, attempt=attempt, tries_in=tries_in, ids=ids):
            rnd, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count = carry
            pending = (ok_i == 0) & (tries < max_total)
            if not use_profile:
                u1 = _hash_uniform(ids, seed, rnd, 0x11111111)
                u2 = _hash_uniform(ids, seed, rnd, 0x22222222)
                nox, noy, noz, ndx, ndy, ndz, nok, ntir = attempt(u1, u2)
                consumed = pending.astype(jnp.int32)
                merge = pending
            else:
                # Profile pre-check: a unit-disk candidate with
                # rho > c0 + c1 cos(phi) + c2 cos(2 phi) provably fails the
                # trace (build_profile's conservative bound), so up to
                # PRECHECK_DRAWS failed tries are consumed per round for
                # ~40 VPU ops each instead of a full trace.  The draw
                # sequence and per-try outcomes are exactly the reference's
                # (PARITY.md).
                found = jnp.zeros_like(ok_i)
                consumed = jnp.zeros_like(ok_i)
                cand1 = jnp.zeros_like(fx)
                cand2 = jnp.zeros_like(fx)
                for j in range(PRECHECK_DRAWS):
                    ctr = rnd * PRECHECK_DRAWS + j
                    u1 = _hash_uniform(ids, seed, ctr, 0x11111111)
                    u2 = _hash_uniform(ids, seed, ctr, 0x22222222)
                    lx, ly = _concentric(u1, u2)
                    rho2 = lx * lx + ly * ly
                    rho = jnp.sqrt(rho2)
                    cphi = lx / jnp.maximum(rho, 1e-9)
                    bound = pc0 + pc1 * cphi + pc2 * (2.0 * cphi * cphi - 1.0)
                    pass_j = rho <= bound
                    can = pending & (found == 0) & (tries + consumed < max_total)
                    consumed = consumed + can.astype(jnp.int32)
                    take = can & pass_j
                    cand1 = jnp.where(take, u1, cand1)
                    cand2 = jnp.where(take, u2, cand2)
                    found = jnp.where(take, 1, found)
                nox, noy, noz, ndx, ndy, ndz, nok, ntir = attempt(cand1, cand2)
                merge = pending & (found == 1)
                nok = nok & (found == 1)
            ox = jnp.where(merge, nox, ox)
            oy = jnp.where(merge, noy, oy)
            oz = jnp.where(merge, noz, oz)
            dx = jnp.where(merge, ndx, dx)
            dy = jnp.where(merge, ndy, dy)
            dz = jnp.where(merge, ndz, dz)
            tries = tries + jnp.where(pending, consumed, 0)
            tir_count = tir_count + (merge & ntir).astype(jnp.int32)
            ok_i = jnp.where(pending, nok.astype(jnp.int32), ok_i)
            return rnd + 1, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count

        if n_rounds > 0:
            (_, ox, oy, oz, dx, dy, dz, ok_i, tries, tir_count) = (
                jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(1), ox, oy, oz, dx, dy, dz, ok_i, tries,
                     tir_count),
                )
            )

        # flip (zoic.cpp:1960-1961)
        out_ox[sl, :] = -ox
        out_oy[sl, :] = -oy
        out_oz[sl, :] = -oz
        out_dx[sl, :] = -dx
        out_dy[sl, :] = -dy
        out_dz[sl, :] = -dz
        out_tries[sl, :] = tries
        out_tir[sl, :] = tir_count
        out_ok[sl, :] = ok_i


def _pad_rows(a: Array, rows: int) -> Array:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _thinlens_kernel(
    use_dof: bool,
    has_ov: bool,
    max_tries: int,
    presampled: bool,  # u refs hold [-1,1] aperture offsets (image bokeh)
    scal_ref,   # SMEM (8,): tan_fov, ap_radius, focal_dist, ovd, ovr, seed
    sx_ref, sy_ref, u1_ref, u2_ref,
    out_ox, out_oy, out_dx, out_dy, out_dz, out_tries,
):
    """Fused THINLENS branch (zoic.cpp:1771-1848): pinhole direction, DOF
    refocus, empirical-vignette retry rounds — one VMEM-resident kernel."""
    seed = scal_ref[5].astype(jnp.int32)
    tan_fov = scal_ref[0]
    ap_radius = scal_ref[1]
    focal_dist = scal_ref[2]
    ovd = scal_ref[3]
    ovr = scal_ref[4]

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

    def attempt(u1, u2, raw=False):
        if raw:
            # pre-sampled [-1,1] offsets (image-based bokeh, zoic.cpp:1787):
            # only the apertureRadius scaling applies
            lx, ly = u1, u2
        else:
            lx, ly = _concentric(u1, u2)
        lx = lx * ap_radius
        ly = ly * ap_radius
        ddx = fx_ - lx
        ddy = fy_ - ly
        inv2 = jax.lax.rsqrt(ddx * ddx + ddy * ddy + fz_ * fz_)
        dx, dy, dz = ddx * inv2, ddy * inv2, fz_ * inv2
        if has_ov:
            vx = dx * ovd - lx
            vy = dy * ovd - ly
            hyp = jnp.sqrt(vx * vx + vy * vy)
            ok = jnp.abs(hyp) < ap_radius * ovr
        else:
            ok = jnp.ones_like(lx, dtype=jnp.bool_)
        return lx, ly, dx, dy, dz, ok

    lx, ly, dx, dy, dz, ok = attempt(u1_ref[:], u2_ref[:], raw=presampled)
    tries = jnp.zeros_like(sx, dtype=jnp.int32)

    if has_ov:
        ok_i = ok.astype(jnp.int32)
        ids = _lane_ids(sx.shape, pl.program_id(0) * sx.shape[0])

        def cond(carry):
            rnd = carry[0]
            return (rnd <= max_tries + 1) & jnp.any(carry[6] == 0)

        def body(carry):
            rnd, lx, ly, dx, dy, dz, ok_i, tries = carry
            u1 = _hash_uniform(ids, seed, rnd, 0x11111111)
            u2 = _hash_uniform(ids, seed, rnd, 0x22222222)
            nlx, nly, ndx, ndy, ndz, nok = attempt(u1, u2)
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
        "use_dof", "has_ov", "max_tries", "tile_rows", "interpret", "presampled"
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
) -> Tuple[Array, Array, Array]:
    """Fused thin-lens generation.  Returns (origin[B,3], dir[B,3],
    tries[B]).  With ``presampled=True`` the (u1, u2) inputs are [-1,1]
    aperture offsets already drawn by an external sampler (image-based
    bokeh); only valid without empirical vignetting (retries would need
    fresh image-CDF draws)."""
    assert not (presampled and has_ov)
    b = sx.shape[0]
    n_pad = -b % LANES
    rows = (b + n_pad) // LANES
    row_pad = -rows % tile_rows
    total_rows = rows + row_pad

    def prep(a, fill=0.0):
        a = jnp.pad(a, (0, n_pad), constant_values=fill)
        return _pad_rows(a.reshape(rows, LANES), total_rows)

    ins = [prep(sx), prep(sy), prep(u1, 0.5), prep(u2, 0.5)]
    scal = jnp.stack(
        [
            jnp.asarray(tan_fov, jnp.float32),
            jnp.asarray(aperture_radius, jnp.float32),
            jnp.asarray(focal_distance, jnp.float32),
            jnp.asarray(ov_distance, jnp.float32),
            jnp.asarray(ov_radius, jnp.float32),
            jnp.asarray(seed, jnp.float32),
            jnp.float32(0.0),
            jnp.float32(0.0),
        ]
    )

    grid = (total_rows // tile_rows,)
    blk = pl.BlockSpec(
        (tile_rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32) for _ in range(5)
    ] + [jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32)]

    kernel = functools.partial(
        _thinlens_kernel, use_dof, has_ov, max_tries, presampled
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[blk] * 4,
            out_specs=[blk] * 6,
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


def _raytraced_call(
    lens: LensSystem,
    ox: Array,
    oy: Array,
    u1: Array,
    u2: Array,
    max_scale: Array,
    translation: Array,
    sin_t: Array,
    cos_t: Array,
    tries_in: Array,
    seed: Array,
    profile_coeffs=None,   # (c0, c1, c2) per-ray arrays, or None
    *,
    n_rounds: int,
    max_total: int,
    skip_initial: bool,
    tile_rows: int,
    interpret: bool,
    sub_rows: int = DEF_TILE_ROWS,
):
    """One padded pallas_call over flat [B] arrays.  Returns
    (origin[B,3], dir[B,3], tries[B], tir[B], ok[B])."""
    b = ox.shape[0]
    n_pad = -b % LANES
    rows = (b + n_pad) // LANES
    row_pad = -rows % tile_rows
    total_rows = rows + row_pad

    def prep(a, fill=0.0):
        a = jnp.pad(a, (0, n_pad), constant_values=fill)
        return _pad_rows(a.reshape(rows, LANES), total_rows)

    def prep_i(a, fill):
        a = jnp.pad(a, (0, n_pad), constant_values=fill)
        a = a.reshape(rows, LANES)
        return jnp.pad(
            a, ((0, total_rows - rows), (0, 0)), constant_values=fill
        )

    # pad uniforms with 0.5 (center sample -> benign trace for pad lanes);
    # pad tries with max_total+1 so pad lanes never participate in rounds
    use_profile = profile_coeffs is not None
    if use_profile:
        pc0, pc1, pc2 = profile_coeffs
    else:
        pc0 = pc1 = pc2 = jnp.zeros_like(ox)
    ins = [
        prep(ox), prep(oy), prep(u1, 0.5), prep(u2, 0.5),
        prep(max_scale), prep(translation), prep(sin_t), prep(cos_t, 1.0),
        prep_i(tries_in, max_total + 1),
        prep(pc0, 2.0), prep(pc1), prep(pc2),
    ]

    elems = _pack_elements(lens)
    scal = jnp.stack(
        [
            lens.origin_shift,
            -lens.thickness[0],
            jnp.asarray(seed, jnp.float32),
            jnp.float32(0.0),
        ]
    )

    n_elems = lens.count
    grid = (total_rows // tile_rows,)
    # index_map receives (grid_idx, *scalar_prefetch_refs)
    blk = pl.BlockSpec(
        (tile_rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32) for _ in range(6)
    ] + [jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32) for _ in range(3)]

    kernel = functools.partial(
        _raytraced_kernel, n_elems, n_rounds, max_total, skip_initial,
        sub_rows, use_profile,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[blk] * 12,
            out_specs=[blk] * 9,
        ),
        out_shape=out_shape,
        # TPU-semantics interpreter for CPU tests (plain interpret=True lacks
        # the TPU PRNG primitives)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(elems, scal, *ins)

    def unprep(a):
        return a.reshape(-1)[:b]

    origin = jnp.stack([unprep(outs[0]), unprep(outs[1]), unprep(outs[2])], -1)
    direction = jnp.stack([unprep(outs[3]), unprep(outs[4]), unprep(outs[5])], -1)
    return origin, direction, unprep(outs[6]), unprep(outs[7]), unprep(outs[8])


@functools.partial(
    jax.jit, static_argnames=("max_tries", "tile_rows", "interpret", "sub_rows")
)
def raytraced_fused(
    lens: LensSystem,
    sx: Array,
    sy: Array,
    u1: Array,
    u2: Array,
    max_scale: Array,
    translation: Array,
    sin_t: Array,
    cos_t: Array,
    sensor_width: Array,
    seed: Array,
    *,
    max_tries: int,
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
    sub_rows: int = DEF_TILE_ROWS,
    profile_coeffs=None,
) -> Tuple[Array, Array, Array, Array]:
    """Fused raytraced camera-ray generation (non-bokeh aperture sampling),
    single launch: the whole retry budget runs in-kernel.

    Flat [B] inputs; returns (origin[B,3], dir[B,3], tries[B], tir[B])
    matching the jnp path's semantics (``tir`` counts per-ray TIR-failed
    attempts).  ``max_scale``/``translation``/``sin_t``/``cos_t`` are the
    per-ray shaping constants (LUT mode) or (aperture0, 0, 0, 1) for naive
    mode — identical transforms to zoic.cpp:1874-1924.
    """
    ox = sx * (sensor_width * 0.5)
    oy = sy * (sensor_width * 0.5)
    tries0 = jnp.zeros_like(sx, dtype=jnp.int32)
    origin, direction, tries, tir, _ = _raytraced_call(
        lens, ox, oy, u1, u2, max_scale, translation, sin_t, cos_t, tries0,
        seed, profile_coeffs,
        n_rounds=max_tries + 1 if max_tries >= 0 else 0,
        max_total=max_tries + 1,
        skip_initial=False,
        tile_rows=tile_rows,
        interpret=interpret,
        sub_rows=sub_rows,
    )
    return origin, direction, tries, tir


def _compact_indices(mask: Array, capacity: int) -> Array:
    """Indices of the first ``capacity`` set lanes of ``mask`` (i32
    [capacity]); unfilled slots hold ``b`` (out-of-range sentinel)."""
    b = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask & (pos < capacity), pos, capacity)
    out = jnp.full((capacity,), b, jnp.int32)
    return out.at[dest].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop"
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_tries", "tile_rows", "interpret", "phase_a_rounds",
                     "compact_frac", "compact_iters", "compact_rounds"),
)
def raytraced_phased(
    lens: LensSystem,
    sx: Array,
    sy: Array,
    u1: Array,
    u2: Array,
    max_scale: Array,
    translation: Array,
    sin_t: Array,
    cos_t: Array,
    sensor_width: Array,
    seed: Array,
    *,
    max_tries: int,
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
    phase_a_rounds: int = 1,
    compact_frac: int = 4,
    compact_iters: int = 9,
    compact_rounds: int = 3,
) -> Tuple[Array, Array, Array, Array]:
    """Straggler-compacted retry pipeline (same semantics as
    :func:`raytraced_fused`, much less wasted SIMD work).

    The whole-block masked retry loop makes every VMEM tile iterate until
    its *slowest* ray finishes — with heterogeneous vignetting probabilities
    that costs 10-26 full-batch attempts.  Here:

    * phase A: one full-batch kernel (initial attempt + ``phase_a_rounds``
      in-kernel retries);
    * phase B: ``compact_iters`` iterations that gather the still-pending
      rays into a ``B/compact_frac`` buffer (cumsum + drop-scatter), run
      ``compact_rounds`` retries on the small homogeneous batch, and
      scatter results back.  Per-ray try budgets carry across phases, so
      the reference's 25-try/zero-weight semantics (zoic.cpp:1767,
      1824-1830) are exact;
    * fallback: if anything is still pending (pathological acceptance
      rates that overflow the compact capacity), one guarded full-batch
      kernel finishes the budget — cost no worse than the single-launch
      path, and the guard branch is skipped at runtime otherwise.

    Everything runs inside one jitted program: one device launch.
    """
    b = sx.shape[0]
    max_total = max_tries + 1
    ox = sx * (sensor_width * 0.5)
    oy = sy * (sensor_width * 0.5)
    tries0 = jnp.zeros_like(sx, dtype=jnp.int32)

    call = functools.partial(
        _raytraced_call,
        tile_rows=tile_rows,
        interpret=interpret,
        max_total=max_total,
    )

    origin, direction, tries, tir, ok = call(
        lens, ox, oy, u1, u2, max_scale, translation, sin_t, cos_t, tries0,
        seed,
        n_rounds=min(phase_a_rounds, max_total),
        skip_initial=False,
    )

    capacity = max(LANES * 8, b // compact_frac)
    dummy_u = jnp.full((capacity,), 0.5, jnp.float32)

    for it in range(compact_iters):
        pending = (ok == 0) & (tries < max_total)
        idx = _compact_indices(pending, capacity)
        safe = jnp.minimum(idx, b - 1)
        valid = idx < b

        c_args = tuple(
            jnp.where(valid, a[safe], fill)
            for a, fill in (
                (ox, 0.0), (oy, 0.0), (max_scale, 1.0), (translation, 0.0),
                (sin_t, 0.0), (cos_t, 1.0),
            )
        )
        c_tries = jnp.where(valid, tries[safe], max_total + 1)

        co, cd, ct, ctir, cok = call(
            lens, c_args[0], c_args[1], dummy_u, dummy_u,
            c_args[2], c_args[3], c_args[4], c_args[5], c_tries,
            seed + 1000 + it,
            n_rounds=compact_rounds,
            skip_initial=True,
        )

        scatter_idx = jnp.where(valid, idx, b)  # drop invalid slots
        origin = origin.at[scatter_idx].set(co, mode="drop")
        direction = direction.at[scatter_idx].set(cd, mode="drop")
        tries = tries.at[scatter_idx].set(ct, mode="drop")
        tir = tir.at[scatter_idx].add(ctir, mode="drop")
        ok = ok.at[scatter_idx].set(cok, mode="drop")

    # exactness fallback for capacity-overflow pathologies
    def finish(args):
        origin, direction, tries, tir, ok = args
        pend = (ok == 0) & (tries < max_total)
        # exclude already-done lanes via the try ceiling (skip_initial
        # kernels start with ok=0 internally)
        f_tries = jnp.where(pend, tries, max_total + 1)
        fo, fd, ft, ftir, fok = call(
            lens, ox, oy, u1, u2,
            max_scale, translation, sin_t, cos_t, f_tries,
            seed + 99_999,
            n_rounds=max_total,
            skip_initial=True,
        )
        merge = lambda new, old: jnp.where(  # noqa: E731
            pend if old.ndim == 1 else pend[:, None], new, old
        )
        return (
            merge(fo, origin), merge(fd, direction), merge(ft, tries),
            tir + jnp.where(pend, ftir, 0), merge(fok, ok),
        )

    any_pending = jnp.any((ok == 0) & (tries < max_total))
    origin, direction, tries, tir, ok = jax.lax.cond(
        any_pending, finish, lambda a: a, (origin, direction, tries, tir, ok)
    )
    return origin, direction, tries, tir
