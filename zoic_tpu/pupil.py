"""Exit-pupil lookup table: vectorized build and sample shaping.

Reference: ``exitPupilLUT`` (src/zoic.cpp:1391-1452) fires, for each of 32
film-x positions spaced ``filmWidth/32`` apart (film width hard-coded 4.0,
zoic.cpp:1393), 100,000 random rays at the *whole* first lens element and
records the 2D bounding box of the lens-UV values that survive the full
trace.  The per-ray loop over 3.2 M traces becomes ONE batched trace of a
``[n_film, n_samples]`` grid followed by masked min/max reductions.

The hot-path shaping transform (zoic.cpp:1891-1924 and its LUT test twin
zoic.cpp:1458-1544) maps a unit-disk sample into the interpolated pupil
bounding box: scale by the lerped ``getMaxScale() * 1.05``, translate x by
the lerped centroid x, rotate by the film point's azimuth.  Because the
``std::map`` keys are uniformly spaced, ``lower_bound`` reduces to
``ceil(dist / spacing)``; the reference's begin()-decrement edge case at
``dist == 0`` takes the dedicated branch (zoic.cpp:1494-1524) and distances
beyond the last key (impossible for sensible sensors: max key 3.875 vs max
film radius ~2.16) are clamped.

IMPORTANT INVARIANT: the shaped sampling region *defines* the resample
acceptance probability, and therefore the amount of edge darkening
(vignetting) in the image.  The transform must match the reference exactly —
a "better" (tighter) pupil cover would brighten edges relative to the
reference.  Do not optimize the cover.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import optics, trace
from .optics import V3
from .system import LensSystem, PupilLUT

Array = jnp.ndarray

FILM_WIDTH = 4.0                   # hard-coded (zoic.cpp:1393)
SAMPLING_ERROR_CORRECTION = 1.05   # safety margin (zoic.cpp:1463, 1891)


import functools


@functools.partial(jax.jit, static_argnames=("n_film", "n_samples"))
def build_lut(
    lens: LensSystem,
    key: Array,
    n_film: int = 32,
    n_samples: int = 100_000,
    uniforms: Array | None = None,
) -> PupilLUT:
    """Vectorized ``exitPupilLUT``: one batched trace over the full
    ``[n_film, n_samples]`` grid instead of 3.2 M sequential traces.

    RNG: the reference draws from its shared xor128 stream; we use counted
    ``jax.random`` bits.  The resulting bboxes agree statistically (the LUT
    is a Monte-Carlo bound estimate either way).  ``uniforms`` (shape
    ``(2, n_film, n_samples)``, U[0,1)) overrides the drawn stream — used
    by the oracle-parity test to feed the identical sample stream to the
    C++ golden build (tools/oracle ``tracelut``).
    """
    spacing = jnp.float32(FILM_WIDTH / n_film)
    film_x = jnp.arange(n_film, dtype=jnp.float32) * spacing  # keys (zoic.cpp:1399)

    u = (
        uniforms
        if uniforms is not None
        else jax.random.uniform(key, (2, n_film, n_samples), dtype=jnp.float32)
    )
    lens_u = u[0] * 2.0 - 1.0
    lens_v = u[1] * 2.0 - 1.0

    first_ap = lens.aperture[0]
    first_thick = lens.thickness[0]

    ox = jnp.broadcast_to(film_x[:, None], lens_u.shape)
    oy = jnp.zeros_like(ox)
    oz = jnp.broadcast_to(lens.origin_shift, lens_u.shape)
    # Target the whole first element: note the reference multiplies the
    # lens-UV by the element's *diameter* value (zoic.cpp:1417), i.e. the
    # sampled disk over-covers the element by 2x. Preserved.
    dx = lens_u * first_ap - ox
    dy = lens_v * first_ap - oy
    dz = jnp.broadcast_to(-first_thick, lens_u.shape)

    res = trace.trace_stack(lens, V3(ox, oy, oz), V3(dx, dy, dz))
    ok = res.ok

    px = lens_u * first_ap
    py = lens_v * first_ap
    big = jnp.float32(jnp.inf)
    min_x = jnp.min(jnp.where(ok, px, big), axis=1)
    min_y = jnp.min(jnp.where(ok, py, big), axis=1)
    max_x = jnp.max(jnp.where(ok, px, -big), axis=1)
    max_y = jnp.max(jnp.where(ok, py, -big), axis=1)
    # Film positions where nothing survives keep the reference's zero bbox
    # (apertureBounds initialized to AI_P2_ZERO, zoic.cpp:1402-1404).
    any_ok = jnp.any(ok, axis=1)
    zero = jnp.float32(0.0)
    min_x = jnp.where(any_ok, min_x, zero)
    min_y = jnp.where(any_ok, min_y, zero)
    max_x = jnp.where(any_ok, max_x, zero)
    max_y = jnp.where(any_ok, max_y, zero)

    # boundingBox2d::getMaxScale / getCentroid (zoic.cpp:495-517)
    cx = (min_x + max_x) * 0.5
    cy = (min_y + max_y) * 0.5
    scale_x = jnp.abs(max_x - cx)
    scale_y = jnp.abs(max_y - cy)
    max_scale = jnp.maximum(scale_x, scale_y)

    return PupilLUT(
        keys=film_x,
        max_scale=max_scale,
        centroid_x=cx,
        bbox_min_x=min_x,
        bbox_min_y=min_y,
        bbox_max_x=max_x,
        bbox_max_y=max_y,
    )


def lut_lookup(lut: PupilLUT, dist: Array) -> Tuple[Array, Array]:
    """Interpolated (max_scale_with_margin, centroid_x) for film radius
    ``dist`` — the uniform-key reduction of the reference's
    ``map::lower_bound`` + decrement + lerp (zoic.cpp:1892-1911).

    For ``dist == 0`` the reference's dedicated branch uses the first key's
    values directly (zoic.cpp:1512-1517); our ``perc = 0`` at index 0 yields
    the same.
    """
    n = lut.keys.shape[0]
    spacing = lut.keys[1] - lut.keys[0]
    # lower_bound: first key >= dist. Keys are i*spacing.
    i_lb = jnp.ceil(dist / spacing).astype(jnp.int32)
    i_lb = jnp.clip(i_lb, 0, n - 1)
    i_prev = jnp.clip(i_lb - 1, 0, n - 1)
    lower = lut.keys[i_lb]
    prev = lut.keys[i_prev]
    # percentage = (dist - lower) / (prev - lower)  (zoic.cpp:1908):
    # 0 at the lower_bound key, 1 at the previous key.
    denom = prev - lower
    perc = jnp.where(denom != 0.0, (dist - lower) / denom, 0.0)
    perc = jnp.where(dist == 0.0, 0.0, perc)
    max_scale = optics.lerp(perc, lut.max_scale[i_lb], lut.max_scale[i_prev])
    centroid = optics.lerp(perc, lut.centroid_x[i_lb], lut.centroid_x[i_prev])
    return max_scale * SAMPLING_ERROR_CORRECTION, centroid


def shape_sample(
    lut: PupilLUT,
    lens_x: Array,
    lens_y: Array,
    film_x: Array,
    film_y: Array,
) -> Tuple[Array, Array]:
    """Apply the LUT shaping to unit-disk samples for film points
    (zoic.cpp:1891-1924): scale to the interpolated pupil bound, translate x
    by the interpolated centroid, rotate by atan2(y, x) — using the
    reference's fastSin/fastCos for the rotation."""
    dist = jnp.abs(jnp.sqrt(film_x * film_x + film_y * film_y))
    max_scale, translation = lut_lookup(lut, dist)
    theta = jnp.arctan2(film_y, film_x)
    s = optics.fast_sin(theta)
    c = optics.fast_cos(theta)
    lx = lens_x * max_scale + translation
    ly = lens_y * max_scale
    return lx * c - ly * s, lx * s + ly * c


@functools.partial(jax.jit, static_argnames=("n_angles", "n_samples", "domain"))
def build_profile(
    lens: LensSystem,
    key: Array,
    n_angles: int = 16,
    n_samples: int = 50_000,
    domain: str = "disk",
) -> "PupilProfile":
    """Fit a conservative polar outer bound of the accepted-sample support
    in pre-shaping offset space, per LUT film-radius key.

    No reference equivalent: this is a TPU-native retry accelerator.  A
    candidate offset whose radius exceeds the bound at its azimuth
    cannot survive the trace, so the fused kernel can consume such failed
    tries without tracing (ops/trace_kernel.py inner candidate loop).  The
    bound errs outward by construction (per-bin max + additive fit excess +
    the reference's own x1.05-style margin), so acceptance outcomes are
    unchanged up to the same Monte-Carlo cover-tail risk the reference
    takes at zoic.cpp:1463.

    Uses the active sampling cover (LUT shaping when present, else naive
    first-element targeting) so the profile matches runtime candidates.

    ``domain`` picks the candidate space the fit must cover:

    * ``"disk"`` — unit-disk offsets, the concentric-map case
      (zoic.cpp:1870 concentricDiskSample); radii <= 1.
    * ``"square"`` — the full [-1, 1]^2 square, the image-bokeh case
      (``bokehSample`` maps pixel picks anywhere in the square,
      zoic.cpp:441-485); radii reach sqrt(2).  A disk-fitted bound is
      UNSOUND for bokeh draws (corner offsets it never observed can
      trace fine), so the presampled kernel path requires a square fit.
    """
    from .system import PupilProfile

    lut = lens.lut
    n_keys = lut.keys.shape[0] if lut is not None else 32
    keys = (
        lut.keys
        if lut is not None
        else jnp.arange(n_keys, dtype=jnp.float32) * jnp.float32(FILM_WIDTH / 32)
    )

    u = jax.random.uniform(key, (2, n_keys, n_samples), dtype=jnp.float32)
    if domain == "square":
        # uniform over the square: covers every offset bokehSample can emit
        lx = u[0] * 2.0 - 1.0
        ly = u[1] * 2.0 - 1.0
        rho = jnp.sqrt(lx * lx + ly * ly)
        phi = jnp.arctan2(ly, lx)
    else:
        # uniform over the unit disk (support coverage, not importance)
        rho = jnp.sqrt(u[0])
        phi = (u[1] * 2.0 - 1.0) * jnp.pi
        lx = rho * jnp.cos(phi)
        ly = rho * jnp.sin(phi)

    fx = jnp.broadcast_to(keys[:, None], lx.shape)
    fy = jnp.zeros_like(fx)
    if lut is not None:
        ms, trn = lut_lookup(lut, fx)
        px = lx * ms + trn
        py = ly * ms
    else:
        px = lx * lens.aperture[0]
        py = ly * lens.aperture[0]

    oz = jnp.zeros_like(fx) + lens.origin_shift
    d = V3(px - fx, py - fy, jnp.zeros_like(fx) - lens.thickness[0])
    ok = trace.trace_stack(lens, V3(fx, fy, oz), d).ok

    # per-key draw acceptance under the ACTIVE cover — the retry machine's
    # scheduling signal (see dead_film_fraction); uniform-disk draws make
    # this exactly P(candidate survives | film at key k)
    key_acceptance = jnp.mean(ok.astype(jnp.float32), axis=1)  # [K]

    # per-angle-bin max accepted radius
    bin_idx = jnp.clip(
        ((phi + jnp.pi) / (2.0 * jnp.pi) * n_angles).astype(jnp.int32),
        0,
        n_angles - 1,
    )
    onehot = jax.nn.one_hot(bin_idx, n_angles, dtype=jnp.float32)  # [K,S,A]
    rho_ok = jnp.where(ok, rho, 0.0)
    rho_max = jnp.max(rho_ok[:, :, None] * onehot, axis=1)  # [K, A]

    # least-squares fit rho(phi) ~ c0 + c1 cos phi + c2 cos 2phi
    # + c4 cos 4phi over bins (harmonic set {0,1,2,4}: measured on the
    # lens library, cos3 contributes nothing while cos4 cuts E[traced
    # attempts] 1.52 -> 1.32 on the double-gauss)
    centers = (jnp.arange(n_angles) + 0.5) / n_angles * 2.0 * jnp.pi - jnp.pi
    basis = jnp.stack(
        [jnp.ones_like(centers), jnp.cos(centers), jnp.cos(2.0 * centers),
         jnp.cos(4.0 * centers)], -1
    )  # [A, 4]
    if lut is not None:
        coef, *_ = jnp.linalg.lstsq(basis, rho_max.T)  # [4, K]
        fit = basis @ coef  # [A, K]
        # conservative: shift up by the worst under-fit so the fit clears
        # every OBSERVED per-bin max exactly, then a small absolute +
        # relative guard for the unobserved MC tail.  Margin sizing is
        # measured, not guessed (PERF_NOTES r3): on an independent 200k-
        # sample/key test set, (+0.005, x1.01) shows ZERO unsound flips
        # (bare excess-only: 3e-6) while the old (+0.02, x1.05) inflated
        # bound-passes ~8%% — i.e. ~8%% pointless full traces.  The risk
        # class (one-sided: a ray vignetted that an exact trace accepts)
        # is the same one the reference takes with its bare x1.05 margin
        # on the MC LUT bboxes (zoic.cpp:1463), budgeted at <=0.2%
        # (PARITY.md); measured ~1000x under.
        excess = jnp.max(rho_max.T - fit, axis=0)  # [K]
        c0 = (coef[0] + jnp.maximum(excess, 0.0) + 0.005) * 1.01
        c1 = coef[1] * 1.01
        c2 = coef[2] * 1.01
        c4 = coef[3] * 1.01
    else:
        # NAIVE cover: the accepted unit-disk support ROTATES with the
        # film azimuth (the cover applies no R(theta); the LUT cover
        # does, zoic.cpp:1914, which is what makes its support frame-
        # fixed).  The profile is fitted on the +x film axis only, so an
        # angle-dependent bound here rejects samples that trace fine at
        # other azimuths (measured: 76/2048 primary-sample flips on the
        # naive double-gauss).  Emit the rotation-invariant bound
        # instead: the support's circumradius, angle-independent.
        c0 = (jnp.max(rho_max, axis=1) + 0.005) * 1.01
        c1 = jnp.zeros_like(c0)
        c2 = jnp.zeros_like(c0)
        c4 = jnp.zeros_like(c0)

    # Held-out validation (ADVICE r3): the (+0.005, x1.01) margin was sized
    # on the shipped lens library; for an arbitrary user lens it is an
    # unvalidated MC guard, and an unsound bound silently vignettes rays
    # the exact trace accepts.  Trace an INDEPENDENT sample set and loosen
    # c0 per-key by any observed violation (accepted sample whose radius
    # exceeds the fitted bound at its azimuth), so every observed flip on
    # 2x n_samples/key draws is corrected at build time.  Residual risk is
    # the MC tail beyond both sets — the same class as the reference's
    # bare x1.05 LUT margin (zoic.cpp:1463).
    uh = jax.random.uniform(
        jax.random.fold_in(key, 1), (2, n_keys, n_samples), dtype=jnp.float32
    )
    if domain == "square":
        lxh = uh[0] * 2.0 - 1.0
        lyh = uh[1] * 2.0 - 1.0
        rho_h = jnp.sqrt(lxh * lxh + lyh * lyh)
        phi_h = jnp.arctan2(lyh, lxh)
    else:
        rho_h = jnp.sqrt(uh[0])
        phi_h = (uh[1] * 2.0 - 1.0) * jnp.pi
        lxh = rho_h * jnp.cos(phi_h)
        lyh = rho_h * jnp.sin(phi_h)
    if lut is not None:
        pxh = lxh * ms + trn
        pyh = lyh * ms
    else:
        pxh = lxh * lens.aperture[0]
        pyh = lyh * lens.aperture[0]
    dh = V3(pxh - fx, pyh - fy, jnp.zeros_like(fx) - lens.thickness[0])
    ok_h = trace.trace_stack(lens, V3(fx, fy, oz), dh).ok
    bound_h = (
        c0[:, None]
        + c1[:, None] * jnp.cos(phi_h)
        + c2[:, None] * jnp.cos(2.0 * phi_h)
        + c4[:, None] * jnp.cos(4.0 * phi_h)
    )
    viol = jnp.max(jnp.where(ok_h, rho_h - bound_h, -jnp.inf), axis=1)  # [K]
    c0 = c0 + jnp.maximum(viol, 0.0)
    return (
        # poly starts as a zero placeholder (stable pytree shape);
        # compile_camera fits it from the FINAL per-key bound
        # (fit_profile_poly) and decides the kernel form per-lens
        PupilProfile(
            keys=keys, c0=c0, c1=c1, c2=c2, c4=c4,
            poly=jnp.zeros((4, POLY_DEGREE + 1), jnp.float32),
            poly_scale=keys[-1],
        ),
        key_acceptance,
    )


def dead_film_fraction(keys, key_acceptance, r_max: float) -> float:
    """Film-area-weighted fraction of profile keys whose per-draw
    acceptance is below the budget's reach (a_k < 1/26: such rays are
    vignetted by design and consume the whole 26-try budget,
    zoic.cpp:1767).

    ``keys`` are film radii; screen samples scale BOTH axes by
    sensorWidth/2 (zoic.cpp:1853-1854), so a radius r carries annulus
    weight ~ r, cut at ``r_max`` (the film square's circumradius
    ``(sensor_width/2) * sqrt(2)``).  Compile-time scheduling heuristic
    only (LensSystem.dead_frac; quantized by the caller)."""
    import numpy as np

    acc = np.asarray(key_acceptance, np.float64)
    k = np.asarray(keys, np.float64)
    w = np.where(k <= r_max, np.maximum(k, k[1] if k.shape[0] > 1 else 1.0), 0.0)
    dead = acc < (1.0 / 26.0)
    return float((w * dead).sum() / max(w.sum(), 1e-9))


POLY_DEGREE = 6          # profile-poly fit degree (7 Horner coefficients)
POLY_MAX_DEFICIT = 0.02  # use the poly in-kernel only when the raw fit is
#                          at least this tight (rho units) — cliff-shaped
#                          profiles (dead film regions, e.g. the fisheye's)
#                          would need a large soundness uplift that
#                          destroys the dead-key pre-rejection


def _poly_interval_max(coefs: "np.ndarray", lo: float, hi: float) -> float:
    """Exact max of a batch of 1-D polynomials over [lo, hi].

    ``coefs`` is [N, D+1] ascending-power.  The max of each polynomial is
    attained at an endpoint or a real root of its derivative — found via
    batched companion-matrix eigenvalues (no sampling grid involved)."""
    import numpy as np

    n, dp1 = coefs.shape
    best = np.maximum(
        (coefs * lo ** np.arange(dp1)).sum(1),
        (coefs * hi ** np.arange(dp1)).sum(1),
    )
    # derivative coefficients, ascending: d/dt sum a_k t^k = sum k a_k t^(k-1)
    dcoef = coefs[:, 1:] * np.arange(1, dp1)[None, :]    # [N, D]
    # normalize rows; degrees can collapse when leading terms vanish
    scale = np.max(np.abs(dcoef), axis=1, keepdims=True)
    ok_rows = scale[:, 0] > 0.0
    dn = np.where(scale > 0, dcoef / np.maximum(scale, 1e-300), 0.0)
    deg = dp1 - 2
    # split rows by effective degree (leading coeff ~0 -> lower degree)
    for d_eff in range(deg, 0, -1):
        lead = dn[:, d_eff]
        rows = np.where(ok_rows & (np.abs(lead) > 1e-12))[0]
        if rows.size:
            # batched companion matrices of the degree-d_eff polynomials
            comp = np.zeros((rows.size, d_eff, d_eff))
            comp[:, 1:, :-1] = np.eye(d_eff - 1)[None]
            comp[:, :, -1] = -dn[rows, :d_eff] / lead[rows, None]
            roots = np.linalg.eigvals(comp)               # [R, d_eff]
            real = np.abs(roots.imag) < 1e-9
            tt = np.clip(roots.real, lo, hi)
            vals = np.zeros_like(tt)
            for k in range(dp1):
                vals += coefs[rows, k][:, None] * tt ** k
            vals = np.where(real, vals, -np.inf)
            best[rows] = np.maximum(best[rows], vals.max(1))
            ok_rows[rows] = False
        # remaining rows: their lead coeff at this degree is ~0, retry lower
    return float(best.max())


def fit_profile_poly(profile, r_max: float = None) -> Tuple[Array, Array, float]:
    """Fit the per-key lerped bound with one degree-``POLY_DEGREE``
    polynomial per coefficient in ``t = dist / poly_scale``, uplifted so
    the poly TOTAL bound dominates the per-key bound for every (dist, phi)
    REACHABLE ON FILM: ``poly_scale = min(r_max, keys[-1])`` (``r_max`` is
    the film-corner radius, sensor_half*sqrt(2)) is the fit-domain edge —
    the profile keys usually extend beyond the film corner into fully-dead
    radii (a cliff to the floor bound that no real ray ever samples), and
    fitting that cliff would cost ~0.5 rho of uplift for nothing.  Radii
    beyond ``poly_scale`` never evaluate the poly at all: the kernel
    disables the pre-check there (ADVICE r4 #2), so the unfitted
    extrapolation is unreachable.

    Returns ``(poly [4, D+1] Horner coefficients, poly_scale, deficit)``
    where ``deficit`` is the worst-case raw under-fit before the uplift:
    small deficits mean the poly is a tight sound replacement for the
    32-key select chain (the kernel gates on POLY_MAX_DEFICIT at compile
    time — LensSystem.profile_poly).

    Soundness: poly >= key-bound >= support on the whole fitted domain.
    The under-fit maximum is computed ANALYTICALLY, not grid-sampled
    (ADVICE r4 #1): on each key interval the lerped chain bound is linear
    in t and the fit is a degree-``POLY_DEGREE`` polynomial, so for any
    fixed azimuth the summed-bound difference is a polynomial in t whose
    interval max sits at an endpoint or a derivative root
    (:func:`_poly_interval_max`).  The azimuth enters only through the 4
    cosine basis weights; it is scanned on a dense grid, which is exact in
    the limit and Lipschitz-small between samples (the uplift pad covers
    it).  The key bound itself already carries the fit margins and the
    held-out validation loosening (build_profile), so no second MC
    validation pass is needed.
    """
    import numpy as np

    keys = np.asarray(profile.keys, np.float64)
    dmax = keys[-1]
    scale = dmax if r_max is None else min(float(r_max), dmax)
    tmax = 1.0
    # least-squares target on a dense grid (the grid only shapes the FIT;
    # soundness comes from the analytic uplift below)
    n_grid = (keys.shape[0] - 1) * 16 + 1
    d = np.union1d(
        np.linspace(0.0, tmax, n_grid) * scale, keys[keys <= scale]
    )
    t = d / scale
    c0, c1, c2, c4 = (
        np.asarray(v, np.float64)
        for v in profile_lookup(profile, jnp.asarray(d, jnp.float32))
    )
    targ = np.stack([c0, c1, c2, c4])                    # [4, n_grid]
    # float64 host fit (this runs OUTSIDE jit at compile time): plain
    # Vandermonde in t on [0, 1] is fine at this degree in f64
    v = t[:, None] ** np.arange(POLY_DEGREE + 1)[None, :]
    coef, *_ = np.linalg.lstsq(v, targ.T, rcond=None)    # [D+1, 4]

    # ---- analytic worst-case under-fit (deficit) ----------------------
    # Per key interval [k_i, k_{i+1}] (clipped to the fit domain) each
    # chain coefficient is linear in t; per azimuth phi the summed-bound
    # difference g(t) = sum_j w_j(phi) * (lin_j(t) - poly_j(t)) is a
    # degree-POLY_DEGREE polynomial — max it exactly per (interval, phi).
    phi = np.linspace(0.0, 2.0 * np.pi, 256, endpoint=False)
    w = np.stack(
        [np.ones_like(phi), np.cos(phi), np.cos(2 * phi), np.cos(4 * phi)]
    )                                                    # [4, n_phi]
    cc = np.stack(
        [
            np.asarray(profile.c0, np.float64),
            np.asarray(profile.c1, np.float64),
            np.asarray(profile.c2, np.float64),
            np.asarray(profile.c4, np.float64),
        ]
    )                                                    # [4, K]
    deficit = -np.inf
    edges = [0.0] + [float(k) for k in keys if 0.0 < k < scale] + [scale]
    for lo_d, hi_d in zip(edges[:-1], edges[1:]):
        if hi_d - lo_d <= 0:
            continue
        lo_t, hi_t = lo_d / scale, hi_d / scale
        # chain coefficients as linear polys in t on this interval: the
        # lerp runs between the bracketing keys (profile_lookup semantics)
        i_lb = min(int(np.ceil(hi_d / (keys[1] - keys[0]) - 1e-12)), len(keys) - 1)
        i_pr = max(i_lb - 1, 0)
        k_lb, k_pr = keys[i_lb], keys[i_pr]
        den = k_pr - k_lb
        out_v = np.zeros((4, 2))
        for j in range(4):
            if den != 0.0:
                # value(d) = c[lb] + (d - k_lb)/(k_pr - k_lb) * (c[pr]-c[lb])
                sl = (cc[j, i_pr] - cc[j, i_lb]) / den
                out_v[j, 0] = cc[j, i_lb] - k_lb * sl
                out_v[j, 1] = sl * scale       # d = t * scale
            else:
                out_v[j, 0] = cc[j, i_lb]
        # g coefficients per phi: [n_phi, D+1]
        lin = np.zeros((4, POLY_DEGREE + 1))
        lin[:, :2] = out_v
        gcoef = np.einsum("jp,jk->pk", w, lin - coef.T)
        deficit = max(deficit, _poly_interval_max(gcoef, lo_t, hi_t))

    poly = coef.T.copy()                                 # [4, D+1]
    # uplift + a pad for f32 Horner evaluation noise in-kernel and for
    # the azimuth-grid spacing (the bound is smooth in phi; 256 samples
    # leave a O((pi/256)^2 * |c|) residual, far below the pad)
    poly[0, 0] += max(deficit, 0.0) + 1e-4
    return (
        jnp.asarray(poly, jnp.float32),
        jnp.float32(scale),
        float(deficit),
    )


def profile_poly_eval(profile, dist: Array):
    """Evaluate the polynomial bound form (the kernel's in-SMEM math,
    expressed in jnp for tests/diagnostics): per-coefficient Horner in
    ``t = dist / poly_scale``, with the pre-check DISABLED (bound = +inf,
    every candidate passes to a full trace) beyond the fitted domain
    (ADVICE r4 #2 — the poly is neither fitted nor validated there)."""
    scale = (
        profile.poly_scale
        if profile.poly_scale is not None
        else profile.keys[-1]
    )
    t_raw = dist / scale
    t = jnp.minimum(t_raw, 1.0)
    deg = profile.poly.shape[1] - 1
    outs = []
    for j in range(4):
        acc = profile.poly[j, deg] * jnp.ones_like(t)
        for k in range(deg - 1, -1, -1):
            acc = acc * t + profile.poly[j, k]
        outs.append(acc)
    # beyond-domain disable: make every candidate pass.  Harmonic: the
    # constant term -> +inf.  Circles: the q slots -> +inf (the a slots
    # must stay finite — a huge center would REJECT half the disk).
    off = t_raw > 1.0
    big = jnp.float32(1e9)
    if getattr(profile, "kind", "harmonic") == "circles":
        outs[1] = jnp.where(off, big, outs[1])
        outs[3] = jnp.where(off, big, outs[3])
    else:
        outs[0] = jnp.where(off, big, outs[0])
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("n_samples", "domain"))
def _cover_trace(lens, key, radii, n_samples: int, domain: str):
    """Trace ``n_samples`` cover candidates per film radius through the
    stack under the ACTIVE sampling cover (LUT shaping when present, else
    naive first-element targeting).  Returns unit-domain offsets
    ``(lx, ly)`` and the per-candidate acceptance mask ``ok`` — the raw
    material every pre-check bound is fitted/validated on."""
    u = jax.random.uniform(key, (2, radii.shape[0], n_samples), dtype=jnp.float32)
    if domain == "square":
        lx = u[0] * 2.0 - 1.0
        ly = u[1] * 2.0 - 1.0
    else:
        rho = jnp.sqrt(u[0])
        phi = (u[1] * 2.0 - 1.0) * jnp.pi
        lx = rho * jnp.cos(phi)
        ly = rho * jnp.sin(phi)
    fx = jnp.broadcast_to(radii[:, None], lx.shape)
    if lens.lut is not None:
        ms, trn = lut_lookup(lens.lut, fx)
        px = lx * ms + trn
        py = ly * ms
    else:
        px = lx * lens.aperture[0]
        py = ly * lens.aperture[0]
    oz = jnp.zeros_like(fx) + lens.origin_shift
    ok = trace.trace_stack(
        lens,
        V3(fx, jnp.zeros_like(fx), oz),
        V3(px - fx, py, jnp.zeros_like(fx) - lens.thickness[0]),
    ).ok
    return lx, ly, ok


# Circle-cover fit knobs (build_circles).  Margins mirror the harmonic
# fit's measured (+0.005, x1.01) guard (build_profile; PERF_NOTES r3).
_CIRCLE_CENTERS = 241       # x-axis center grid over [-3, 3]
_CIRCLE_SEL_SAMPLES = 12_500  # subsample for the pair-selection pass
# Circle-poly fit degree: the centers accelerate toward the film corner
# (cat-eye), needing two extra degrees over the harmonic form's 6; the
# kernel cost is 8 more fma per ray (once — film radius is retry-
# invariant), vs the ~0.365 ms/M select chain the poly replaces.
CIRCLE_POLY_DEGREE = 8


def _fit_circles_np(lxn, lyn, okn):
    """Per-key 2-circle intersection cover of the accepted support
    (numpy, host side).  For each key, picks x-axis centers ``(a1 <= 0,
    a2 >= 0)`` minimizing the estimated candidate pass rate, with radii
    covering EVERY accepted sample plus the (x1.01, +0.005) margin.
    Returns (a1, q1, a2, q2) arrays with ``q_j = r_j^2 - a_j^2``; keys
    with no accepted samples get the reject-all circle (a=0, q=-1) — the
    dead-key pre-rejection that lets dead-heavy lenses burn their retry
    budget without tracing."""
    import numpy as np

    n_keys, n_s = okn.shape
    cand = np.linspace(-3.0, 3.0, _CIRCLE_CENTERS)
    negi = np.where(cand <= 0.0)[0]
    posi = np.where(cand >= 0.0)[0]
    sel = slice(None, None, max(1, n_s // _CIRCLE_SEL_SAMPLES))
    a1 = np.zeros(n_keys)
    q1 = np.full(n_keys, -1.0)
    a2 = np.zeros(n_keys)
    q2 = np.full(n_keys, -1.0)
    for k in range(n_keys):
        m = okn[k]
        if not m.any():
            continue  # reject-all
        px = lxn[k][m]
        py = lyn[k][m]
        # covering radius per candidate center, over ALL accepted samples
        d2 = (px[:, None] - cand[None, :]) ** 2 + (py**2)[:, None]
        rk = np.sqrt(d2.max(0)) * 1.01 + 0.005
        # pair selection on a subsample of ALL candidates (soundness does
        # not depend on this step — only the radii above bound anything)
        sx = lxn[k][sel]
        sy = lyn[k][sel]
        ds = (sx[:, None] - cand[None, :]) ** 2 + (sy**2)[:, None]
        inside = (ds <= (rk[None, :] ** 2)).astype(np.float32)
        joint = inside[:, negi].T @ inside[:, posi]  # [Nn, Np] pass counts
        flat = int(joint.argmin())
        bi, bj = negi[flat // posi.size], posi[flat % posi.size]
        a1[k], a2[k] = cand[bi], cand[bj]
        q1[k] = rk[bi] ** 2 - a1[k] ** 2
        q2[k] = rk[bj] ** 2 - a2[k] ** 2
    return a1, q1, a2, q2


def _circle_viol(a1, q1, a2, q2, lxn, lyn, okn):
    """Per-key q loosening needed so every accepted sample passes BOTH
    circles: max over accepted of (rho^2 - 2 a_j lx - q_j), per circle."""
    import numpy as np

    rr = lxn * lxn + lyn * lyn
    v1 = np.where(okn, rr - 2.0 * a1[:, None] * lxn - q1[:, None], -np.inf)
    v2 = np.where(okn, rr - 2.0 * a2[:, None] * lxn - q2[:, None], -np.inf)
    return (
        np.maximum(v1.max(1), 0.0),
        np.maximum(v2.max(1), 0.0),
    )


def build_precheck(
    lens: LensSystem,
    key: Array,
    n_samples: int = 50_000,
    domain: str = "disk",
    r_max: float = None,
):
    """Build the pupil pre-check bound, fitting BOTH forms from one shared
    trace budget and returning the tighter (smaller film-weighted
    E[bound-pass / accept] on the held-out set):

    * harmonic polar bound (the r2-r4 form, :func:`build_profile` math);
    * 2-circle intersection cover (r5): the cat-eye support IS an
      intersection of projected aperture circles, so two x-axis circles
      track it with ~4x less slack on the double-gauss (E 1.29 -> ~1.08)
      and a cheaper per-candidate test (2 fma + 2 cmp, no rsqrt/trig).

    Both forms share the fit methodology of :func:`build_profile`: fit on
    ``n_samples`` cover draws per key with the measured (x1.01, +0.005)
    margin, then loosen by any violation observed on an INDEPENDENT
    held-out set — at the keys AND (new in r5) at key midpoints, where the
    kernel evaluates the lerped chain (between-key soundness was
    previously implicit).  Residual risk is the MC tail beyond both sets,
    the same class as the reference's bare x1.05 LUT margin
    (zoic.cpp:1463), budgeted <= 0.2% (PARITY.md).

    Returns ``(PupilProfile(kind=..., poly filled when fitted),
    key_acceptance, poly_deficit)`` — ``poly_deficit`` is the poly form's
    tightness metric (rho units; inf when no poly could be fitted), gated
    by the caller at :data:`POLY_MAX_DEFICIT`.
    """
    import numpy as np

    from .system import PupilProfile

    lut = lens.lut
    n_keys = lut.keys.shape[0] if lut is not None else 32
    keys = (
        lut.keys
        if lut is not None
        else jnp.arange(n_keys, dtype=jnp.float32) * jnp.float32(FILM_WIDTH / 32)
    )
    keys_np = np.asarray(keys, np.float64)
    spacing = float(keys_np[1] - keys_np[0])

    # --- fit set + held-out set at the keys, midpoint held-out between --
    lx, ly, ok = _cover_trace(lens, key, keys, n_samples, domain)
    lxh, lyh, okh = _cover_trace(
        lens, jax.random.fold_in(key, 1), keys, n_samples, domain
    )
    mids = jnp.asarray(keys_np[:-1] + spacing * 0.5, jnp.float32)
    lxm, lym, okm = _cover_trace(
        lens, jax.random.fold_in(key, 2), mids, max(n_samples // 2, 1), domain
    )
    lxn, lyn, okn = (np.asarray(v) for v in (lx, ly, ok))
    lxhn, lyhn, okhn = (np.asarray(v) for v in (lxh, lyh, okh))
    lxmn, lymn, okmn = (np.asarray(v) for v in (lxm, lym, okm))
    key_acceptance = jnp.mean(ok.astype(jnp.float32), axis=1)

    rhon = np.sqrt(lxn * lxn + lyn * lyn)
    phin = np.arctan2(lyn, lxn)

    # --- harmonic fit (build_profile math, numpy f64) -------------------
    n_angles = 16
    bin_idx = np.clip(
        ((phin + np.pi) / (2 * np.pi) * n_angles).astype(np.int64), 0, n_angles - 1
    )
    rho_max = np.zeros((n_keys, n_angles))
    for k in range(n_keys):
        np.maximum.at(
            rho_max[k], bin_idx[k][okn[k]], rhon[k][okn[k]]
        )
    centers = (np.arange(n_angles) + 0.5) / n_angles * 2 * np.pi - np.pi
    basis = np.stack(
        [np.ones_like(centers), np.cos(centers), np.cos(2 * centers),
         np.cos(4 * centers)], -1
    )
    if lut is not None:
        coef, *_ = np.linalg.lstsq(basis, rho_max.T, rcond=None)  # [4, K]
        fit = basis @ coef
        excess = np.maximum((rho_max.T - fit).max(0), 0.0)
        hc0 = (coef[0] + excess + 0.005) * 1.01
        hc1, hc2, hc4 = coef[1] * 1.01, coef[2] * 1.01, coef[3] * 1.01
        # reject-all bound at keys with NO accepted cover sample: any bound
        # over an empty support is sound, and a provably-all-rejecting one
        # (max_phi B < 0) lets the kernel's dead-key short-circuit burn the
        # whole retry budget in O(1) instead of scanning 26 draws (the
        # circle form's (a=0, q=-1) analog, _fit_circles_np).  Set BEFORE
        # the held-out/midpoint violation passes so the lerped chain near
        # live/dead boundaries is validated against the final values.
        # -0.05 (not a deep negative): intervals with BOTH keys dead give
        # max_phi B = -0.05 < 0 either way (those dominate dead film
        # area), while the lerp across a live->dead transition interval
        # stays shallow — the bound between the validated key/midpoint
        # radii moves as little as possible from the old +0.005 fit.
        emp = ~okn.any(1)
        hc0 = np.where(emp, -0.05, hc0)
        hc1 = np.where(emp, 0.0, hc1)
        hc2 = np.where(emp, 0.0, hc2)
        hc4 = np.where(emp, 0.0, hc4)
    else:
        # naive cover: support rotates with film azimuth (no R(theta) in
        # the cover) — emit the rotation-invariant circumradius bound
        hc0 = (rho_max.max(1) + 0.005) * 1.01
        hc1 = hc2 = hc4 = np.zeros(n_keys)

    def _harm_viol(radii_idx_pairs, lx_s, ly_s, ok_s):
        rho_s = np.sqrt(lx_s * lx_s + ly_s * ly_s)
        phi_s = np.arctan2(ly_s, lx_s)
        out = np.zeros(n_keys)
        for row, (i_a, i_b, w_b) in enumerate(radii_idx_pairs):
            b = (
                (hc0[i_a] * (1 - w_b) + hc0[i_b] * w_b)
                + (hc1[i_a] * (1 - w_b) + hc1[i_b] * w_b) * np.cos(phi_s[row])
                + (hc2[i_a] * (1 - w_b) + hc2[i_b] * w_b) * np.cos(2 * phi_s[row])
                + (hc4[i_a] * (1 - w_b) + hc4[i_b] * w_b) * np.cos(4 * phi_s[row])
            )
            v = np.where(ok_s[row], rho_s[row] - b, -np.inf).max()
            if v > 0:
                out[i_a] = max(out[i_a], v)
                out[i_b] = max(out[i_b], v)
        return out

    # held-out at keys, then midpoints (lerped chain = kernel math)
    hc0 = hc0 + _harm_viol([(k, k, 0.0) for k in range(n_keys)], lxhn, lyhn, okhn)
    hc0 = hc0 + _harm_viol(
        [(k, k + 1, 0.5) for k in range(n_keys - 1)], lxmn, lymn, okmn
    )

    # --- circle fit ------------------------------------------------------
    a1, q1, a2, q2 = _fit_circles_np(lxn, lyn, okn)
    if lut is None:
        # rotation-invariant for the naive cover (see harmonic note)
        r_circ = rho_max.max(1) * 1.01 + 0.005
        a1 = a2 = np.zeros(n_keys)
        q1 = q2 = np.where(okn.any(1), r_circ**2, -1.0)
    else:
        # Smooth the selected center staircases (the argmin is quantized
        # to the 0.025 center grid) with the SAME degree-POLY_DEGREE
        # polynomial family the poly bound form fits — the chain and its
        # poly then agree to lerp error, keeping fit_circle_poly's
        # soundness uplift (and hence the poly form's slack) tiny.  Radii
        # are recomputed at the moved centers over ALL accepted samples,
        # so soundness is unaffected by the smoothing.
        rm_fit = min(float(r_max), float(keys_np[-1])) if r_max else float(
            keys_np[-1]
        )
        live = okn.any(1)
        tt = keys_np / rm_fit
        m = (keys_np <= rm_fit) & live
        if m.sum() >= 3:
            deg = min(POLY_DEGREE, int(m.sum()) - 1)
            vv = tt[m, None] ** np.arange(deg + 1)[None, :]
            for a in (a1, a2):
                co, *_ = np.linalg.lstsq(vv, a[m], rcond=None)
                a[m] = vv @ co
        for k in np.where(live)[0]:
            px, py = lxn[k][okn[k]], lyn[k][okn[k]]
            r1k = np.sqrt(((px - a1[k]) ** 2 + py**2).max()) * 1.01 + 0.005
            r2k = np.sqrt(((px - a2[k]) ** 2 + py**2).max()) * 1.01 + 0.005
            q1[k] = r1k**2 - a1[k] ** 2
            q2[k] = r2k**2 - a2[k] ** 2
    v1, v2 = _circle_viol(a1, q1, a2, q2, lxhn, lyhn, okhn)
    q1, q2 = q1 + v1, q2 + v2
    # midpoints: the kernel lerps (a, q); loosen BOTH bracketing keys
    a1m = (a1[:-1] + a1[1:]) * 0.5
    a2m = (a2[:-1] + a2[1:]) * 0.5
    q1m = (q1[:-1] + q1[1:]) * 0.5
    q2m = (q2[:-1] + q2[1:]) * 0.5
    v1m, v2m = _circle_viol(a1m, q1m, a2m, q2m, lxmn, lymn, okmn)
    # raising BOTH bracketing keys' q by >= the interval's violation
    # raises the lerped midpoint by >= it; a key shared by two intervals
    # takes the larger requirement
    for v, q in ((v1m, q1), (v2m, q2)):
        u = np.zeros_like(q)
        u[:-1] = v
        u[1:] = np.maximum(u[1:], v)
        q += u

    # --- pick the tighter form (film-weighted E proxy on held-out) ------
    acc_h = okhn.mean(1)
    rrh = lxhn * lxhn + lyhn * lyhn
    phih = np.arctan2(lyhn, lxhn)
    rhoh = np.sqrt(rrh)
    pass_harm = (
        rhoh
        <= hc0[:, None]
        + hc1[:, None] * np.cos(phih)
        + hc2[:, None] * np.cos(2 * phih)
        + hc4[:, None] * np.cos(4 * phih)
    ).mean(1)
    pass_circ = (
        ((rrh - 2 * a1[:, None] * lxhn) <= q1[:, None])
        & ((rrh - 2 * a2[:, None] * lxhn) <= q2[:, None])
    ).mean(1)
    rm = float(r_max) if r_max is not None else float(keys_np[-1])
    w = np.where(keys_np <= rm, np.maximum(keys_np, keys_np[1]), 0.0)
    live = (acc_h > 1e-6) & (w > 0)
    if live.any():
        e_h = float((w[live] * (pass_harm[live] / acc_h[live])).sum() / w[live].sum())
        e_c = float((w[live] * (pass_circ[live] / acc_h[live])).sum() / w[live].sum())
    else:
        e_h = e_c = 1.0
    kind = "circles" if e_c <= e_h else "harmonic"
    import logging

    logging.getLogger("zoic").info(
        "[ZOIC] pupil pre-check: E[pass/accept] harmonic %.3f, circles %.3f"
        " -> %s", e_h, e_c, kind,
    )
    chains = (a1, q1, a2, q2) if kind == "circles" else (hc0, hc1, hc2, hc4)
    prof = PupilProfile(
        keys=keys,
        c0=jnp.asarray(chains[0], jnp.float32),
        c1=jnp.asarray(chains[1], jnp.float32),
        c2=jnp.asarray(chains[2], jnp.float32),
        c4=jnp.asarray(chains[3], jnp.float32),
        poly=jnp.zeros((4, POLY_DEGREE + 1), jnp.float32),
        poly_scale=keys[-1],
        kind=kind,
    )

    # --- polynomial bound form ------------------------------------------
    # Harmonic: fit to the validated chain with the ANALYTIC domination
    # uplift (fit_profile_poly) — poly soundness reduces to chain
    # soundness.  Circles: the chain's per-key covering radii carry MC
    # max-statistic jitter no low-degree poly can dominate tightly
    # (measured 0.12 rho of forced uplift on the double-gauss), so the
    # circle poly is fitted DIRECTLY to the per-radius requirement against
    # its own smooth centers and validated on the same fit + held-out +
    # midpoint sets as the chain: its guarantee is the same
    # MC-at-the-validated-radii class as the chain itself (between
    # validated radii both rest on support continuity — the chain's lerp
    # is only ever CHECKED at the midpoints; PARITY.md cover-tail class).
    deficit = float("inf")
    if r_max is not None:
        if kind == "harmonic":
            poly, poly_scale, deficit = fit_profile_poly(prof, r_max=r_max)
            prof = dataclasses.replace(prof, poly=poly, poly_scale=poly_scale)
        else:
            rm_fit = min(float(r_max), float(keys_np[-1]))
            msk = keys_np <= rm_fit + 1e-9
            live_fit = okn.any(1)
            mid_msk = (keys_np[:-1] + spacing * 0.5) <= rm_fit + 1e-9
            if bool(live_fit[msk].all()) and int(msk.sum()) >= (
                CIRCLE_POLY_DEGREE + 2
            ):
                tk = keys_np[msk] / rm_fit
                tm = (keys_np[:-1] + spacing * 0.5)[mid_msk] / rm_fit
                vd = np.arange(CIRCLE_POLY_DEGREE + 1)
                vk = tk[:, None] ** vd[None, :]
                vm = tm[:, None] ** vd[None, :]
                vall = np.concatenate([vk, vm], 0)
                poly = np.zeros((4, CIRCLE_POLY_DEGREE + 1))
                deficit = 0.0
                for ci, (a_ch, _q_ch) in enumerate(((a1, q1), (a2, q2))):
                    ja, jq = 2 * ci, 2 * ci + 1
                    # center poly: fit the (smoothed) per-key centers
                    ca, *_ = np.linalg.lstsq(vk, a_ch[msk], rcond=None)
                    ak, am = vk @ ca, vm @ ca
                    a_all = np.concatenate([ak, am])
                    # per-radius requirement against the POLY centers,
                    # margined on the radius like the chain (x1.01, +5e-3)
                    req = np.empty(a_all.size)
                    for row, k in enumerate(np.where(msk)[0]):
                        sx = np.concatenate([lxn[k][okn[k]], lxhn[k][okhn[k]]])
                        sy = np.concatenate([lyn[k][okn[k]], lyhn[k][okhn[k]]])
                        req[row] = (
                            (sx - ak[row]) ** 2 + sy**2
                        ).max() if sx.size else 0.0
                    n_k = int(msk.sum())
                    for row, k in enumerate(np.where(mid_msk)[0]):
                        sx, sy = lxmn[k][okmn[k]], lymn[k][okmn[k]]
                        req[n_k + row] = (
                            (sx - am[row]) ** 2 + sy**2
                        ).max() if sx.size else 0.0
                    r_m = np.sqrt(req) * 1.01 + 0.005
                    q_req = r_m**2 - a_all**2
                    cq, *_ = np.linalg.lstsq(vall, q_req, rcond=None)
                    fitq = vall @ cq
                    cq[0] += np.maximum((q_req - fitq).max(), 0.0) + 1e-4
                    poly[ja], poly[jq] = ca, cq
                    # tightness: radius inflation of the poly circle over
                    # the margined requirement, at the validated radii
                    r_poly = np.sqrt(
                        np.maximum(vall @ cq + a_all**2, 0.0)
                    )
                    deficit = max(deficit, float((r_poly - r_m).max()))
                prof = dataclasses.replace(
                    prof,
                    poly=jnp.asarray(poly, jnp.float32),
                    poly_scale=jnp.float32(rm_fit),
                )
    return prof, key_acceptance, deficit


def fit_precheck_poly(profile, r_max: float = None):
    """Kind-dispatching poly fit for a bare profile: harmonic bounds use
    :func:`fit_profile_poly` (analytic domination uplift).  Circle-pair
    bounds have NO standalone refit — their poly is fitted directly to
    the per-radius requirement inside :func:`build_precheck` (it needs
    the cover sample sets) — so this returns an infinite deficit (poly
    form unavailable / gated off)."""
    if getattr(profile, "kind", "harmonic") == "circles":
        keys = profile.keys
        scale = keys[-1] if r_max is None else jnp.minimum(
            jnp.float32(r_max), keys[-1]
        )
        D = CIRCLE_POLY_DEGREE
        return (
            jnp.zeros((4, D + 1), jnp.float32), jnp.float32(scale),
            float("inf"),
        )
    return fit_profile_poly(profile, r_max=r_max)



def precheck_pass(profile, dist, lx, ly, use_poly: bool = False):
    """Does the pre-check bound PASS candidate offset (lx, ly) at film
    radius ``dist``?  Kind- and form-dispatching jnp evaluator (the
    kernel's math, for tests/diagnostics)."""
    vals = (
        profile_poly_eval(profile, dist)
        if use_poly
        else profile_lookup(profile, dist)
    )
    if getattr(profile, "kind", "harmonic") == "circles":
        a1, q1, a2, q2 = vals
        rr = lx * lx + ly * ly
        return ((rr - 2.0 * a1 * lx) <= q1) & ((rr - 2.0 * a2 * lx) <= q2)
    c0, c1, c2, c4 = vals
    rho = jnp.sqrt(lx * lx + ly * ly)
    phi = jnp.arctan2(ly, lx)
    return rho <= (
        c0 + c1 * jnp.cos(phi) + c2 * jnp.cos(2.0 * phi) + c4 * jnp.cos(4.0 * phi)
    )


def profile_lookup(profile, dist: Array):
    """Per-ray (c0, c1, c2, c4) interpolated over film radius — same
    uniform-key bracketing as :func:`lut_lookup`."""
    n = profile.keys.shape[0]
    spacing = profile.keys[1] - profile.keys[0]
    i_lb = jnp.clip(jnp.ceil(dist / spacing).astype(jnp.int32), 0, n - 1)
    i_prev = jnp.clip(i_lb - 1, 0, n - 1)
    denom = profile.keys[i_prev] - profile.keys[i_lb]
    perc = jnp.where(denom != 0.0, (dist - profile.keys[i_lb]) / denom, 0.0)
    perc = jnp.where(dist == 0.0, 0.0, perc)
    lerp = optics.lerp
    return (
        lerp(perc, profile.c0[i_lb], profile.c0[i_prev]),
        lerp(perc, profile.c1[i_lb], profile.c1[i_prev]),
        lerp(perc, profile.c2[i_lb], profile.c2[i_prev]),
        lerp(perc, profile.c4[i_lb], profile.c4[i_prev]),
    )
