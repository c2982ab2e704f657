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
    outs = []
    for j in range(4):
        acc = profile.poly[j, POLY_DEGREE] * jnp.ones_like(t)
        for k in range(POLY_DEGREE - 1, -1, -1):
            acc = acc * t + profile.poly[j, k]
        outs.append(acc)
    outs[0] = jnp.where(t_raw > 1.0, jnp.float32(1e9), outs[0])
    return tuple(outs)


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
