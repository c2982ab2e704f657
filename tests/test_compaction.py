"""In-kernel straggler compaction vs the whole-tile retry loop.

The compacted machine (fold eras + bitonic unsort, trace_kernel.py) must be
*semantically identical* to the uncompacted loop: per-ray PRNG streams are
indexed by the ray's own try counter, so retry scheduling cannot change
which draws a ray consumes.  Gate: tries/tir bit-equal; ray payloads equal
to float noise (the two programs compile to different fma/reassociation
schedules, measured max |diff| ~2e-6 on retried rays only).
"""

import jax  # noqa: F401
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu as zt
from zoic_tpu.ops import trace_kernel


def _run(cfg, state, n, compact, seed=12345, max_tries=25, **kw):
    rng = np.random.default_rng(7)
    sx = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    lens = state.lens
    o, d, t, tir = trace_kernel.raytraced_fused(
        lens, sx, sy, u1, u2, state.sensor_width,
        jnp.int32(seed), max_tries=max_tries, interpret=True,
        compact=compact,
        use_lut=bool(cfg.kolb_sampling_lut),
        use_profile=bool(cfg.pupil_precheck and lens.profile is not None),
        **kw,
    )
    return tuple(np.asarray(a) for a in (o, d, t, tir))


@pytest.mark.parametrize(
    "lut,precheck,max_tries",
    [
        (True, True, 6),
        (True, False, 6),
        (False, False, 6),
        # whole-budget variants exercise every era of the fold schedule;
        # slow in interpret mode (~100s each), run with --slow
        pytest.param(True, True, 25, marks=pytest.mark.slow),
        pytest.param(True, False, 25, marks=pytest.mark.slow),
        pytest.param(False, False, 25, marks=pytest.mark.slow),
    ],
    ids=["lut+precheck", "lut", "naive",
         "lut+precheck-full", "lut-full", "naive-full"],
)
def test_compact_matches_whole_tile(lut, precheck, max_tries):
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
        kolb_sampling_lut=lut, lut_bounds_samples=5_000,
        pupil_precheck=precheck,
    )
    state = zt.compile_camera(cfg)
    n = 64 * 128 + 300  # >1 tile plus ragged padding
    oF, dF, tF, tirF = _run(cfg, state, n, compact=False, max_tries=max_tries)
    oT, dT, tT, tirT = _run(cfg, state, n, compact=True, max_tries=max_tries)

    # identical try accounting => identical weights, stats, vignetting
    np.testing.assert_array_equal(tF, tT)
    np.testing.assert_array_equal(tirF, tirT)
    # identical attempt selection => payloads equal to codegen float noise.
    # Rays that exhaust the budget (plentiful at mt=6, ~0.43^7 of rays) are
    # compared loosely: their output is the frozen partial state of the
    # LAST FAILED attempt, and a borderline cull decision flipping under
    # the two programs' fma schedules can freeze a different element —
    # legitimate float noise amplified, on rays whose weight is 0 anyway.
    live = tF <= max_tries
    np.testing.assert_allclose(oF[live], oT[live], atol=3e-6)
    np.testing.assert_allclose(dF[live], dT[live], atol=3e-6)
    np.testing.assert_allclose(oF, oT, atol=1e-3)
    np.testing.assert_allclose(dF, dT, atol=1e-3)
    # sanity: retries actually happened (the machinery was exercised)
    assert (tF > 0).any()


def test_compact_dual_trace():
    """Speculative second-candidate rounds (``dual_h``): forcing dual
    trace at EVERY region size must stay bit-identical to the sequential
    uncompacted loop — the scan-ahead consumes exactly the counters the
    next round would, and speculative draws only count when candidate
    1's trace fails (trace_kernel._round_core dual branch)."""
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
        kolb_sampling_lut=True, lut_bounds_samples=5_000,
        pupil_precheck=True,
    )
    state = zt.compile_camera(cfg)
    n = 16 * 128 + 77
    oF, dF, tF, tirF = _run(cfg, state, n, compact=False, max_tries=6)
    # round0_draws=8 rides along: a deeper round-0 scan must also be
    # trajectory-invariant (counters are per-ray try counts)
    oT, dT, tT, tirT = _run(cfg, state, n, compact=True, max_tries=6,
                            dual_h=128, round0_draws=8)
    np.testing.assert_array_equal(tF, tT)
    np.testing.assert_array_equal(tirF, tirT)
    live = tF <= 6
    # payload tolerance is the cross-program fma-schedule noise class of
    # the main A/B above; the dual program's extra speculative trace
    # shifts fusion enough for ~5e-6 worst-case on retried rays
    np.testing.assert_allclose(oF[live], oT[live], atol=6e-6)
    np.testing.assert_allclose(dF[live], dT[live], atol=6e-6)


def test_compact_dead_heavy_r0_burn():
    """Dead-heavy lenses burn the whole try budget in round 0's pre-check
    scan (round0_draws == max_total) and skip the bulk budget-burn era
    (_compaction_schedule ``r0_burned``): trajectories must stay
    bit-identical to the uncompacted whole-tile loop (PRNG counters are
    per-ray try counts, so round grouping is invisible), and most rays
    must exhaust the budget through pre-check rejections alone (the
    dead-film class, zoic.cpp:1458-1544)."""
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("telephoto_f5.0"),
        focal_length=10.0, fstop=5.0, focal_distance=30.0,
        kolb_sampling_lut=True, lut_bounds_samples=5_000,
        pupil_precheck=True,
    )
    state = zt.compile_camera(cfg)
    assert state.lens.dead_frac >= 0.6  # the r0-burn regime gate
    n = 16 * 128 + 77
    oF, dF, tF, tirF = _run(cfg, state, n, compact=False, max_tries=12)
    oT, dT, tT, tirT = _run(cfg, state, n, compact=True, max_tries=12)
    np.testing.assert_array_equal(tF, tT)
    np.testing.assert_array_equal(tirF, tirT)
    live = tF <= 12
    np.testing.assert_allclose(oF[live], oT[live], atol=6e-6)
    np.testing.assert_allclose(dF[live], dT[live], atol=6e-6)
    # sanity: the dead-film budget burn actually dominates this config
    assert (tF > 12).mean() > 0.3


def test_compact_tiny_budget():
    """max_tries=0: one retry round runs, partial state still updates
    (zoic.cpp:1766-1767 semantics) — identical across machines."""
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
        kolb_sampling_lut=True, lut_bounds_samples=5_000,
    )
    state = zt.compile_camera(cfg)
    n = 64 * 128
    oF, dF, tF, tirF = _run(cfg, state, n, compact=False, max_tries=0)
    oT, dT, tT, tirT = _run(cfg, state, n, compact=True, max_tries=0)
    np.testing.assert_array_equal(tF, tT)
    np.testing.assert_array_equal(tirF, tirT)
    np.testing.assert_allclose(oF, oT, atol=3e-6)
    np.testing.assert_allclose(dF, dT, atol=3e-6)
    assert (tF == 1).any()  # some rays consumed the single retry


def test_compact_presampled_bokeh():
    """Compacted presampled-bokeh retries (VERDICT r2 #5): the draw
    assignment is position-based (each pending ray reads streamed plane
    ``t % P`` under a per-cycle rotation), so compacted vs uncompacted are
    NOT bit-identical on retried rays — the A/B asserts what the scheme
    guarantees instead: identical attempt-0 results, equivalent retry
    outcome statistics, and exact try accounting."""
    import zoic_tpu.bokeh as bokeh_mod

    rng = np.random.default_rng(23)
    h = w = 24
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - 11.5) ** 2 + (xx - 11.5) ** 2)
    img = ((r > 4) & (r < 9)).astype(np.float32) + 0.01
    image = bokeh_mod.build(np.stack([img] * 3, -1))

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
        kolb_sampling_lut=True, lut_bounds_samples=5_000,
    )
    state = zt.compile_camera(cfg)
    n = 32 * 128 + 100
    max_tries = 6
    sx = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    u = rng.uniform(0, 1, (2, n)).astype(np.float32)
    l1, l2 = bokeh_mod.sample(image, jnp.asarray(u[0]), jnp.asarray(u[1]))
    n_planes = min(trace_kernel.BOKEH_PLANES, max_tries + 1)
    ur = rng.uniform(0, 1, (2, n_planes * n)).astype(np.float32)
    r1, r2 = bokeh_mod.sample(image, jnp.asarray(ur[0]), jnp.asarray(ur[1]))
    r1 = r1.reshape(n_planes, n)
    r2 = r2.reshape(n_planes, n)

    def run(compact):
        o, d, t, tir = trace_kernel.raytraced_fused(
            state.lens, sx, sy, l1, l2, state.sensor_width,
            jnp.int32(4242), max_tries=max_tries, interpret=True,
            compact=compact, use_lut=True, use_profile=False,
            presampled=True, retry_u1=r1, retry_u2=r2,
        )
        return tuple(np.asarray(a) for a in (o, d, t, tir))

    oF, dF, tF, _ = run(False)
    oT, dT, tT, _ = run(True)

    # attempt-0 is scheduling-independent: rays both machines accepted
    # first-try saw identical presampled offsets
    first = (tF == 0) & (tT == 0)
    assert first.sum() > 0.3 * n
    np.testing.assert_allclose(oF[first], oT[first], atol=3e-6)
    np.testing.assert_allclose(dF[first], dT[first], atol=3e-6)
    # try accounting stays within budget on both machines
    assert tF.max() <= max_tries + 1 and tT.max() <= max_tries + 1
    # equivalent retry statistics (same draw distribution, different
    # assignment): vignetted counts agree within MC noise
    vF = (tF > max_tries).sum()
    vT = (tT > max_tries).sum()
    assert abs(int(vF) - int(vT)) < max(30, 0.15 * (int(vF) + 20))
    assert np.isfinite(oT).all() and np.isfinite(dT).all()
    # directions stay unit-norm through the compacted unsort
    norm = np.linalg.norm(dT[tT <= max_tries], axis=-1)
    np.testing.assert_allclose(norm, 1.0, atol=1e-4)


@pytest.mark.parametrize("ovr", [0.6, 1.2], ids=["tight", "loose"])
def test_thinlens_compact_matches_whole_tile(ovr):
    """The thin-lens vignette retry machine under era-fold compaction is
    bit-identical to the whole-tile loop (per-ray try-indexed PRNG)."""
    n = 32 * 128 + 77
    rng = np.random.default_rng(31)
    sx = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    def run(compact):
        return tuple(
            np.asarray(a)
            for a in trace_kernel.thinlens_fused(
                sx, sy, u1, u2,
                jnp.float32(0.36), jnp.float32(1.785), jnp.float32(100.0),
                jnp.float32(4.0), jnp.float32(ovr), jnp.int32(999),
                use_dof=True, has_ov=True, max_tries=25,
                interpret=True, compact=compact,
            )
        )

    oF, dF, tF = run(False)
    oT, dT, tT = run(True)
    np.testing.assert_array_equal(tF, tT)
    np.testing.assert_allclose(oF, oT, atol=3e-6)
    np.testing.assert_allclose(dF, dT, atol=3e-6)


def test_presampled_profile_matches_no_precheck():
    """Image-bokeh pre-check (r4): with a SOUND square-domain bound, the
    pre-check must not change any first-attempt outcome (a bound-failing
    first sample fails the trace too), and retry statistics stay
    equivalent — draw SEQUENCES diverge (pre-checked rounds consume K
    plane indices per round vs 1), so retried rays are compared
    statistically, like the presampled compact-vs-whole-tile A/B."""
    import dataclasses

    yy, xx = np.mgrid[-1:1:24j, -1:1:24j]
    img = ((xx**2 + yy**2) < 0.8).astype(np.float32) + 0.01
    np.save("/tmp/zoic_test_bokeh_prof.npy", np.stack([img] * 3, -1))

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
        kolb_sampling_lut=True, lut_bounds_samples=5_000,
        use_image=True, bokeh_path="/tmp/zoic_test_bokeh_prof.npy",
        pupil_precheck=True, max_tries=6,
    )
    state = zt.compile_camera(cfg)
    assert state.lens.profile_domain == "square"
    n = 16 * 128 + 50
    rng = np.random.default_rng(11)
    sx = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    key = jax.random.PRNGKey(21)

    import zoic_tpu.camera as cam

    rays_p, stats_p = cam.create_rays(state, cfg, sx, sy, u1, u2, key)
    cfg_n = dataclasses.replace(cfg, pupil_precheck=False)
    rays_n, stats_n = cam.create_rays(state, cfg_n, sx, sy, u1, u2, key)

    wp = np.asarray(rays_p.weight)
    wn = np.asarray(rays_n.weight)
    dp = np.asarray(rays_p.dir)
    dn = np.asarray(rays_n.dir)
    # first-attempt outcomes are bitwise-shared: rays BOTH paths accepted
    # first-try saw the identical caller sample
    # (weight>0 and equal dirs); soundness makes the accept sets' first
    # attempts agree
    both_first = (wp > 0) & (wn > 0) & np.all(dp == dn, axis=-1)
    assert both_first.mean() > 0.5
    # equivalent retry statistics
    vp = int(np.asarray(stats_p.vignetted))
    vn = int(np.asarray(stats_n.vignetted))
    assert abs(vp - vn) < max(30, 0.15 * (vp + vn + 20))
    assert np.isfinite(dp).all()
    norm = np.linalg.norm(dp[wp > 0], axis=-1)
    np.testing.assert_allclose(norm, 1.0, atol=1e-4)
