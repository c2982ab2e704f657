"""Fused Pallas kernel vs the exact jnp path.

First attempts are deterministic (same uniforms through the same transform),
so with ``max_tries=0`` the two implementations must agree to float noise;
retry rounds differ only in RNG stream and are compared distributionally."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu as zt


def _cfg(impl, lut=True, **kw):
    kw.setdefault("focal_length", 5.0)
    kw.setdefault("fstop", 2.0)
    kw.setdefault("focal_distance", 100.0)
    return zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path(kw.pop("lens", "double_gauss_f2.0")),
        kolb_sampling_lut=lut,
        lut_bounds_samples=20_000,
        impl=impl,
        **kw,
    )


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(5)
    n = 2048
    return tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.uniform(-1, 1, n),
            rng.uniform(-1, 1, n),
            rng.uniform(0, 1, n),
            rng.uniform(0, 1, n),
        )
    )


@pytest.mark.parametrize("lut", [True, False], ids=["lut", "naive"])
def test_first_attempt_matches_jnp(samples, lut):
    sx, sy, u, v = samples
    key = jax.random.PRNGKey(0)

    cfg_j = _cfg("jnp", lut=lut, max_tries=0)
    state = zt.compile_camera(cfg_j)
    rays_j, _ = zt.create_rays(state, cfg_j, sx, sy, u, v, key)

    cfg_p = _cfg("pallas", lut=lut, max_tries=0)
    rays_p, _ = zt.create_rays(state, cfg_p, sx, sy, u, v, key)

    ok_j = np.asarray(rays_j.weight) > 0
    ok_p = np.asarray(rays_p.weight) > 0
    # The fused kernel pre-checks the PRIMARY sample against the pupil
    # profile (round-0 pre-check, r3).  The bound's MC cover tail can
    # reject a borderline sample the trace would accept — the same risk
    # class as the reference's own x1.05 LUT margin (zoic.cpp:1463;
    # PARITY.md).  Tolerate <=0.2% one-sided flips: the kernel may only
    # vignette extra, never accept a ray the exact trace rejects.
    flips = ok_j != ok_p
    assert not np.any(flips & ok_p), "kernel accepted a jnp-rejected ray"
    assert flips.sum() <= max(1, 0.002 * sx.shape[0])

    both = ok_j & ok_p
    d_j = np.asarray(rays_j.dir)[both]
    d_p = np.asarray(rays_p.dir)[both]
    o_j = np.asarray(rays_j.origin)[both]
    o_p = np.asarray(rays_p.origin)[both]
    assert float(np.sqrt(np.mean((d_j - d_p) ** 2))) < 1e-6
    assert float(np.sqrt(np.mean((o_j - o_p) ** 2))) < 1e-5


@pytest.mark.parametrize(
    "max_tries",
    [6, pytest.param(25, marks=pytest.mark.slow)],
    ids=["mt6", "mt25"],
)
def test_retry_rounds_distributional(samples, max_tries):
    """With retries on, success/vignetted proportions and the accepted-ray
    geometry must agree between implementations (different RNG streams)."""
    sx, sy, u, v = samples
    key = jax.random.PRNGKey(1)

    cfg_j = _cfg("jnp", max_tries=max_tries)
    state = zt.compile_camera(cfg_j)
    rays_j, st_j = zt.create_rays(state, cfg_j, sx, sy, u, v, key)
    cfg_p = _cfg("pallas", max_tries=max_tries)
    rays_p, st_p = zt.create_rays(state, cfg_p, sx, sy, u, v, key)

    n = sx.shape[0]
    assert int(st_j.success) + int(st_j.vignetted) == n
    assert int(st_p.success) + int(st_p.vignetted) == n
    # same vignetting rate within MC noise
    assert abs(int(st_j.vignetted) - int(st_p.vignetted)) < max(
        20, 0.1 * (int(st_j.vignetted) + 10)
    )
    # first-attempt successes (identical uniforms) already dominate; mean
    # exit direction of all successful rays should agree closely
    d_j = np.asarray(rays_j.dir)[np.asarray(rays_j.weight) > 0]
    d_p = np.asarray(rays_p.dir)[np.asarray(rays_p.weight) > 0]
    assert np.allclose(d_j.mean(0), d_p.mean(0), atol=5e-3)


def test_pallas_no_iris_lens(samples):
    # max_tries=6 keeps the interpret-mode run fast; the no-iris code path
    # (cull_r_sq from clear aperture only) is fully exercised either way
    sx, sy, u, v = samples
    cfg = _cfg("pallas", lens="telephoto_f5.0", fstop=5.0, focal_length=10.0,
               lut=True, max_tries=6)
    state = zt.compile_camera(cfg)
    rays, stats = zt.create_rays(state, cfg, sx, sy, u, v, jax.random.PRNGKey(2))
    assert bool(np.isfinite(np.asarray(rays.origin)).all())
    assert int(stats.success) + int(stats.vignetted) == sx.shape[0]


def test_static_flags_match_dynamic(samples):
    """The static topology specialization (LensSystem.iris_identity /
    elem_flags) vs the packed-column fallback: try/TIR accounting must
    be exact (the folds are the reference's own runtime gates moved to
    compile time); payloads agree to cross-program fma-schedule noise
    (the two variants compile to different instruction mixes even where
    the math is identical — e.g. ``tca + thc`` vs ``tca + thc*1.0``)."""
    import dataclasses
    from zoic_tpu.ops import trace_kernel

    sx, sy, u, v = samples
    cfg = _cfg("pallas", max_tries=0)
    state = zt.compile_camera(cfg)
    lens = state.lens
    assert lens.iris_identity and len(lens.elem_flags) == lens.count
    plain = dataclasses.replace(lens, iris_identity=False, elem_flags=())

    outs = [
        trace_kernel.raytraced_fused(
            lv, sx, sy, u, v, state.sensor_width, jnp.int32(3),
            max_tries=0, interpret=True, compact=False, use_lut=True,
            use_profile=False,
        )
        for lv in (lens, plain)
    ]
    (o1, d1, t1, r1), (o2, d2, t2, r2) = outs
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=6e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=6e-6)


@pytest.mark.slow
@pytest.mark.parametrize("lens_name", sorted(zt.data.LENSES))
def test_static_flags_match_dynamic_full_budget(samples, lens_name):
    """VERDICT r4 #4: the static topology specialization must be proven at
    the FULL retry budget on every shipped prescription, not just at
    max_tries=0 on the headline lens — try/TIR accounting bit-exact,
    payloads to cross-program fma noise."""
    import dataclasses
    from zoic_tpu.ops import trace_kernel

    sx, sy, u, v = samples
    cfg = _cfg("pallas", lens=lens_name, max_tries=25)
    state = zt.compile_camera(cfg)
    lens = state.lens
    assert lens.iris_identity and len(lens.elem_flags) == lens.count
    plain = dataclasses.replace(lens, iris_identity=False, elem_flags=())

    outs = [
        trace_kernel.raytraced_fused(
            lv, sx[:1024], sy[:1024], u[:1024], v[:1024],
            state.sensor_width, jnp.int32(3),
            max_tries=25, interpret=True, compact=False, use_lut=True,
            use_profile=False,
        )
        for lv in (lens, plain)
    ]
    (o1, d1, t1, r1), (o2, d2, t2, r2) = outs
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=6e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=6e-6)


def test_pallas_odd_batch_padding():
    """Batch sizes not divisible by the tile are padded and unpadded."""
    n = 1000  # not a multiple of 128
    rng = np.random.default_rng(9)
    sx = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    cfg = _cfg("pallas")
    state = zt.compile_camera(cfg)
    rays, stats = zt.create_rays(state, cfg, sx, sy, u, v, jax.random.PRNGKey(3))
    assert rays.origin.shape == (n, 3)
    assert int(stats.success) + int(stats.vignetted) == n


@pytest.mark.parametrize(
    "max_tries",
    [6, pytest.param(25, marks=pytest.mark.slow)],
    ids=["mt6", "mt25"],
)
def test_pallas_bokeh_image(samples, tmp_path, max_tries):
    """Image-based bokeh through the fused kernel (presampled attempt-0 +
    streamed retry-draw planes): first-attempt successes are bit-comparable
    to the jnp path (identical presampled offsets through the same
    transform); retry outcomes are compared distributionally."""
    import numpy as _np

    sx, sy, u, v = samples
    yy, xx = _np.mgrid[0:24, 0:24]
    r = _np.sqrt((yy - 11.5) ** 2 + (xx - 11.5) ** 2)
    img = (((r > 4) & (r < 9)).astype(_np.float32) + 0.01)
    path = str(tmp_path / "ring.npy")
    _np.save(path, _np.stack([img] * 3, -1))

    key = jax.random.PRNGKey(7)
    cfg_j = _cfg("jnp", max_tries=max_tries, use_image=True, bokeh_path=path)
    state = zt.compile_camera(cfg_j)
    rays_j, st_j = zt.create_rays(state, cfg_j, sx, sy, u, v, key)
    cfg_p = _cfg("pallas", max_tries=max_tries, use_image=True, bokeh_path=path)
    rays_p, st_p = zt.create_rays(state, cfg_p, sx, sy, u, v, key)

    n = sx.shape[0]
    assert int(st_p.success) + int(st_p.vignetted) == n
    assert abs(int(st_j.vignetted) - int(st_p.vignetted)) < max(
        20, 0.1 * (int(st_j.vignetted) + 10)
    )
    # rays that succeeded first-try on BOTH paths saw identical inputs
    d_j = np.asarray(rays_j.dir)
    d_p = np.asarray(rays_p.dir)
    both = (np.asarray(rays_j.weight) > 0) & (np.asarray(rays_p.weight) > 0)
    agree = np.all(np.abs(d_j - d_p) < 2e-5, axis=1) & both
    assert agree.sum() > 0.4 * n  # first-try successes dominate
    # and the overall accepted geometry matches distributionally
    assert np.allclose(
        d_j[both].mean(0), d_p[both].mean(0), atol=5e-3
    )


def test_profile_poly_matches_chain(samples):
    """Poly-bound pre-check vs the 32-key select chain: both bounds are
    sound (poly dominates the chain — test_pupil), so a pre-check rejection
    and a traced failure consume a try identically and every per-ray
    accept/fail trajectory must be BIT-identical; only which failing draws
    get TRACED differs.  Accepted payloads come from the same trace math on
    the same accepted candidate; they are compared at 1e-5 rather than
    bitwise because the two kernels are different compiled programs and
    XLA's fusion/FMA-contraction choices around the shared ms/trn lerp
    differ (measured: ~1.7% of rays move by ~1 ulp, <=1e-6, uniformly
    across compact/dual knobs — compiler-level, not semantic)."""
    import dataclasses
    from zoic_tpu.ops import trace_kernel

    sx, sy, u, v = samples
    cfg = _cfg("pallas", max_tries=6)
    state = zt.compile_camera(cfg)
    lens = state.lens
    assert lens.profile_poly, "headline lens should gate the poly on"
    chain = dataclasses.replace(lens, profile_poly=False)

    outs = [
        trace_kernel.raytraced_fused(
            lv, sx, sy, u, v, state.sensor_width, jnp.int32(3),
            max_tries=6, interpret=True, compact=True, use_lut=True,
            use_profile=True,
        )
        for lv in (lens, chain)
    ]
    (o1, d1, t1, r1), (o2, d2, t2, r2) = outs
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    acc = np.asarray(t1) <= 6  # weight_and_stats: tries > max_tries vignettes
    assert acc.mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(o1)[acc], np.asarray(o2)[acc], atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(d1)[acc], np.asarray(d2)[acc], atol=1e-5, rtol=0
    )


def test_dead_key_short_circuit_matches_scan():
    """Round-0 dead-key short-circuit A/B (r5): on a lens with
    provably-all-rejecting profile keys (fisheye: ~60% of the film is
    vignetted by design; pupil.build_precheck emits c0 = -1 at keys with
    no accepted cover sample), burning the whole budget in O(1) must be
    BIT-identical to running the pre-check scan — the short-circuit only
    skips draws the per-ray interpolated bound would reject one by one,
    and per-ray PRNG counters mean no other ray's stream shifts."""
    from zoic_tpu.ops import trace_kernel

    cfg = _cfg(
        "pallas", lens="fisheye_muller_f4.0", focal_length=1.0,
        fstop=4.0, max_tries=5,
    )
    state = zt.compile_camera(cfg)
    lens = state.lens
    prof = lens.profile
    assert prof.kind == "harmonic"
    bmax = np.asarray(prof.c0) + np.abs(np.asarray(prof.c1)) + np.abs(
        np.asarray(prof.c2)
    ) + np.abs(np.asarray(prof.c4))
    assert (bmax < 0).any(), "fisheye must have reject-all (dead) keys"

    rng = np.random.default_rng(11)
    n = 2048
    sx, sy = (
        jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
        for _ in range(2)
    )
    u, v = (
        jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        for _ in range(2)
    )

    def run():
        return [
            np.asarray(a)
            for a in trace_kernel.raytraced_fused(
                lens, sx, sy, u, v, state.sensor_width, jnp.int32(7),
                max_tries=5, use_lut=True, use_profile=True,
                interpret=True,
            )
        ]

    fast = run()
    orig = trace_kernel._bound_dead
    trace_kernel.raytraced_fused.clear_cache()
    try:
        # disable the short-circuit: every dead ray goes through the
        # full pre-check scan instead
        trace_kernel._bound_dead = lambda pcs, circles: jnp.zeros(
            pcs[0].shape, jnp.bool_
        )
        slow = run()
    finally:
        trace_kernel._bound_dead = orig
        trace_kernel.raytraced_fused.clear_cache()

    # a real fraction of rays must actually take the O(1) path
    assert (fast[2] == 6).mean() > 0.3  # tries == max_total, vignetted
    for a, b, name in zip(fast, slow, ("origin", "dir", "tries", "tir")):
        np.testing.assert_array_equal(a, b, err_msg=name)
