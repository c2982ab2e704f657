"""Golden parity tests against the standalone C++ oracle.

The oracle (tools/oracle/oracle.cpp) re-implements the reference camera
math in float32 C++ (the reference's precision class) with no Arnold
dependency; these tests enforce the BASELINE.json accuracy gate —
<1e-5 ray-direction RMSE vs the C++ implementation — plus scalar golden
agreement for every derived lens quantity, per lens file."""

import hashlib
import json
import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu as zt
import zoic_tpu.lensfile as lensfile
import zoic_tpu.solve as solve

ORACLE_SRC = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle", "oracle.cpp")

# Full 8-lens golden sweeps are slow (interpret-mode traces per lens); the
# default run keeps two representatives — the north-star Double-Gauss and
# the most numerically extreme design (fisheye: steep angles, heavy
# vignetting) — and marks the rest ``slow`` (VERDICT r2 #4).
_REPRESENTATIVE = {"double_gauss_f2.0", "fisheye_muller_f4.0"}


def _lens_params():
    return [
        pytest.param(
            n, marks=() if n in _REPRESENTATIVE else (pytest.mark.slow,)
        )
        for n in sorted(zt.data.LENSES)
    ]


@pytest.fixture(scope="session")
def oracle():
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    # cache the compiled oracle across sessions, keyed by source hash
    # (rebuilding every pytest session cost ~10s; VERDICT r2 #4)
    with open(ORACLE_SRC, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    exe = f"/tmp/zoic_oracle_{src_hash}"
    if not os.path.exists(exe):
        tmp = f"{exe}.build.{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", tmp, ORACLE_SRC], check=True
        )
        os.replace(tmp, exe)  # atomic under concurrent sessions

    def run(args, stdin=""):
        out = subprocess.run(
            [exe] + [str(a) for a in args],
            input=stdin,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(out.stdout)

    return run


SOLVE_PARAMS = dict(focal_length=5.0, fstop=2.0, focal_distance=100.0)


@pytest.mark.parametrize("name", _lens_params())
def test_solve_golden(oracle, name):
    """Every derived quantity of the lens-compile pipeline matches the C++
    oracle (reference pipeline zoic.cpp:1615-1698)."""
    path = zt.data.lens_path(name)
    want = oracle(["solve", path, 5.0, 2.0, 100.0])

    rx = lensfile.load(path)
    system, report = solve.solve_lens(
        rx,
        zt.CameraConfig(
            lens_model=zt.LensModel.RAYTRACED,
            lens_data_path=path,
            kolb_sampling_lut=False,
            **SOLVE_PARAMS,
        ),
    )
    assert system.count == want["count"]
    assert system.aperture_element == want["aperture_element"]
    rel = 2e-4  # float32 op-ordering differences across two implementations
    assert float(report["traced_focal_length_raw"]) == pytest.approx(want["focal_raw"], rel=rel)
    assert float(report["principal_plane_raw"]) == pytest.approx(want["pp_raw"], rel=rel)
    assert float(report["focal_length_ratio"]) == pytest.approx(want["ratio"], rel=rel)
    assert float(system.traced_focal_length) == pytest.approx(want["focal"], rel=rel)
    assert float(system.user_aperture_radius) == pytest.approx(
        want["user_aperture_radius"], rel=rel
    )
    assert float(system.origin_shift) == pytest.approx(
        want["origin_shift"], rel=3e-4, abs=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(system.curvature), np.asarray(want["curvature"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(system.thickness), np.asarray(want["thickness"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(system.aperture), np.asarray(want["aperture"]), rtol=1e-5
    )


@pytest.mark.parametrize("name", _lens_params())
def test_raytraced_first_attempt_rmse(oracle, name):
    """BASELINE gate: <1e-5 ray-direction RMSE vs the C++ implementation.

    First-attempt naive-targeting rays (deterministic; retries draw RNG and
    are validated distributionally elsewhere).  Compares ok-mask, origins
    and directions for 2048 rays."""
    path = zt.data.lens_path(name)
    n = 1024
    rng = np.random.default_rng(7)
    sx = rng.uniform(-1, 1, n).astype(np.float32)
    sy = rng.uniform(-1, 1, n).astype(np.float32)
    u = rng.uniform(0, 1, n).astype(np.float32)
    v = rng.uniform(0, 1, n).astype(np.float32)
    stdin = "\n".join(
        f"{a:.9g} {b:.9g} {c:.9g} {d:.9g}" for a, b, c, d in zip(sx, sy, u, v)
    )
    want = oracle(["trace", path, 5.0, 2.0, 100.0, n], stdin=stdin)
    w_ok = np.array([r["ok"] for r in want["rays"]])
    w_origin = np.array([r["origin"] for r in want["rays"]], np.float32)
    w_dir = np.array([r["dir"] for r in want["rays"]], np.float32)

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=path,
        kolb_sampling_lut=False,
        max_tries=0,  # first attempt only: 1 retry round happens but rays
        # that fail it keep pending->weight 0; ok-mask must still match the
        # deterministic first attempt, so compare via tries==0 successes.
        **SOLVE_PARAMS,
    )
    # max_tries=0 still runs one retry round; make it deterministic by
    # comparing only the first-attempt mask derived from weights+tries.
    state = zt.compile_camera(cfg)
    rays, stats = zt.create_rays(
        state, cfg, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(u), jnp.asarray(v),
        jax.random.PRNGKey(0),
    )
    got_ok = np.asarray(rays.weight) > 0.0
    # with max_tries=0: weight>0  <=>  first attempt succeeded
    np.testing.assert_array_equal(got_ok, w_ok)

    go = np.asarray(rays.origin)[got_ok]
    gd = np.asarray(rays.dir)[got_ok]
    wo = w_origin[w_ok]
    wd = w_dir[w_ok]
    dir_rmse = float(np.sqrt(np.mean((gd - wd) ** 2)))
    origin_rmse = float(np.sqrt(np.mean((go - wo) ** 2)))
    assert dir_rmse < 1e-5, f"direction RMSE {dir_rmse}"
    assert origin_rmse < 1e-4, f"origin RMSE {origin_rmse}"


@pytest.mark.parametrize("name", _lens_params())
def test_raytraced_lut_first_attempt_rmse(oracle, name):
    """North-star-config golden gate (VERDICT r1 #4): the LUT-shaped path —
    seeded exit-pupil LUT build (zoic.cpp:1391-1452) + shaping transform
    (zoic.cpp:1889-1924) + full trace — matches an independent C++
    implementation at <1e-5 direction RMSE, per lens.

    Both sides build the LUT from the IDENTICAL uniform stream (generated
    here, streamed to the oracle, injected into pupil.build_lut), making
    the Monte-Carlo build deterministic and bit-comparable."""
    import dataclasses

    import zoic_tpu.pupil as pupil

    path = zt.data.lens_path(name)
    n_film, n_samp, n = 32, 4096, 1024
    rng = np.random.default_rng(13)
    lut_u = rng.uniform(0, 1, (2, n_film, n_samp)).astype(np.float32)
    sx = rng.uniform(-1, 1, n).astype(np.float32)
    sy = rng.uniform(-1, 1, n).astype(np.float32)
    u = rng.uniform(0, 1, n).astype(np.float32)
    v = rng.uniform(0, 1, n).astype(np.float32)
    stdin = (
        "\n".join(f"{x:.9g}" for x in lut_u.reshape(-1))
        + "\n"
        + "\n".join(
            f"{a:.9g} {b:.9g} {c:.9g} {d:.9g}" for a, b, c, d in zip(sx, sy, u, v)
        )
    )
    want = oracle(
        ["tracelut", path, 5.0, 2.0, 100.0, n_film, n_samp, n], stdin=stdin
    )

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=path,
        kolb_sampling_lut=True,
        pupil_precheck=False,  # first attempt never uses the precheck
        lut_film_samples=n_film,
        lut_bounds_samples=64,  # placeholder build; replaced below
        max_tries=0,
        **SOLVE_PARAMS,
    )
    state = zt.compile_camera(cfg)
    lut = pupil.build_lut(
        state.lens, jax.random.PRNGKey(0), n_film, n_samp,
        uniforms=jnp.asarray(lut_u),
    )
    state = dataclasses.replace(
        state, lens=dataclasses.replace(state.lens, lut=lut)
    )

    # identical uniforms -> identical survivor sets -> identical bboxes, up
    # to borderline samples whose cull decision flips under the two
    # implementations' float op ordering (observed: 1/32 keys off by 2e-3
    # for the fisheye).  Bound that noise, then gate the rays exactly.
    np.testing.assert_allclose(
        np.asarray(lut.max_scale), np.asarray(want["max_scale"], np.float32),
        rtol=5e-3, atol=1e-5,
    )
    # a flipped boundary sample moves a bbox edge by the gap to the next
    # survivor (~0.02 for the fisheye's sparse extreme-angle pupils)
    np.testing.assert_allclose(
        np.asarray(lut.centroid_x), np.asarray(want["centroid"], np.float32),
        rtol=5e-3, atol=0.03,
    )

    # ray gate with the ORACLE's table injected on the Python side: the
    # shaping inputs are then bit-identical, so any residual is the
    # shaping transform + trace themselves (the <1e-5 target)
    lut = dataclasses.replace(
        lut,
        max_scale=jnp.asarray(want["max_scale"], jnp.float32),
        centroid_x=jnp.asarray(want["centroid"], jnp.float32),
    )
    state = dataclasses.replace(
        state, lens=dataclasses.replace(state.lens, lut=lut)
    )

    w_ok = np.array([r["ok"] for r in want["rays"]])
    w_origin = np.array([r["origin"] for r in want["rays"]], np.float32)
    w_dir = np.array([r["dir"] for r in want["rays"]], np.float32)
    rays, _ = zt.create_rays(
        state, cfg, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(u),
        jnp.asarray(v), jax.random.PRNGKey(0),
    )
    got_ok = np.asarray(rays.weight) > 0.0
    # LUT-shaped samples land exactly ON the pupil cover boundary, so a
    # handful of cull decisions legitimately flip with float op ordering
    # (observed 2/1024 for the fisheye; naive-path masks match exactly in
    # test_raytraced_first_attempt_rmse).
    agree = got_ok == w_ok
    assert agree.mean() > 0.995, f"ok-mask agreement {agree.mean():.4f}"
    both = got_ok & w_ok
    dir_rmse = float(np.sqrt(np.mean((np.asarray(rays.dir)[both] - w_dir[both]) ** 2)))
    origin_rmse = float(
        np.sqrt(np.mean((np.asarray(rays.origin)[both] - w_origin[both]) ** 2))
    )
    assert dir_rmse < 1e-5, f"direction RMSE {dir_rmse}"
    assert origin_rmse < 1e-4, f"origin RMSE {origin_rmse}"


def test_thinlens_first_attempt_rmse(oracle):
    n = 2048
    rng = np.random.default_rng(11)
    sx = rng.uniform(-1, 1, n).astype(np.float32)
    sy = rng.uniform(-1, 1, n).astype(np.float32)
    u = rng.uniform(0, 1, n).astype(np.float32)
    v = rng.uniform(0, 1, n).astype(np.float32)
    stdin = "\n".join(
        f"{a:.9g} {b:.9g} {c:.9g} {d:.9g}" for a, b, c, d in zip(sx, sy, u, v)
    )
    want = oracle(
        ["thinlens", 3.6, 2.4, 5.0, 1.4, 100.0, 4.0, 0.6, n], stdin=stdin
    )
    w_ok = np.array([r["ok"] for r in want["rays"]])
    w_origin = np.array([r["origin"] for r in want["rays"]], np.float32)
    w_dir = np.array([r["dir"] for r in want["rays"]], np.float32)

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.THINLENS,
        focal_length=5.0,
        fstop=1.4,
        focal_distance=100.0,
        use_dof=True,
        optical_vignetting_distance=4.0,
        optical_vignetting_radius=0.6,
        max_tries=0,
    )
    state = zt.compile_camera(cfg)
    rays, _ = zt.create_rays(
        state, cfg, jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(u), jnp.asarray(v),
        jax.random.PRNGKey(0),
    )
    got_ok = np.asarray(rays.weight) > 0.0
    np.testing.assert_array_equal(got_ok, w_ok)
    assert float(np.sqrt(np.mean((np.asarray(rays.dir)[got_ok] - w_dir[w_ok]) ** 2))) < 1e-5
    assert float(np.sqrt(np.mean((np.asarray(rays.origin)[got_ok] - w_origin[w_ok]) ** 2))) < 1e-5
    assert float(state.tan_fov) == pytest.approx(want["tan_fov"], rel=1e-6)
    assert float(state.aperture_radius) == pytest.approx(
        want["aperture_radius"], rel=1e-6
    )


def test_bokeh_sample_bit_parity(oracle):
    """The two-level CDF inversion must map identical uniforms to identical
    pixels (both sides use stable descending sorts; PARITY.md item 9)."""
    rng = np.random.default_rng(3)
    h = w = 16
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    n = 512
    ur = rng.uniform(0, 1, n).astype(np.float32)
    uc = rng.uniform(0, 1, n).astype(np.float32)
    stdin = (
        "\n".join(" ".join(f"{x:.9g}" for x in px) for px in img.reshape(-1, 3))
        + "\n"
        + "\n".join(f"{a:.9g} {b:.9g}" for a, b in zip(ur, uc))
    )
    want = np.array(oracle(["bokeh", w, h, n], stdin=stdin)["samples"], np.float32)

    import zoic_tpu.bokeh as bokeh

    image = bokeh.build(img)
    dx, dy = bokeh.sample(image, jnp.asarray(ur), jnp.asarray(uc))
    got = np.stack([np.asarray(dx), np.asarray(dy)], -1)
    np.testing.assert_allclose(got, want, atol=1e-6)
