"""Thin-lens fused kernel vs the exact jnp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu as zt


def _cfg(impl, **kw):
    kw.setdefault("focal_length", 5.0)
    kw.setdefault("fstop", 1.4)
    kw.setdefault("focal_distance", 100.0)
    return zt.CameraConfig(lens_model=zt.LensModel.THINLENS, impl=impl, **kw)


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(17)
    n = 4096
    return tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
            rng.uniform(0, 1, n), rng.uniform(0, 1, n),
        )
    )


def test_dof_first_attempt_matches_jnp(samples):
    sx, sy, u, v = samples
    key = jax.random.PRNGKey(0)
    cfg_j = _cfg("jnp", use_dof=True, max_tries=0,
                 optical_vignetting_distance=4.0, optical_vignetting_radius=0.6)
    st = zt.compile_camera(cfg_j)
    r_j, _ = zt.create_rays(st, cfg_j, sx, sy, u, v, key)
    cfg_p = _cfg("pallas", use_dof=True, max_tries=0,
                 optical_vignetting_distance=4.0, optical_vignetting_radius=0.6)
    r_p, _ = zt.create_rays(st, cfg_p, sx, sy, u, v, key)

    ok_j = np.asarray(r_j.weight) > 0
    ok_p = np.asarray(r_p.weight) > 0
    np.testing.assert_array_equal(ok_j, ok_p)
    np.testing.assert_allclose(
        np.asarray(r_j.dir)[ok_j], np.asarray(r_p.dir)[ok_j], atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_j.origin)[ok_j], np.asarray(r_p.origin)[ok_j], atol=2e-6
    )


def test_no_dof_matches_jnp(samples):
    sx, sy, u, v = samples
    cfg_j = _cfg("jnp", use_dof=False)
    st = zt.compile_camera(cfg_j)
    r_j, _ = zt.create_rays(st, cfg_j, sx, sy, u, v)
    cfg_p = _cfg("pallas", use_dof=False)
    r_p, _ = zt.create_rays(st, cfg_p, sx, sy, u, v)
    np.testing.assert_allclose(
        np.asarray(r_j.dir), np.asarray(r_p.dir), atol=2e-6
    )
    assert np.all(np.asarray(r_p.weight) == 1.0)
    np.testing.assert_array_equal(np.asarray(r_p.origin), 0.0)


def test_vignette_retry_rates_agree(samples):
    """Different RNG streams, same vignetting statistics."""
    sx, sy, u, v = samples
    kw = dict(use_dof=True, max_tries=25,
              optical_vignetting_distance=6.0, optical_vignetting_radius=0.35)
    cfg_j = _cfg("jnp", **kw)
    st = zt.compile_camera(cfg_j)
    _, s_j = zt.create_rays(st, cfg_j, sx, sy, u, v, jax.random.PRNGKey(1))
    cfg_p = _cfg("pallas", **kw)
    _, s_p = zt.create_rays(st, cfg_p, sx, sy, u, v, jax.random.PRNGKey(1))
    n = sx.shape[0]
    assert int(s_j.success) + int(s_j.vignetted) == n
    assert int(s_p.success) + int(s_p.vignetted) == n
    assert abs(int(s_j.vignetted) - int(s_p.vignetted)) < max(
        30, 0.1 * int(s_j.vignetted)
    )


def test_exposure_applied_both_paths(samples):
    sx, sy, u, v = samples
    for impl in ("jnp", "pallas"):
        cfg = _cfg(impl, use_dof=True, exposure_control=1.0)
        st = zt.compile_camera(cfg)
        r, _ = zt.create_rays(st, cfg, sx, sy, u, v)
        # e=1: weight *= 1 + 1 = 2 (zoic.cpp:1981-1984)
        assert float(np.asarray(r.weight).max()) == pytest.approx(2.0)


def test_hash_uniform_distribution():
    """The in-kernel counter-hash PRNG must be uniform and decorrelated."""
    import jax.numpy as jnp

    from zoic_tpu.ops.trace_kernel import _hash_uniform, _lane_ids

    shape = (512, 128)
    ids = _lane_ids(shape, 0)
    seed = jnp.int32(12345)
    u1 = np.asarray(_hash_uniform(ids, seed, jnp.int32(1), 0x11111111)).ravel()
    u2 = np.asarray(_hash_uniform(ids, seed, jnp.int32(1), 0x22222222)).ravel()
    u1b = np.asarray(_hash_uniform(ids, seed, jnp.int32(2), 0x11111111)).ravel()
    for u in (u1, u2, u1b):
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(np.quantile(u, 0.25) - 0.25) < 8e-3
    # decorrelated across salts and rounds
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.02
    assert abs(np.corrcoef(u1, u1b)[0, 1]) < 0.02
    # deterministic
    u1r = np.asarray(_hash_uniform(ids, seed, jnp.int32(1), 0x11111111)).ravel()
    np.testing.assert_array_equal(u1, u1r)


def test_image_bokeh_matches_jnp(samples, tmp_path_factory):
    """Image-bokeh thin-lens (no vignetting -> no retries) rides the fused
    kernel with pre-sampled offsets; results must match the jnp path
    exactly (deterministic: one CDF draw per ray on both sides)."""
    import os

    sx, sy, u, v = samples
    img = np.zeros((16, 16, 3), np.float32)
    img[4:12, 6:10] = 1.0
    d = tmp_path_factory.mktemp("bokeh")
    path = os.path.join(str(d), "b.npy")
    np.save(path, img)

    outs = {}
    for impl in ("jnp", "pallas"):
        cfg = _cfg(impl, use_dof=True, use_image=True, bokeh_path=path)
        st = zt.compile_camera(cfg)
        r, _ = zt.create_rays(st, cfg, sx, sy, u, v)
        outs[impl] = r
    np.testing.assert_allclose(
        np.asarray(outs["jnp"].origin), np.asarray(outs["pallas"].origin),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(outs["jnp"].dir), np.asarray(outs["pallas"].dir), atol=2e-6
    )


def test_image_bokeh_with_vignetting(samples, tmp_path_factory):
    """Image-bokeh + empirical vignetting through the fused kernel: retry
    redraws come from streamed bokeh planes; rates and accepted geometry
    must agree with the jnp path (different retry streams)."""
    sx, sy, u, v = samples
    rng = np.random.default_rng(23)
    img = rng.uniform(0.0, 1.0, (16, 16, 3)).astype(np.float32)
    d = tmp_path_factory.mktemp("bokeh_ov")
    path = str(d / "img.npy")
    np.save(path, img)

    key = jax.random.PRNGKey(11)
    res = {}
    for impl in ("jnp", "pallas"):
        cfg = _cfg(
            impl, use_dof=True, use_image=True, bokeh_path=path,
            optical_vignetting_distance=2.0, optical_vignetting_radius=0.8,
            max_tries=25,
        )
        state = zt.compile_camera(cfg)
        rays, stats = zt.create_rays(state, cfg, sx, sy, u, v, key)
        res[impl] = (rays, stats)

    n = sx.shape[0]
    (r_j, s_j), (r_p, s_p) = res["jnp"], res["pallas"]
    assert int(s_p.success) + int(s_p.vignetted) == n
    assert abs(int(s_j.vignetted) - int(s_p.vignetted)) < max(
        25, 0.1 * (int(s_j.vignetted) + 10)
    )
    w_j = np.asarray(r_j.weight) > 0
    w_p = np.asarray(r_p.weight) > 0
    d_j = np.asarray(r_j.dir)
    d_p = np.asarray(r_p.dir)
    # first-try successes saw identical presampled offsets
    agree = np.all(np.abs(d_j - d_p) < 2e-5, axis=1) & w_j & w_p
    assert agree.sum() > 0.3 * n
    assert np.allclose(d_j[w_j].mean(0), d_p[w_p].mean(0), atol=5e-3)
