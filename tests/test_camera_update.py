"""Camera.update change-detection semantics (VERDICT r4 weak #4/#3).

The reference splits ``node_update`` work by two change keys
(zoic.cpp:595-611): ``bokehChanged`` re-reads the bokeh image
(zoic.cpp:1587-1593) and ``lensChanged`` re-runs the lens pipeline.  Our
``Camera.update`` must (a) reuse the compiled lens pytree — LUT arrays
included — on a bokeh-path-only change, (b) reuse the camera's original
``lut_key`` on a full recompile so the Monte-Carlo LUT cannot silently
change under the user, and (c) refresh scalar passthrough fields
(exposure, empirical-vignetting params) that the reference reads per-ray.

Also covers the iris refract-identity machine check: ``compile_camera``
must verify the ``c1 > 0`` invariant by probing the actual lens
(trace.iris_c1_probe) instead of trusting IOR equality alone.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu as zt
from zoic_tpu import trace
from zoic_tpu.optics import V3


def _bokeh_file(tmp_path, name, r2=0.8):
    yy, xx = np.mgrid[-1:1:32j, -1:1:32j]
    img = ((xx**2 + yy**2) < r2).astype(np.float32)
    p = str(tmp_path / name)
    np.save(p, np.stack([img, img, img], -1))
    return p + ".npy"


def _cfg(**kw):
    kw.setdefault("lens_model", zt.LensModel.RAYTRACED)
    kw.setdefault("lens_data_path", zt.data.lens_path("double_gauss_f2.0"))
    kw.setdefault("focal_length", 5.0)
    kw.setdefault("fstop", 2.0)
    kw.setdefault("focal_distance", 100.0)
    kw.setdefault("lut_bounds_samples", 20_000)
    return zt.CameraConfig(**kw)


def test_update_semantics(tmp_path):
    bok_a = _bokeh_file(tmp_path, "a", 0.8)
    bok_b = _bokeh_file(tmp_path, "b", 0.5)

    cfg = _cfg(use_image=True, bokeh_path=bok_a)
    key = jax.random.PRNGKey(123)
    cam = zt.Camera(cfg, lut_key=key)
    lens_before = cam.state.lens
    bokeh_before = cam.state.bokeh

    # (a) bokeh-path-only change: image rebuilt, lens pytree reused
    # unchanged (the solve never reads the bokeh image)
    cam.update(cfg.replace(bokeh_path=bok_b))
    assert cam.state.lens is lens_before
    assert cam.state.bokeh is not bokeh_before
    assert cam.state.bokeh.cdf_row.shape == bokeh_before.cdf_row.shape
    assert not np.array_equal(
        np.asarray(cam.state.bokeh.cdf_row), np.asarray(bokeh_before.cdf_row)
    )

    # (c) scalar passthrough refresh without any recompile: exposure and
    # the empirical-vignetting params are per-ray reads in the reference
    # (zoic.cpp:1802, 1980)
    lens_now = cam.state.lens
    cam.update(cam.config.replace(exposure_control=2.0))
    assert cam.state.lens is lens_now
    assert float(cam.state.exposure_control) == 2.0

    # (b) lens-solve change recompiles WITH the original lut_key: the
    # rebuilt LUT must be bit-identical to a fresh compile seeded with the
    # same key (no silent reseeding, VERDICT r4 weak #4)
    cfg2 = cam.config.replace(focal_distance=50.0)
    cam.update(cfg2)
    fresh = zt.compile_camera(cfg2, jax.random.PRNGKey(123))
    np.testing.assert_array_equal(
        np.asarray(cam.state.lens.lut.max_scale),
        np.asarray(fresh.lens.lut.max_scale),
    )
    np.testing.assert_array_equal(
        np.asarray(cam.state.lens.profile.c0),
        np.asarray(fresh.lens.profile.c0),
    )
    assert float(cam.state.lens.origin_shift) != float(
        lens_before.origin_shift
    )


def test_iris_c1_probe_positive_on_library():
    """Every shipped prescription satisfies the iris-identity invariant:
    c1 > 0 for all reached-iris rays under the widest (naive) cover —
    the condition that makes the kernel's refract skip bit-exact
    (zoic.cpp:1130-1144; trace_kernel._trace_block)."""
    cfg = _cfg()
    lens = zt.compile_camera(cfg).lens
    assert lens.iris_identity  # the probe ran inside compile and kept it

    rng = np.random.default_rng(3)
    n = 4096
    fx = jnp.asarray(
        rng.uniform(0.0, 2.2, n).astype(np.float32)
    )
    px = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32)) * lens.aperture[0]
    py = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32)) * lens.aperture[0]
    fz = jnp.zeros_like(fx) + lens.origin_shift
    c1, reached = trace.iris_c1_probe(
        lens,
        V3(fx, jnp.zeros_like(fx), fz),
        V3(px - fx, py, jnp.zeros_like(fx) - lens.thickness[0]),
    )
    r = np.asarray(reached)
    assert r.any()
    assert float(np.min(np.asarray(c1)[r])) > 0.0


def test_iris_identity_cleared_on_probe_violation(monkeypatch):
    """If the probe finds a grazing reached-iris ray (c1 <= 0), the
    compile must fall back to the exact refract chain."""
    def fake_probe(lens, o, d):
        c1 = jnp.full_like(o.x, -1e-3)
        return c1, jnp.ones_like(o.x, dtype=bool)

    monkeypatch.setattr(trace, "iris_c1_probe", fake_probe)
    lens = zt.compile_camera(_cfg(pupil_precheck=False,
                                  kolb_sampling_lut=False)).lens
    assert not lens.iris_identity
