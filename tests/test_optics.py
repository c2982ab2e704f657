"""Property tests for the geometric-optics primitives
(reference semantics: src/zoic.cpp:973-1049, 661-704)."""

import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu.optics as optics
import zoic_tpu.sampling as sampling
from zoic_tpu.optics import V3, v3


def _np(v):
    return np.asarray(v)


class TestFastTrig:
    def test_fast_sin_matches_reference_formula(self):
        x = np.linspace(-np.pi, np.pi, 1001).astype(np.float32)
        got = _np(optics.fast_sin(jnp.asarray(x)))
        # scalar reimplementation of the reference formula (zoic.cpp:661-668)
        PI = np.float32(optics.PI)
        xr = np.fmod(x + PI, PI * 2) - PI
        B, C, P = 4.0 / PI, -4.0 / (PI * PI), 0.225
        y = B * xr + C * xr * np.abs(xr)
        want = P * (y * np.abs(y) - y) + y
        np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-6)

    def test_fast_sin_accuracy(self):
        # Bhaskara-style approximation: within ~1e-3 of true sine
        x = np.linspace(-np.pi * 0.99, np.pi * 0.99, 401).astype(np.float32)
        got = _np(optics.fast_sin(jnp.asarray(x)))
        assert np.max(np.abs(got - np.sin(x))) < 2e-3

    def test_fast_cos_shift(self):
        x = np.linspace(-1.5, 1.5, 101).astype(np.float32)
        np.testing.assert_allclose(
            _np(optics.fast_cos(jnp.asarray(x))),
            _np(optics.fast_sin(jnp.asarray(x) + np.float32(optics.PI * 0.5))),
            atol=1e-6,
        )


class TestSphereIntersect:
    def test_on_axis_hit(self):
        # ray along +z from origin, sphere centered z=10 radius 2:
        # far-side solution at z = 12 (sign=+1 picks tca + thc)
        o = v3(0.0, 0.0, 0.0)
        d = v3(0.0, 0.0, 1.0)
        hit, miss = optics.ray_sphere_intersect(
            o, d, 10.0, 2.0, reverse=False, cull_miss=True
        )
        assert not bool(miss)
        assert float(hit.z) == pytest.approx(12.0, abs=1e-5)

    def test_negative_radius_picks_near_surface(self):
        o = v3(0.0, 0.0, 0.0)
        d = v3(0.0, 0.0, 1.0)
        hit, miss = optics.ray_sphere_intersect(
            o, d, 10.0, -2.0, reverse=False, cull_miss=True
        )
        assert float(hit.z) == pytest.approx(8.0, abs=1e-5)

    def test_reverse_flag(self):
        o = v3(0.0, 0.0, 0.0)
        d = v3(0.0, 0.0, 1.0)
        hit, _ = optics.ray_sphere_intersect(
            o, d, 10.0, 2.0, reverse=True, cull_miss=False
        )
        assert float(hit.z) == pytest.approx(8.0, abs=1e-5)

    def test_miss_cull(self):
        o = v3(0.0, 5.0, 0.0)  # closest approach 5 > radius 2
        d = v3(0.0, 0.0, 1.0)
        _, miss = optics.ray_sphere_intersect(
            o, d, 10.0, 2.0, reverse=False, cull_miss=True
        )
        assert bool(miss)
        # without real-ray culling the reference keeps going (abs discriminant)
        _, miss2 = optics.ray_sphere_intersect(
            o, d, 10.0, 2.0, reverse=False, cull_miss=False
        )
        assert not bool(miss2)

    def test_hit_on_sphere_surface(self, rng):
        # random rays that hit: |hit - center| == |radius|
        n = 256
        o = V3(*(jnp.asarray(rng.uniform(-0.5, 0.5, n), jnp.float32) for _ in range(3)))
        d = V3(
            jnp.asarray(rng.uniform(-0.2, 0.2, n), jnp.float32),
            jnp.asarray(rng.uniform(-0.2, 0.2, n), jnp.float32),
            jnp.ones(n, jnp.float32),
        )
        hit, miss = optics.ray_sphere_intersect(
            o, d, 10.0, 6.0, reverse=False, cull_miss=True
        )
        r = np.sqrt(
            _np(hit.x) ** 2 + _np(hit.y) ** 2 + (_np(hit.z) - 10.0) ** 2
        )
        ok = ~_np(miss)
        np.testing.assert_allclose(r[ok], 6.0, atol=1e-4)


class TestRefract:
    def test_straight_through_same_ior(self):
        i = v3(0.0, 0.0, 1.0)
        n = v3(0.0, 0.0, -1.0)
        t, tir = optics.refract(i, n, 1.5, 1.5, check_tir=True)
        assert not bool(tir)
        np.testing.assert_allclose(_np(t.z), 1.0, atol=1e-6)

    def test_snells_law(self):
        # incidence 30 deg from glass 1.5 into air: sin(t) = 1.5 sin(30)/1.0
        th_i = np.deg2rad(30.0)
        i = v3(np.sin(th_i), 0.0, np.cos(th_i))
        n = v3(0.0, 0.0, -1.0)
        t, tir = optics.refract(i, n, 1.5, 1.0, check_tir=True)
        assert not bool(tir)
        sin_t = float(t.x) / np.sqrt(float(t.x) ** 2 + float(t.z) ** 2)
        assert sin_t == pytest.approx(1.5 * np.sin(th_i), abs=1e-5)

    def test_tir_detection(self):
        # beyond critical angle for 1.5 -> 1.0 (~41.8 deg)
        th_i = np.deg2rad(60.0)
        i = v3(np.sin(th_i), 0.0, np.cos(th_i))
        n = v3(0.0, 0.0, -1.0)
        _, tir = optics.refract(i, n, 1.5, 1.0, check_tir=True)
        assert bool(tir)
        # TIR is only flagged when ior1 > ior2 (zoic.cpp:1019)
        _, tir2 = optics.refract(i, n, 1.0, 1.5, check_tir=True)
        assert not bool(tir2)
        # and only when check_tir (tracingRealRays)
        _, tir3 = optics.refract(i, n, 1.5, 1.0, check_tir=False)
        assert not bool(tir3)

    def test_unit_output_when_valid(self, rng):
        n_rays = 512
        i = optics.normalize(
            V3(*(jnp.asarray(rng.normal(size=n_rays), jnp.float32) for _ in range(3)))
        )
        nrm = optics.normalize(
            V3(*(jnp.asarray(rng.normal(size=n_rays), jnp.float32) for _ in range(3)))
        )
        t, tir = optics.refract(i, nrm, 1.0, 1.6, check_tir=True)
        mag = np.sqrt(_np(optics.norm2(t)))
        np.testing.assert_allclose(mag[~_np(tir)], 1.0, atol=1e-3)


class TestPlanesAndLines:
    def test_line_plane_y0(self):
        o = v3(0.0, 2.0, 0.0)
        d = v3(0.0, -1.0, 1.0)
        p = optics.line_plane_y0(o, d)
        assert float(p.y) == pytest.approx(0.0, abs=1e-6)
        assert float(p.z) == pytest.approx(2.0, abs=1e-5)

    def test_line_line_zy(self):
        # horizontal line y=1 crossing diagonal y=z: intersection (z=1, y=1)
        z, y = optics.line_line_zy(
            v3(0, 1, 0), v3(0, 1, 10), v3(0, 0, 0), v3(0, 5, 5)
        )
        assert float(z) == pytest.approx(1.0, abs=1e-5)
        assert float(y) == pytest.approx(1.0, abs=1e-5)


class TestConcentricDisk:
    def test_in_unit_disk(self, rng):
        u = jnp.asarray(rng.uniform(size=(2, 4096)), jnp.float32)
        x, y = sampling.concentric_disk_sample(u[0], u[1])
        r = np.sqrt(_np(x) ** 2 + _np(y) ** 2)
        # fastSin/fastCos warp can push slightly past 1.0
        assert np.max(r) < 1.01

    def test_uniformity(self, rng):
        u = jnp.asarray(rng.uniform(size=(2, 200_000)), jnp.float32)
        x, y = sampling.concentric_disk_sample(u[0], u[1])
        r2 = _np(x) ** 2 + _np(y) ** 2
        # area-uniform => r^2 ~ U[0,1]: mean 0.5, quartiles 0.25/0.75
        assert abs(float(np.mean(r2)) - 0.5) < 5e-3
        assert abs(float(np.quantile(r2, 0.25)) - 0.25) < 6e-3
        assert abs(float(np.quantile(r2, 0.75)) - 0.75) < 6e-3

    def test_center_input_is_finite(self):
        x, y = sampling.concentric_disk_sample(
            jnp.asarray([0.5], jnp.float32), jnp.asarray([0.5], jnp.float32)
        )
        assert np.isfinite(float(x[0])) and np.isfinite(float(y[0]))
        assert float(x[0]) == 0.0 and float(y[0]) == 0.0

    def test_corners_map_to_disk_edge(self):
        eps = 0.0
        corners_u = jnp.asarray([1.0, 0.0, 1.0, 0.0], jnp.float32)
        corners_v = jnp.asarray([1.0, 0.0, 0.0, 1.0], jnp.float32)
        x, y = sampling.concentric_disk_sample(corners_u, corners_v)
        r = np.sqrt(_np(x) ** 2 + _np(y) ** 2)
        np.testing.assert_allclose(r, 1.0, atol=5e-3)
