"""Differentiability of the lens pipeline (TPU-native capability: the whole
trace is a pure JAX function, so lens parameters can be optimized by
gradient — impossible in the reference's per-ray C++)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu as zt
from zoic_tpu import solve, trace
from zoic_tpu.optics import V3
from zoic_tpu.sampling import concentric_disk_sample


@pytest.fixture(scope="module")
def lens():
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("tessar_f2.8"),
        focal_length=5.0, fstop=2.8, focal_distance=100.0,
        kolb_sampling_lut=False,
    )
    return zt.compile_camera(cfg).lens


def _spot_rms(lens, curvature, n=1024):
    lens = dataclasses.replace(
        lens, curvature=curvature,
        center=jnp.cumsum(lens.thickness) - curvature,
    )
    u = jax.random.uniform(jax.random.PRNGKey(0), (2, n), dtype=jnp.float32)
    lx, ly = concentric_disk_sample(u[0], u[1])
    px = lx * lens.user_aperture_radius * 2.0
    py = ly * lens.user_aperture_radius * 2.0
    z = jnp.zeros(n)
    res = trace.trace_stack(
        lens, V3(z, z, z + lens.origin_shift),
        V3(px, py, z - lens.thickness[0]),
    )
    t = (lens.focal_distance - res.origin.z) / res.direction.z
    hx = res.origin.x + res.direction.x * t
    hy = res.origin.y + res.direction.y * t
    w = res.ok.astype(jnp.float32)
    return jnp.sqrt(jnp.sum((hx * hx + hy * hy) * w) / jnp.maximum(jnp.sum(w), 1.0))


def test_grad_through_trace(lens):
    g = jax.grad(lambda c: _spot_rms(lens, c))(lens.curvature)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_gradient_descent_refocuses(lens):
    curv = lens.curvature.at[2].multiply(1.05)
    loss0 = float(_spot_rms(lens, curv))
    loss_grad = jax.jit(jax.value_and_grad(lambda c: _spot_rms(lens, c)))
    for _ in range(25):
        loss, g = loss_grad(curv)
        curv = curv - 2e-3 * g / (jnp.linalg.norm(g) + 1e-9)
    loss1 = float(_spot_rms(lens, curv))
    assert loss1 < 0.5 * loss0


def test_grad_through_focus_solver(lens):
    """The backwards focus solve is differentiable w.r.t. the object
    distance — focus breathing has a well-defined derivative."""
    rx_p = solve.Prescription(
        lens.curvature, lens.thickness, lens.ior, lens.abbe, lens.aperture
    )
    f = lambda od: solve.image_distance(rx_p, od)
    g = jax.grad(f)(jnp.float32(100.0))
    assert np.isfinite(float(g))
    # moving the object closer pushes the film plane away (more negative z)
    assert float(g) > 0.0
