"""Differentiable lens design: optimize element geometry by gradient descent.

A capability the reference's per-ray C++ cannot offer: the whole trace
(`zoic_tpu.trace.trace_stack`) is a pure JAX function, so ray positions are
differentiable with respect to every lens parameter.  Here we take the
Tessar, perturb one surface curvature, and recover focus by minimizing the
RMS spot radius at the film plane with Adam — the classic "autofocus by
bending a surface" toy problem of differentiable optics.

Run: env PYTHONPATH= JAX_PLATFORMS=cpu python examples/lens_optimization.py
"""

import dataclasses

import jax
import jax.numpy as jnp
import optax

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import zoic_tpu as zt
from zoic_tpu import trace
from zoic_tpu.optics import V3
from zoic_tpu.sampling import concentric_disk_sample


def spot_rms(lens: zt.LensSystem, curvature: jnp.ndarray, n: int = 4096) -> jnp.ndarray:
    """RMS radius of the on-axis spot at the film plane, as a function of
    the element curvature vector."""
    lens = dataclasses.replace(
        lens,
        curvature=curvature,
        center=jnp.cumsum(lens.thickness) - curvature,
    )
    u = jax.random.uniform(jax.random.PRNGKey(0), (2, n), dtype=jnp.float32)
    lx, ly = concentric_disk_sample(u[0], u[1])
    # target the iris region for a well-conditioned bundle
    px = lx * lens.user_aperture_radius * 2.0
    py = ly * lens.user_aperture_radius * 2.0
    ox = jnp.zeros(n)
    oy = jnp.zeros(n)
    oz = jnp.zeros(n) + lens.origin_shift
    d = V3(px - ox, py - oy, jnp.zeros(n) - lens.thickness[0])
    res = trace.trace_stack(lens, V3(ox, oy, oz), d)

    # propagate exit rays backwards to the film plane z = origin_shift:
    # the traced state is pre-negation (exit point on the front element,
    # direction into the scene); reverse to find where the focused bundle
    # crosses the film-side focal plane at the focus distance
    t = (lens.focal_distance - res.origin.z) / res.direction.z
    hx = res.origin.x + res.direction.x * t
    hy = res.origin.y + res.direction.y * t
    w = res.ok.astype(jnp.float32)
    r2 = (hx * hx + hy * hy) * w
    return jnp.sqrt(jnp.sum(r2) / jnp.maximum(jnp.sum(w), 1.0))


def main():
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("tessar_f2.8"),
        focal_length=5.0,
        fstop=2.8,
        focal_distance=100.0,
        kolb_sampling_lut=False,
    )
    lens = zt.compile_camera(cfg).lens

    # perturb one glass surface: +8% curvature on element 2
    curv0 = lens.curvature.at[2].multiply(1.08)
    loss0 = spot_rms(lens, curv0)
    loss_ref = spot_rms(lens, lens.curvature)
    print(f"spot RMS: designed {loss_ref:.6f} cm | perturbed {loss0:.6f} cm")

    loss_grad = jax.jit(jax.value_and_grad(lambda c: spot_rms(lens, c)))
    opt = optax.adam(2e-3)
    c = curv0
    state = opt.init(c)
    for i in range(60):
        loss, g = loss_grad(c)
        updates, state = opt.update(g, state)
        c = optax.apply_updates(c, updates)
        if i % 10 == 0:
            print(f"  step {i:3d}: spot RMS {float(loss):.6f} cm")
    loss_final = spot_rms(lens, c)
    print(f"optimized spot RMS {float(loss_final):.6f} cm "
          f"(recovered {float(loss0 - loss_final) / float(loss0 - loss_ref + 1e-9) * 100:.0f}% "
          "of the perturbation)")


if __name__ == "__main__":
    main()
