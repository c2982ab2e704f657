"""Native host library vs Python implementations."""

import numpy as np
import pytest

import zoic_tpu.data as data
import zoic_tpu.lensfile as lensfile
import zoic_tpu.solve as solve
from zoic_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


@pytest.mark.parametrize("name", sorted(data.LENSES))
def test_native_parse_matches_python(name):
    path = data.lens_path(name)
    c, t, i, a, ap, ap_el = native.parse_lens(path)
    rx = lensfile.load(path)
    assert ap_el == rx.aperture_element
    np.testing.assert_allclose(c, np.asarray(rx.curvature, np.float64), rtol=1e-6)
    np.testing.assert_allclose(t, np.asarray(rx.thickness, np.float64), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(i, np.asarray(rx.ior, np.float64), rtol=1e-6)
    np.testing.assert_allclose(ap, np.asarray(rx.aperture, np.float64), rtol=1e-6)


def test_native_solvers_match_jax():
    """The float64 native solvers agree with the float32 JAX solvers to
    float32 precision — a precision cross-check in both directions."""
    path = data.lens_path("double_gauss_f2.0")
    c, t, i, a, ap, ap_el = native.parse_lens(path)
    focal, pp, fp = native.trace_focal(c, t, i, ap)

    rx = lensfile.load(path)
    tj = solve.trace_focal_length(solve.from_lensfile(rx))
    assert float(tj.focal_length) == pytest.approx(focal, rel=2e-5)
    assert float(tj.principal_plane) == pytest.approx(pp, rel=2e-4)

    ratio = 5.0 / focal
    import ctypes  # noqa: F401

    lib = native.load()
    for arr in (c, t, ap):
        arr *= ratio
    img = native.image_distance(c, t, i, ap, 100.0)
    import jax.numpy as jnp

    p2 = solve.rescale(solve.from_lensfile(rx), jnp.float32(5.0) / tj.focal_length)
    img_j = float(solve.image_distance(p2, jnp.float32(100.0)))
    assert img_j == pytest.approx(img, rel=5e-5, abs=5e-4)
