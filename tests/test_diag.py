"""Diagnostics subsystem: dump round-trips, renderers, tape framing."""

import os

import jax
import numpy as np
import pytest

import zoic_tpu as zt
from zoic_tpu.diag import draw, dump, pupilplot, tape


@pytest.fixture(scope="module")
def cam():
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
        lut_bounds_samples=10_000,
    )
    return zt.Camera(cfg)


def test_reference_dump_parses_and_renders(tmp_path):
    ref_path = "/root/reference/src/draw.zoic"
    if not os.path.exists(ref_path):
        pytest.skip("reference dump unavailable")
    d = dump.parse_file(ref_path)
    assert d["LENSMODEL"] == "KOLB"
    assert d["LENSES"].shape[1] == 3
    assert d["RAYS"].shape[1] == 4
    out = tmp_path / "ref.png"
    draw.render(d, str(out))
    assert out.stat().st_size > 10_000


def test_tape_and_diagram(tmp_path, cam):
    n = 1024
    u = jax.random.uniform(jax.random.PRNGKey(0), (4, n))
    segs = tape.raytraced_tape(
        cam.state, cam.config, u[0] * 2 - 1, u[1] * 2 - 1, u[2], u[3], stride=4
    )
    assert segs.shape[1] == 4
    assert np.isfinite(segs).all()
    p = tmp_path / "dump.zoic"
    dump.write(str(p), cam.state.lens, segs)
    back = dump.parse_file(str(p))
    assert back["RAYS"].shape == segs.shape
    out = tmp_path / "diagram.png"
    draw.render(back, str(out))
    assert out.stat().st_size > 10_000


def test_pupil_comparison_renders(tmp_path, cam):
    out = tmp_path / "pupil.png"
    pupilplot.render_comparison(cam.state.lens, str(out), film_grid=1, n_gt=1000, n_ss=500)
    assert out.stat().st_size > 10_000


def test_header_matches_reference_field_layout(cam):
    hdr = dump.lens_header(cam.state.lens)
    for block in ["LENSMODEL{KOLB}", "LENSES{", "IOR{", "APERTUREELEMENT{",
                  "APERTUREDISTANCE{", "APERTURE{", "APERTUREMAX{",
                  "FOCUSDISTANCE{", "IMAGEDISTANCE{", "SENSORHEIGHT{"]:
        assert block in hdr


def test_aperture_selftest_dump_round_trip(tmp_path, cam):
    from zoic_tpu.diag import dump as dump_mod

    p = tmp_path / "testApertures.zoic"
    pupilplot.write_selftest_dump(
        cam.state.lens, str(p), film_grid=1, n_gt=500, n_ss=300
    )
    gt, ss = dump_mod.parse_aperture_test(str(p))
    assert len(gt) == 9 and len(ss) == 9
    # every SS row is fully populated; GT rows may be empty at corners
    assert all(r.shape == (300, 2) for r in ss)
    center = gt[4]  # film (0,0)
    # GT rows target the whole first element at 2x diameter over-cover
    # (zoic.cpp:1374-1376): only ~10-15% of probes survive even on-axis
    assert len(center) > 40
