"""DCC interop conversions (reference C24 semantics:
maya/scripts/makeZoicCamera.mel unit conversions)."""

import pytest

import zoic_tpu as zt
from zoic_tpu import interop


def test_maya_conversion_units():
    # 35mm full frame: 50mm lens, 1.417x0.945 inch film back
    cfg = interop.from_maya_camera(
        focal_length_mm=50.0,
        horizontal_film_aperture_in=1.41732,
        vertical_film_aperture_in=0.94488,
        focus_distance=150.0,
        f_stop=2.8,
    )
    assert cfg.focal_length == pytest.approx(5.0)          # mm -> cm (/10)
    assert cfg.sensor_width == pytest.approx(3.6, abs=1e-3)  # inch -> cm
    assert cfg.sensor_height == pytest.approx(2.4, abs=1e-3)
    assert cfg.focal_distance == 150.0
    assert cfg.fstop == 2.8
    assert cfg.use_dof


def test_node_parameter_round_trip():
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("tessar_f2.8"),
        focal_length=5.0,
        fstop=2.8,
        focal_distance=42.0,
        optical_vignetting_distance=1.5,
        exposure_control=0.5,
    )
    params = interop.to_node_parameters(cfg)
    # same names/defaults as the reference node (zoic.cpp:1547-1562)
    assert params["sensorWidth"] == 3.6
    assert params["lensModel"] == 1
    assert params["kolbSamplingLUT"] is True
    back = interop.from_node_parameters(params)
    assert back.lens_key() == cfg.lens_key()
    assert back.exposure_control == 0.5
