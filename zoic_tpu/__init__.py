"""zoic-tpu: a TPU-native lens-simulation engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of zpelgrims/zoic
(the extended Arnold camera shader): thin-lens and raytraced (Kolb) camera
models, image-based bokeh, empirical optical vignetting, tabular lens
prescriptions, on-device focal/focus solvers, and exit-pupil LUT aperture
shaping — all as batched pure functions over device meshes instead of
per-ray C++ callbacks.

Quick start::

    import zoic_tpu as zt

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path("double_gauss_f2.0"),
        focal_length=5.0, fstop=2.0, focal_distance=100.0,
    )
    cam = zt.Camera(cfg)
    rays, stats = cam.create_rays(sx, sy, lensx, lensy, key=jax.random.PRNGKey(7))
"""

from . import (
    bokeh,
    data,
    diag,
    io,
    lensfile,
    optics,
    parallel,
    pupil,
    render,
    sampling,
    solve,
    trace,
)
from .camera import Camera, compile_camera, create_rays
from .config import CameraConfig, DebugOptions, LensModel
from .render import FrameSpec
from .system import BokehImage, CameraState, LensSystem, PupilLUT, RayBatch, RayStats

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraConfig",
    "CameraState",
    "BokehImage",
    "DebugOptions",
    "LensModel",
    "LensSystem",
    "PupilLUT",
    "RayBatch",
    "RayStats",
    "FrameSpec",
    "bokeh",
    "compile_camera",
    "create_rays",
    "data",
    "diag",
    "io",
    "lensfile",
    "optics",
    "parallel",
    "pupil",
    "render",
    "sampling",
    "solve",
    "trace",
    "__version__",
]
