"""Demo: render vignetting/bokeh diagnostics for a lens through the full stack.

Usage (CPU works fine for small frames):
    env PYTHONPATH= JAX_PLATFORMS=cpu python examples/render_demo.py [lens_name]

Produces in ./out/: weight image (vignetting falloff), lens ray diagram,
exit-pupil comparison plot, and a draw.zoic dump.
"""

import os
import sys

import jax
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import zoic_tpu as zt
from zoic_tpu.diag import draw, dump, pupilplot, tape

def main():
    lens_name = sys.argv[1] if len(sys.argv) > 1 else "double_gauss_f2.0"
    os.makedirs("out", exist_ok=True)

    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.RAYTRACED,
        lens_data_path=zt.data.lens_path(lens_name),
        focal_length=5.0,
        fstop=zt.data.LENSES[lens_name].fstop,
        focal_distance=100.0,
        lut_bounds_samples=20_000,
    )
    cam = zt.Camera(cfg)

    spec = zt.FrameSpec(192, 128, spp=4)
    rays, stats = zt.render.render_rays(cam.state, cfg, spec, jax.random.PRNGKey(0))
    img = np.asarray(zt.render.weight_image(spec, rays))
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imsave(f"out/{lens_name}_vignetting.png", img, cmap="gray", vmin=0, vmax=1)
    print(f"vignetted: {float(stats.vignetted_percent()):.1f}%  "
          f"tir: {int(stats.tir)}  -> out/{lens_name}_vignetting.png")

    u = jax.random.uniform(jax.random.PRNGKey(1), (4, 4096))
    segs = tape.raytraced_tape(cam.state, cfg, u[0]*2-1, u[1]*2-1, u[2], u[3], stride=16)
    dump.write(f"out/{lens_name}.zoic", cam.state.lens, segs)
    draw.render(dump.parse_file(f"out/{lens_name}.zoic"), f"out/{lens_name}_diagram.png")
    print(f"-> out/{lens_name}_diagram.png ({segs.shape[0]} segments)")

    pupilplot.render_comparison(cam.state.lens, f"out/{lens_name}_pupil.png", film_grid=2)
    print(f"-> out/{lens_name}_pupil.png")

    cam.log_stats()

if __name__ == "__main__":
    main()
