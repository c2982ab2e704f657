"""One-call debug render session: tape -> draw.zoic dump -> diagram PNG.

The reference's ``_DRAW`` flow spans the whole node lifecycle: the dump file
opens at ``node_update`` (zoic.cpp:1581-1584), the hot loop appends every
100,000th ray's element path (zoic.cpp:1758-1764), and ``node_finish``
closes the file and shells out to ``python draw.py`` to render the PNG
(zoic.cpp:1723, 1741-1742).  This module chains the framework's equivalents
(:mod:`zoic_tpu.diag.tape` -> :mod:`zoic_tpu.diag.dump` ->
:mod:`zoic_tpu.diag.draw`) into one call, done in-process instead of via the
reference's ``system()`` hop (the only inter-process boundary in the
reference, SURVEY.md §3.5).

Two entry points:

* :func:`render_debug_session` — pure-functional: generate rays for one
  sample batch with ``debug.draw`` semantics and produce dump + PNG.
* :func:`write_and_render` — used by :meth:`zoic_tpu.camera.Camera.finish`
  to flush segments accumulated across ``create_rays`` calls.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import CameraConfig, LensModel
from ..system import CameraState
from . import draw as draw_mod
from . import dump as dump_mod
from . import tape as tape_mod


def write_and_render(
    state: CameraState,
    config: CameraConfig,
    segments: List[np.ndarray],
    out_dir: str = ".",
) -> str:
    """Write ``draw.zoic`` from accumulated tape segments and render the
    ray-diagram PNG (``node_finish``'s close + draw.py hop,
    zoic.cpp:1734-1745).  Returns the PNG path."""
    os.makedirs(out_dir, exist_ok=True)
    dump_path = os.path.join(out_dir, "draw.zoic")
    png_path = os.path.join(out_dir, "lensDrawing.png")
    segs = (
        np.concatenate([np.asarray(s) for s in segments], axis=0)
        if segments
        else np.zeros((0, 4), np.float32)
    )
    if config.lens_model is LensModel.RAYTRACED:
        dump_mod.write(
            dump_path, state.lens, segs,
            sensor_height=float(config.sensor_height),
        )
    else:
        dump_mod.write_thinlens(dump_path, segs)
    draw_mod.render(dump_mod.parse_file(dump_path), png_path)
    return png_path


def render_debug_session(
    state: CameraState,
    config: CameraConfig,
    sx,
    sy,
    lensx,
    lensy,
    out_dir: str = ".",
    key=None,
) -> Tuple[str, Optional[object]]:
    """Generate rays for one sample batch AND produce the debug artifacts
    the reference's ``_DRAW`` build would leave behind: ``draw.zoic`` +
    ``lensDrawing.png`` in ``out_dir``.

    Functional one-shot equivalent of running a render with
    ``DebugOptions.draw`` set and calling :meth:`Camera.finish`
    (zoic.cpp:1581-1584, 1758-1764, 1741-1745).  Returns
    ``(png_path, (rays, stats))``.
    """
    from .. import camera as camera_mod

    rays, stats = camera_mod.create_rays(
        state, config, sx, sy, lensx, lensy, key
    )
    if config.lens_model is LensModel.RAYTRACED:
        segs = tape_mod.raytraced_tape(state, config, sx, sy, lensx, lensy)
    else:
        segs = tape_mod.thinlens_tape(
            state, sx, sy, rays.origin, rays.dir,
            stride=max(1, config.debug.draw_stride),
        )
    png = write_and_render(state, config, [segs], out_dir)
    return png, (rays, stats)
