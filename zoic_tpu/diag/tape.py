"""Ray tape: batched debug recording of per-element hit points.

The reference dumps every 100,000th ray's element-by-element 2D path to
``draw.zoic`` while rendering (zoic.cpp:1758-1764, 1121-1153).  The
TPU-native analog records the full per-element hit tape for a strided
sub-batch in one extra traced pass (``trace_stack(record_tape=True)``) and
converts it to the dump's segment convention.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import trace
from ..config import CameraConfig
from ..optics import V3
from ..system import CameraState

Array = jnp.ndarray


def raytraced_tape(
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    stride: Optional[int] = None,
) -> np.ndarray:
    """Trace a strided sub-batch recording hits; return [S, 4] dump segments
    (z1, y1, z2, y2), already in the dump's negated convention and with the
    final 10000-unit exit extension (zoic.cpp:1146-1153).

    Mirrors the reference's DRAW-mode framing: the drawn first attempt uses
    film x = 0 (zoic.cpp:1858-1860) and no retries.
    """
    lens = state.lens
    stride = stride or config.debug.draw_stride
    sel = slice(0, None, max(1, stride))
    sx, sy = sx[sel], sy[sel]
    lensx, lensy = lensx[sel], lensy[sel]

    oy = sy * (state.sensor_width * 0.5)
    ox = jnp.zeros_like(oy)  # draw-mode zeroes film x (zoic.cpp:1859)
    oz = jnp.zeros_like(oy) + lens.origin_shift

    from ..models.raytraced import _shaping_params

    ms, tr_, sn, cs = _shaping_params(state, config, ox, oy)
    from ..sampling import concentric_disk_sample

    lx, ly = concentric_disk_sample(lensx, lensy)
    ax = lx * ms + tr_
    ay = ly * ms
    ty = ax * sn + ay * cs
    dy = ty - oy
    dz = jnp.zeros_like(oy) - lens.thickness[0]
    dx = jnp.zeros_like(oy)  # draw-mode zeroes dir x (zoic.cpp:1877)

    res = trace.trace_stack(
        lens, V3(ox, oy, oz), V3(dx, dy, dz), record_tape=True
    )

    # segments: film point -> hit1, hit1 -> hit2, ..., hitE -> exit*10000
    tz = np.asarray(res.tape_z)  # [E, S]
    ty_ = np.asarray(res.tape_y)
    e, s = tz.shape
    segs = []
    prev_z, prev_y = np.asarray(oz), np.asarray(oy)
    for i in range(e):
        hz, hy = tz[i], ty_[i]
        valid = np.isfinite(hz)
        segs.append(
            np.stack([-prev_z[valid], -prev_y[valid], -hz[valid], -hy[valid]], -1)
        )
        prev_z = np.where(valid, hz, prev_z)
        prev_y = np.where(valid, hy, prev_y)
    ok = np.asarray(res.ok)
    dzn = np.asarray(res.direction.z)
    dyn = np.asarray(res.direction.y)
    exit_z = prev_z + dzn * -10000.0
    exit_y = prev_y + dyn * -10000.0
    segs.append(
        np.stack([-prev_z[ok], -prev_y[ok], exit_z[ok], exit_y[ok]], -1)
    )
    return np.concatenate(segs, axis=0)


def thinlens_tape(
    state: CameraState,
    sx: Array,
    sy: Array,
    origin: Array,
    direction: Array,
    stride: int = 1,
) -> np.ndarray:
    """Thin-lens dump segments (zoic.cpp:1833-1841): origin -> far point
    along the pre-flip direction."""
    o = np.asarray(origin)[::stride]
    d = np.asarray(direction)[::stride]
    # output dir already has z flipped; the dump uses dir.z * -10000 pre-flip
    return np.stack(
        [o[:, 2], o[:, 1], d[:, 2] * 10000.0, d[:, 1] * 10000.0], -1
    )
