"""Aperture samplers.

Reference: the concentric (square -> disk) map ``concentricDiskSample``
(src/zoic.cpp:686-704, the Shirley/Cline improved mapping) and the sampler
dispatch sites (zoic.cpp:1787, 1870).  The image-based bokeh sampler lives in
:mod:`zoic_tpu.bokeh`.

Branches of the scalar code become masks; the two division-by-zero hazards
(``b/a`` and ``a/b``) are resolved with ``jnp.where`` guards that pick the
same branch the scalar code would have taken, so results are bit-identical
except for the measure-zero input (0.5, 0.5) where the reference computes
``0 * NaN`` (we return (0, 0)).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .optics import PI_OVER_2, PI_OVER_4, fast_cos, fast_sin

Array = jnp.ndarray


def concentric_disk_sample(ox: Array, oy: Array) -> Tuple[Array, Array]:
    """Map uniform samples on [0,1]^2 onto the unit disk, preserving
    uniformity (``concentricDiskSample``, zoic.cpp:686-704).

    Uses the reference's ``fastSin``/``fastCos`` approximations — these
    slightly warp the disk and that warp is part of reference behavior.
    """
    a = 2.0 * ox - 1.0
    b = 2.0 * oy - 1.0
    use_a = (a * a) > (b * b)
    r = jnp.where(use_a, a, b)
    # guard both divisions; the unselected branch's value is discarded
    safe_a = jnp.where(use_a, a, 1.0)
    safe_b = jnp.where(use_a, 1.0, jnp.where(b == 0.0, 1.0, b))
    phi = jnp.where(
        use_a,
        PI_OVER_4 * (b / safe_a),
        PI_OVER_2 - PI_OVER_4 * (a / safe_b),
    )
    return r * fast_cos(phi), r * fast_sin(phi)
