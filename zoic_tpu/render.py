"""Image-space sample generation and whole-frame ray generation.

The reference is driven by Arnold's sampler, which hands
``camera_create_ray`` per-AA-sample screen/lens coordinates bucket by bucket
(SURVEY.md §1 L0/L3).  This module is the standalone replacement for that
host-renderer loop: build the full frame's (screen-UV, lens-UV) sample
arrays on device and map them to rays in one (or a few) launches.

Screen convention matches the reference: ``sx, sy`` span [-1, 1] with sy
flipped per raster row order (Arnold's screen space has +y up; we emit
raster order and flip sy so image row 0 is the top).  Samples are emitted in
raster order — film-coherent tiles resolve vignette retries in fewer masked
rounds on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .camera import create_rays
from .config import CameraConfig
from .system import CameraState, RayBatch, RayStats

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FrameSpec:
    """Frame geometry: resolution and AA sample count per pixel."""

    width: int
    height: int
    spp: int = 1

    @property
    def n_samples(self) -> int:
        return self.width * self.height * self.spp


def frame_samples(
    spec: FrameSpec,
    key: Optional[Array] = None,
    jitter: bool = True,
) -> Tuple[Array, Array, Array, Array]:
    """Generate [W*H*spp] sample arrays (sx, sy, lensu, lensv) in raster
    order (pixel-major, spp-minor).  ``jitter`` adds stratified in-pixel
    offsets; otherwise samples sit at pixel centers."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = spec.n_samples
    idx = jnp.arange(n, dtype=jnp.int32)
    pix = idx // spec.spp
    px = (pix % spec.width).astype(jnp.float32)
    py = (pix // spec.width).astype(jnp.float32)

    ku, kl = jax.random.split(key)
    if jitter:
        off = jax.random.uniform(ku, (2, n), dtype=jnp.float32)
    else:
        off = jnp.full((2, n), 0.5, jnp.float32)
    sx = (px + off[0]) / spec.width * 2.0 - 1.0
    sy = -((py + off[1]) / spec.height * 2.0 - 1.0)
    lens = jax.random.uniform(kl, (2, n), dtype=jnp.float32)
    return sx, sy, lens[0], lens[1]


def render_rays(
    state: CameraState,
    config: CameraConfig,
    spec: FrameSpec,
    key: Optional[Array] = None,
    jitter: bool = True,
) -> Tuple[RayBatch, RayStats]:
    """Whole-frame ray generation: the batched equivalent of Arnold calling
    ``camera_create_ray`` for every AA sample of every pixel."""
    if key is None:
        key = jax.random.PRNGKey(0)
    ks, kr = jax.random.split(key)
    sx, sy, lu, lv = frame_samples(spec, ks, jitter)
    return create_rays(state, config, sx, sy, lu, lv, kr)


def weight_image(spec: FrameSpec, rays: RayBatch) -> Array:
    """Average ray weight per pixel as an [H, W] image — renders the
    vignetting falloff (the visual the reference's users judge the camera
    by)."""
    w = rays.weight.reshape(spec.height, spec.width, spec.spp)
    return jnp.mean(w, axis=-1)
