"""Image-based bokeh aperture sampling via 2-level CDF inversion.

Reference: the ``imageData`` class (src/zoic.cpp:115-486) —
``bokehProbability`` (zoic.cpp:222-417) builds, from the bokeh image:

1. per-pixel luminance ``0.3 R + 0.59 G + 0.11 B`` (zoic.cpp:245);
2. a row CDF over *descending-sorted* row sums, with the permutation kept in
   ``rowIndices`` (zoic.cpp:308-339);
3. per-row CDFs over *descending-sorted* row-normalized pixel values, with
   global pixel indices kept in ``columnIndices`` (zoic.cpp:346-407).

``bokehSample`` (zoic.cpp:420-485) inverts both CDFs with
``std::upper_bound``, maps through the sorted-index indirection, re-centers
the pixel coordinates, flips, and scales to [-1, 1].

The descending-sort indirection changes *which* pixel a given (u, v) maps to
(not the distribution), so it is preserved for bit-compatible validation —
including the reference's integer-center quirks that mix width/height:
``row - (width-1)/2`` and ``col - (height-1)/2`` (zoic.cpp:441, 466).

Build runs on host NumPy (cold path, exact C++ float behavior is irrelevant
here because the CDF comparisons are exact on both sides for identical
inputs); sampling is a jittable batched double binary search with flat
gathers (no per-ray row materialization).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .system import BokehImage

Array = jnp.ndarray


def luminance(pixels: np.ndarray) -> np.ndarray:
    """Per-pixel luminance with the reference's channel fallbacks
    (zoic.cpp:238-245): grayscale uses channel 0 thrice, 2-channel images
    use ch1 for both G and B."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    c = pixels.shape[2]
    o1 = 1 if c >= 2 else 0
    o2 = 2 if c >= 3 else o1
    p = pixels.astype(np.float32)
    return p[:, :, 0] * np.float32(0.3) + p[:, :, o1] * np.float32(0.59) + p[:, :, o2] * np.float32(0.11)


def build(pixels: np.ndarray) -> BokehImage:
    """Construct sampler state from an ``[h, w, c]`` float image
    (``bokehProbability``, zoic.cpp:222-417)."""
    lum = luminance(np.asarray(pixels))
    h, w = lum.shape

    total = lum.sum(dtype=np.float64)
    if total <= 0:
        raise ValueError("bokeh image has zero total luminance")
    normalized = (lum / np.float32(total)).astype(np.float32)

    row_sums = normalized.sum(axis=1, dtype=np.float32)
    # std::sort with a strict > comparator; ties keep first-index-first under
    # stable sort, which we choose deterministically (the reference's
    # introsort tie order is unspecified).
    row_indices = np.argsort(-row_sums, kind="stable").astype(np.int32)
    cdf_row = np.cumsum(row_sums[row_indices], dtype=np.float32)

    with np.errstate(divide="ignore", invalid="ignore"):
        per_row = np.where(
            (normalized != 0) & (row_sums[:, None] != 0),
            normalized / row_sums[:, None],
            0.0,
        ).astype(np.float32)

    # columnIndices hold *global* pixel indices, sorted desc within each row
    # (zoic.cpp:376-382).
    order = np.argsort(-per_row, axis=1, kind="stable").astype(np.int32)
    col_indices = order + (np.arange(h, dtype=np.int32) * w)[:, None]
    sorted_vals = np.take_along_axis(per_row, order, axis=1)
    cdf_col = np.cumsum(sorted_vals, axis=1, dtype=np.float32)

    return BokehImage(
        cdf_row=jnp.asarray(cdf_row),
        row_indices=jnp.asarray(row_indices),
        cdf_col=jnp.asarray(cdf_col),
        col_indices=jnp.asarray(col_indices),
        width=int(w),
        height=int(h),
    )


def load(path: str) -> BokehImage:
    """Load a bokeh image file (``imageData::read``, zoic.cpp:168-219).

    The reference delegates decoding to Arnold's texture API; here ``.npy``
    arrays are always supported and common image formats when Pillow is
    available."""
    if path.endswith(".npy"):
        return build(np.load(path))
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"Cannot read {path!r}: install Pillow or provide a .npy array"
        ) from e
    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    return build(img)


def _upper_bound_flat(
    cdf_flat: Array, start: Array, length: int, u: Array
) -> Array:
    """Vectorized ``std::upper_bound`` over per-ray slices
    ``cdf_flat[start : start+length]``: returns the local index in
    ``[0, length]`` of the first element > u, via branchless binary search
    with flat gathers."""
    lo = jnp.zeros_like(start)
    hi = jnp.full_like(start, length)
    for _ in range(max(1, math.ceil(math.log2(length + 1)))):
        active = lo < hi
        mid = (lo + hi) // 2
        v = jnp.take(cdf_flat, start + mid)  # clipped gather; masked when done
        gt = v > u
        new_hi = jnp.where(active & gt, mid, hi)
        new_lo = jnp.where(active & ~gt, mid + 1, lo)
        lo, hi = new_lo, new_hi
    return lo


def sample(
    image: BokehImage, u_row: Array, u_col: Array
) -> Tuple[Array, Array]:
    """Batched ``bokehSample`` (zoic.cpp:420-485): map uniform (u_row, u_col)
    pairs to [-1, 1]^2 aperture offsets distributed per the image."""
    w, h = image.width, image.height

    r = _upper_bound_flat(
        image.cdf_row, jnp.zeros_like(u_row, dtype=jnp.int32), h, u_row
    )
    r = jnp.minimum(r, h - 1)  # past-the-end clamp (zoic.cpp:435)
    actual_row = jnp.take(image.row_indices, r)
    # centering quirk: uses WIDTH for the row recenter (zoic.cpp:441)
    recalc_row = actual_row - (w - 1) // 2

    start = actual_row * w
    c_local = _upper_bound_flat(image.cdf_col.reshape(-1), start, w, u_col)
    # the reference's global-index clamp (zoic.cpp:461)
    c_global = jnp.minimum(start + c_local, start + w - 1)
    actual_col = jnp.take(image.col_indices.reshape(-1), c_global)
    relative_col = actual_col - start
    # centering quirk: uses HEIGHT for the column recenter (zoic.cpp:466)
    recalc_col = relative_col - (h - 1) // 2

    flipped_row = recalc_col.astype(jnp.float32)
    flipped_col = recalc_row.astype(jnp.float32) * -1.0
    dx = flipped_row / w * 2.0
    dy = flipped_col / h * 2.0
    return dx, dy
