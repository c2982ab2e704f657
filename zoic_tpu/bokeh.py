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
inputs); sampling is a jittable batched count-based inversion
(``upper_bound == sum(cdf <= u)``) with one-hot matmul row selection —
gather-free, which is what makes it fast on TPU (see ``_sample_chunk``).
"""

from __future__ import annotations

from typing import Tuple

import jax
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


def build(pixels: np.ndarray, trace=None) -> BokehImage:
    """Construct sampler state from an ``[h, w, c]`` float image
    (``bokehProbability``, zoic.cpp:222-417).

    ``trace``: optional write() target (e.g. an open text file or
    ``io.StringIO``) receiving every build intermediate — the runtime
    replacement for the reference's ``_DEBUGIMAGESAMPLING`` compile flag
    (zoic.cpp:47-51, 248-409), which streams pixel luminance, normalized
    PDF, row sums, sorted row CDF (keyed by rowIndices), per-row
    normalized values, and the per-row column CDFs (keyed by the global
    columnIndices) to stdout during the build."""
    lum = luminance(np.asarray(pixels))
    h, w = lum.shape

    def emit(label, arr, keys=None):
        if trace is None:
            return
        arr = np.asarray(arr).reshape(-1)
        ks = np.asarray(keys).reshape(-1) if keys is not None else range(len(arr))
        for k, v in zip(ks, arr):
            trace.write(f"{label} [{k}]: {v:.9g}\n")
        trace.write("-" * 46 + "\n")

    total = lum.sum(dtype=np.float64)
    if total <= 0:
        raise ValueError("bokeh image has zero total luminance")
    emit("Pixel Luminance", lum)
    normalized = (lum / np.float32(total)).astype(np.float32)
    emit("Normalized Pixel Value", normalized)

    row_sums = normalized.sum(axis=1, dtype=np.float32)
    emit("Summed Values row", row_sums)
    # std::sort with a strict > comparator; ties keep first-index-first under
    # stable sort, which we choose deterministically (the reference's
    # introsort tie order is unspecified).
    row_indices = np.argsort(-row_sums, kind="stable").astype(np.int32)
    cdf_row = np.cumsum(row_sums[row_indices], dtype=np.float32)
    # reference keys the row-CDF dump by the SORTED row's original index
    # (zoic.cpp:338)
    emit("CDF row", cdf_row, keys=row_indices)

    with np.errstate(divide="ignore", invalid="ignore"):
        per_row = np.where(
            (normalized != 0) & (row_sums[:, None] != 0),
            normalized / row_sums[:, None],
            0.0,
        ).astype(np.float32)

    # columnIndices hold *global* pixel indices, sorted desc within each row
    # (zoic.cpp:376-382).
    emit("Normalized Pixel value per row", per_row)
    order = np.argsort(-per_row, axis=1, kind="stable").astype(np.int32)
    col_indices = order + (np.arange(h, dtype=np.int32) * w)[:, None]
    sorted_vals = np.take_along_axis(per_row, order, axis=1)
    cdf_col = np.cumsum(sorted_vals, axis=1, dtype=np.float32)
    # keyed by the global pixel index of each sorted column (zoic.cpp:405)
    emit("CDF column", cdf_col, keys=col_indices)

    # Precompute the final [-1, 1] remaps (zoic.cpp:441-485) with NUMPY's
    # true f32 division: under jit XLA rewrites /const into *reciprocal
    # (1 ulp off the eager/C++ result), so the fused TPU sampler selects
    # these exact values instead of dividing at sample time.  Centering
    # quirks preserved: WIDTH recenters the row pick, HEIGHT the column.
    rel_local = (col_indices - (np.arange(h, dtype=np.int32) * w)[:, None])
    dx_col = (
        (rel_local - (h - 1) // 2).astype(np.float32)
        / np.float32(w) * np.float32(2.0)
    )
    dy_srow = (
        (row_indices - (w - 1) // 2).astype(np.float32)
        * np.float32(-1.0) / np.float32(h) * np.float32(2.0)
    )

    return BokehImage(
        cdf_row=jnp.asarray(cdf_row),
        row_indices=jnp.asarray(row_indices),
        cdf_col=jnp.asarray(cdf_col),
        col_indices=jnp.asarray(col_indices),
        dx_col=jnp.asarray(dx_col),
        dy_srow=jnp.asarray(dy_srow),
        width=int(w),
        height=int(h),
    )


def load(path: str, trace=None) -> BokehImage:
    """Load a bokeh image file (``imageData::read``, zoic.cpp:168-219).

    The reference delegates decoding to Arnold's texture API; here ``.npy``
    arrays are always supported and common image formats when Pillow is
    available.  ``trace`` forwards to :func:`build` (the
    ``_DEBUGIMAGESAMPLING`` build dump)."""
    if path.endswith(".npy"):
        return build(np.load(path), trace=trace)
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"Cannot read {path!r}: install Pillow or provide a .npy array"
        ) from e
    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    return build(img, trace=trace)


def _sample_chunk(
    cdf_row: Array,        # [h]   ascending CDF over sorted rows
    dy_srow: Array,        # [h]   precomputed dy per sorted row
    cdf_byr: Array,        # [h,w] column CDFs, PRE-PERMUTED to sorted-row order
    dx_byr: Array,         # [h,w] precomputed dx per sorted col, permuted
    w: int,
    h: int,
    u_row: Array,
    u_col: Array,
) -> Tuple[Array, Array]:
    """Count-based ``upper_bound`` inversion for one chunk of samples.

    ``upper_bound(cdf, u)`` (first index with cdf > u) equals
    ``sum(cdf <= u)`` for an ascending CDF — a broadcast compare + reduce,
    which TPUs do at VPU rate, instead of a binary search whose per-step
    flat gathers run at ~140M elem/s (measured: the gather formulation cost
    273 ms per 4M samples; this one ~milliseconds).

    Per-sample rows of the column tables are materialized with one-hot
    matmuls at ``Precision.HIGHEST``: with a one-hot left operand the only
    contribution is the selected f32 value's full bf16 decomposition,
    re-summed exactly (lower passes can drop small cross-terms, so HIGHEST
    is required for guaranteed bit-exact CDF comparisons vs
    ``std::upper_bound``).
    """
    f32 = jnp.float32
    r = jnp.sum(
        (cdf_row[None, :] <= u_row[:, None]).astype(jnp.int32), axis=1
    )
    r = jnp.minimum(r, h - 1)  # past-the-end clamp (zoic.cpp:435)
    oh_r = (jnp.arange(h, dtype=jnp.int32)[None, :] == r[:, None]).astype(f32)
    hi = jax.lax.Precision.HIGHEST
    # the [-1, 1] remaps (zoic.cpp:441-485) are PREcomputed at build time
    # with host true f32 division (XLA rewrites /const to *reciprocal under
    # jit, 1 ulp off the C++ result — see system.BokehImage), so selection
    # directly yields the final values
    dy = jnp.einsum("bh,h->b", oh_r, dy_srow, precision=hi)
    rowcdf = jnp.dot(oh_r, cdf_byr, precision=hi)          # [B, w]
    dxrow = jnp.dot(oh_r, dx_byr, precision=hi)            # [B, w]

    c_local = jnp.sum(
        (rowcdf <= u_col[:, None]).astype(jnp.int32), axis=1
    )
    c_local = jnp.minimum(c_local, w - 1)  # global-index clamp (zoic.cpp:461)
    oh_c = (
        jnp.arange(w, dtype=jnp.int32)[None, :] == c_local[:, None]
    ).astype(f32)
    dx = jnp.sum(dxrow * oh_c, axis=1)
    return dx, dy


def sample(
    image: BokehImage, u_row: Array, u_col: Array
) -> Tuple[Array, Array]:
    """Batched ``bokehSample`` (zoic.cpp:420-485): map uniform (u_row, u_col)
    pairs to [-1, 1]^2 aperture offsets distributed per the image.

    Indices stay exact through the f32 matmuls for images up to 2^24
    pixels per side product (any practical bokeh texture).

    On a TPU backend, aperture-texture-sized images (h, w <= 128) dispatch
    to the fused Pallas kernel (ops/bokeh_kernel.py) — bit-identical
    output, ~10x throughput (the XLA formulation round-trips its [B, w]
    selection intermediates through HBM)."""
    w, h = image.width, image.height
    b = u_row.shape[0]

    if u_row.ndim == 1 and jax.default_backend() == "tpu":
        from .ops import bokeh_kernel

        if bokeh_kernel.supports(image):
            return bokeh_kernel.sample_fused(image, u_row, u_col)

    # pre-permute the per-row tables into sorted-row order once (tiny) so a
    # single one-hot over the SORTED row index selects everything
    cdf_byr = jnp.take(image.cdf_col, image.row_indices, axis=0)
    dx_byr = jnp.take(image.dx_col, image.row_indices, axis=0)

    # chunk so the [chunk, max(h, w)] intermediates stay bounded: each such
    # plane is 2^25 f32 = 128MB and _sample_chunk keeps a few live at once
    # (one-hot, rowcdf, dxrow), so peak is some hundreds of MB — fine for
    # a 16GB-HBM chip; bigger chunks amortize the sequential lax.map
    # dispatches
    chunk = max(1024, (1 << 25) // max(h, w))
    if b <= chunk:
        return _sample_chunk(
            image.cdf_row, image.dy_srow, cdf_byr, dx_byr,
            w, h, u_row, u_col,
        )
    n_pad = -b % chunk
    ur = jnp.pad(u_row, (0, n_pad)).reshape(-1, chunk)
    uc = jnp.pad(u_col, (0, n_pad)).reshape(-1, chunk)
    dx, dy = jax.lax.map(
        lambda uu: _sample_chunk(
            image.cdf_row, image.dy_srow, cdf_byr, dx_byr,
            w, h, uu[0], uu[1],
        ),
        jnp.stack([ur, uc], axis=1),
    )
    return dx.reshape(-1)[:b], dy.reshape(-1)[:b]
