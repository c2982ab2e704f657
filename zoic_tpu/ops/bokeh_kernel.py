"""Fused Pallas TPU kernel for image-based bokeh CDF inversion.

The reference inverts its two-level bokeh CDF per sample with
``std::upper_bound`` (``bokehSample``, src/zoic.cpp:420-485).  The jnp
rebuild (:func:`zoic_tpu.bokeh.sample`) replaces the binary search with a
count-based inversion (``upper_bound == sum(cdf <= u)``) and one-hot matmul
row selection — gather-free, but as separate XLA HLOs every [chunk, w]
intermediate (one-hot, selected row CDF, selected column order) round-trips
HBM: ~1.5 KB of traffic per draw, which caps the sampler at ~140M draws/s
and dominates the raytraced+bokeh configs (PERF_NOTES r4).

This kernel fuses the whole inversion so the per-draw intermediates live in
VMEM/registers:

* the ROW inversion is an SMEM-broadcast compare loop over the (ascending)
  row CDF — h vector ops per tile, no selection needed;
* the COLUMN phase needs per-draw rows of the [h, w] tables (each draw
  landed on its own row r): rows are selected on the MXU with one one-hot
  matmul per 128-draw lane row — ``P[:, :] @ onehot(r)`` where ``P`` packs
  the transposed column CDF, the transposed column order, and the row
  permutation into a single (2*w_pad + 8, 128) f32 table, so one dot
  yields everything the draw needs;
* the column count, the order-table pick, and the [-1, 1] remap are plain
  VPU ops on the selected rows.

Exactness: the one-hot matmul must reproduce the selected f32 values
bit-exactly for the CDF compares to match ``std::upper_bound`` (the jnp
path's HIGHEST-precision requirement).  The kernel requests float32
accumulation (``preferred_element_type``) and full precision; bit-equality
against the jnp path is gated by tests/test_bokeh_kernel.py on dense
uniform grids plus exact-boundary inputs.

Size gate: tables are held whole in VMEM and the one-hot contraction is
h-deep, so the kernel is built for aperture-texture-sized images
(h, w <= 128 — the reference's own test bokeh images are 64 px).  Larger
images fall back to the jnp path (bokeh.sample dispatches).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..system import BokehImage

Array = jnp.ndarray

LANES = 128
DEF_TILE_ROWS = 64  # draws per grid step = tile_rows * LANES
MAX_DIM = 128       # h, w <= MAX_DIM (VMEM/one-hot size gate)


def supports(image: BokehImage) -> bool:
    """Whether the fused kernel covers this image (size gate)."""
    return image.height <= MAX_DIM and image.width <= MAX_DIM


def _pack_tables(image: BokehImage) -> Tuple[Array, Array]:
    """Build the kernel's packed selection table.

    Returns (cdf_row_padded[f32 MAX_DIM], P[f32 (2*w_pad + 8, MAX_DIM)])
    where P's lane axis is the SORTED row index i (the one-hot contraction
    axis) and its sublane rows are:

      [0,        w_pad)   column CDF of sorted row i; pad ROWS (j >= w) at
                          valid lanes are +2 so they never count as <= u
                          (u <= 1); pad LANES (i >= h) are 0 everywhere —
                          never selected, and they must stay FINITE so the
                          one-hot matmul's 0-weight products cannot produce
                          0 * inf = NaN
      [w_pad,  2*w_pad)   precomputed dx per sorted column (BokehImage.
                          dx_col; final value, no in-kernel remap — see
                          system.BokehImage for the division-rounding why)
      2*w_pad             precomputed dy per sorted row (dy_srow)
      remaining           zero padding to a sublane multiple of 8
    """
    h, w = image.height, image.width
    w_pad = -(-w // 8) * 8
    # pre-permute per-row tables into sorted-row order (as bokeh.sample)
    cdf_byr = jnp.take(image.cdf_col, image.row_indices, axis=0)  # [h, w]
    dx_byr = jnp.take(image.dx_col, image.row_indices, axis=0)    # [h, w]

    pr = 2 * w_pad + 8
    p = jnp.zeros((pr, MAX_DIM), jnp.float32)
    if w_pad > w:
        p = p.at[w:w_pad, :h].set(2.0)  # > any u in [0, 1]; finite (no NaN)
    p = p.at[:w, :h].set(cdf_byr.T)
    p = p.at[w_pad:w_pad + w, :h].set(dx_byr.T)
    p = p.at[2 * w_pad, :h].set(image.dy_srow)

    cdf_row = jnp.full((MAX_DIM,), jnp.inf, jnp.float32)
    cdf_row = cdf_row.at[:h].set(image.cdf_row)
    return cdf_row, p


def _bokeh_kernel(
    h: int, w: int, w_pad: int, tile_rows: int,
    cdf_row_ref,  # SMEM (MAX_DIM,) f32 — ascending row CDF (+inf pad)
    u1_ref,       # VMEM (tile_rows, LANES) f32
    u2_ref,       # VMEM (tile_rows, LANES) f32
    p_ref,        # VMEM (2*w_pad + 8, MAX_DIM) f32 packed tables
    dx_ref,       # VMEM (tile_rows, LANES) f32 out
    dy_ref,       # VMEM (tile_rows, LANES) f32 out
):
    f32 = jnp.float32
    u1 = u1_ref[...]
    u2 = u2_ref[...]

    # row inversion: r = upper_bound(cdf_row, u1) = sum(cdf_row <= u1),
    # clamped past-the-end (zoic.cpp:435); SMEM-broadcast compares
    r = jnp.zeros(u1.shape, jnp.int32)
    for i in range(h):
        r = r + (cdf_row_ref[i] <= u1).astype(jnp.int32)
    r = jnp.minimum(r, h - 1)

    p = p_ref[...]
    sub = jax.lax.broadcasted_iota(jnp.int32, (MAX_DIM, LANES), 0)
    wsub = jax.lax.broadcasted_iota(jnp.int32, (w_pad, LANES), 0)
    for dr in range(tile_rows):
        rv = r[dr:dr + 1, :]                                 # (1, LANES)
        u2r = u2[dr:dr + 1, :]                               # (1, LANES)
        # one-hot over the sorted-row axis; P @ M selects, per draw lane,
        # row r's column CDF, its column order, and the row permutation in
        # a single MXU pass
        m = (sub == rv).astype(f32)                          # (MAX_DIM, LANES)
        sel = jnp.dot(
            p, m,
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                    # (PR, LANES)
        cdfsel = sel[0:w_pad]
        dxsel = sel[w_pad:2 * w_pad]
        # P's rows past 2*w_pad are all-zero, so summing the 8-row tail
        # extracts row 2*w_pad (the precomputed dy) exactly
        dy = jnp.sum(
            sel[2 * w_pad:2 * w_pad + 8], axis=0, keepdims=True
        )                                                    # (1, LANES)
        # column inversion within the selected row (pad rows compare false)
        cc = jnp.sum((cdfsel <= u2r).astype(jnp.int32), axis=0, keepdims=True)
        c_local = jnp.minimum(cc, w - 1)                     # (1, LANES)
        # both remaps were precomputed at build time (host true division);
        # the one-hot sums select single values exactly
        dx = jnp.sum(
            dxsel * (wsub == c_local).astype(f32), axis=0, keepdims=True
        )
        dx_ref[pl.ds(dr, 1), :] = dx
        dy_ref[pl.ds(dr, 1), :] = dy


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_rows", "interpret"),
)
def _sample_fused(
    cdf_row: Array,
    p: Array,
    u_row: Array,
    u_col: Array,
    *,
    width: int,
    height: int,
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    w_pad = -(-width // 8) * 8
    b = u_row.shape[0]
    n_pad = -b % LANES
    rows = (b + n_pad) // LANES
    while tile_rows >= 8 and rows <= tile_rows // 2:
        tile_rows //= 2
    row_pad = -rows % tile_rows
    total_rows = rows + row_pad

    def prep(a):
        a = jnp.pad(a, (0, n_pad))
        return jnp.pad(a.reshape(rows, LANES), ((0, row_pad), (0, 0)))

    grid = (total_rows // tile_rows,)
    blk = pl.BlockSpec(
        (tile_rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    tbl = pl.BlockSpec(
        p.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _bokeh_kernel, height, width, w_pad, tile_rows
    )
    dx, dy = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[blk, blk, tbl],
            out_specs=[blk, blk],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32)
            for _ in range(2)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(cdf_row, prep(u_row), prep(u_col), p)
    return dx.reshape(-1)[:b], dy.reshape(-1)[:b]


def sample_fused(
    image: BokehImage,
    u_row: Array,
    u_col: Array,
    *,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused-kernel ``bokehSample`` (zoic.cpp:420-485): bit-identical to
    :func:`zoic_tpu.bokeh.sample` for images within the size gate
    (``supports``)."""
    assert supports(image), (
        f"bokeh kernel supports h, w <= {MAX_DIM}; got "
        f"{image.height}x{image.width} (use bokeh.sample)"
    )
    cdf_row, p = _pack_tables(image)
    return _sample_fused(
        cdf_row, p, u_row, u_col,
        width=image.width, height=image.height, interpret=interpret,
    )
