"""Compiled lens state pytrees.

The reference keeps per-node mutable state in ``cameraData``/``Lensdata``
(src/zoic.cpp:627-643, 528-541): an array-of-structs element vector plus
solved scalars and the exit-pupil LUT ``std::map``.  The TPU-native
equivalent is an immutable struct-of-arrays pytree that lives in HBM and is
closed over by the jitted ray generators.  It is a serializable pytree — the
"compiled lens" cache keyed by ``CameraConfig.lens_key()`` replaces the
reference's ``lensChanged`` memoization (zoic.cpp:595-606, 1615).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PupilLUT:
    """Exit-pupil lookup table (reference ``exitPupilLUT`` + ``apertureMap``,
    zoic.cpp:1391-1452, 540).

    The reference stores ``std::map<film_x, boundingBox2d>`` over
    ``n`` uniformly spaced film-x keys (spacing ``film_width / n``,
    zoic.cpp:1393-1399) and interpolates ``getMaxScale()``/``getCentroid().x``
    between the two keys bracketing a film radius.  Since the keys are
    uniform, ``std::map::lower_bound`` reduces to an index computation — we
    store the derived per-key scalars directly.
    """

    keys: Array        # f32[n]  film-x sample positions (i * spacing)
    max_scale: Array   # f32[n]  boundingBox2d::getMaxScale()
    centroid_x: Array  # f32[n]  boundingBox2d::getCentroid().x
    # full bboxes kept for diagnostics/pupil plots
    bbox_min_x: Array
    bbox_min_y: Array
    bbox_max_x: Array
    bbox_max_y: Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PupilProfile:
    """Pupil-support outer bound per film radius (no reference
    equivalent — a TPU-native retry accelerator, see
    :func:`zoic_tpu.pupil.build_precheck`).

    Two bound forms share this container, selected by ``kind``:

    * ``kind == "harmonic"`` (:func:`zoic_tpu.pupil.build_profile`): a
      polar bound ``rho_max(phi) ~ c0 + c1 cos(phi) + c2 cos(2 phi)
      + c4 cos(4 phi)`` per key (even symmetry: the optical system is
      rotationally symmetric; shaping rotates after.  The harmonic set
      {0,1,2,4} is measured: cos3 adds nothing on the lens library while
      cos4 cuts E[traced attempts] 1.52 -> 1.32 on the double-gauss).
    * ``kind == "circles"`` (:func:`zoic_tpu.pupil.build_circles`): the
      support is covered by the INTERSECTION of two x-axis-centered
      circles — the exact shape of a cat-eye pupil (each limiting
      aperture projects to a circle decentered along the film axis).  The
      four chains then hold ``(a1, q1, a2, q2)`` in the (c0, c1, c2, c4)
      slots, where circle j accepts offsets with
      ``lx^2 + ly^2 - 2 a_j lx <= q_j`` (``q_j = r_j^2 - a_j^2``) — 2 fma
      + 2 compares per candidate, no rsqrt/trig, and measured ~4x less
      cover slack than the harmonic fit on the double-gauss
      (E[traced/accept] 1.29 -> ~1.08, PERF_NOTES r5).

    In both forms, a candidate outside the bound provably fails the trace
    (up to the same Monte-Carlo cover-tail risk as the reference's own
    x1.05 LUT margin, zoic.cpp:1463), so failed tries can be consumed
    without tracing.
    """

    keys: Array  # f32[n] film-radius keys (same layout as PupilLUT.keys)
    c0: Array    # f32[n]  harmonic c0           | circles a1
    c1: Array    # f32[n]  cos(phi) coefficient  | circles q1
    c2: Array    # f32[n]  cos(2 phi) coefficient| circles a2
    c4: Array    # f32[n]  cos(4 phi) coefficient| circles q2
    # Polynomial form of the same bound (r4, pupil.fit_profile_poly):
    # [4, D+1] Horner coefficients in t = dist/poly_scale, rows = (c0, c1,
    # c2, c4), uplifted so poly >= the per-key lerped bound everywhere on
    # the fitted domain — the fused kernel evaluates this in 4*(D+1) fmas
    # instead of the 32-key select chain when the fit is tight
    # (LensSystem.profile_poly).
    poly: Array = None  # f32[4, D+1]
    # Fit-domain radius normalizer: the poly is fitted on
    # t = dist / poly_scale in [0, 1] where poly_scale = min(film-corner
    # radius, keys[-1]).  Film radii BEYOND poly_scale (only reachable via
    # |sx| > 1 overscan callers) are outside the fitted/validated domain —
    # the kernel disables the pre-check for such rays instead of
    # evaluating the unfitted extrapolation (ADVICE r4 #2).
    poly_scale: Array = None  # f32[]
    # Bound form ("harmonic" | "circles", see class docstring).  Static:
    # the fused kernel compiles different candidate math per kind.
    kind: str = dataclasses.field(metadata=dict(static=True), default="harmonic")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LensSystem:
    """SoA compiled lens stack + solved scalars (reference ``Lensdata``,
    zoic.cpp:528-541, after the ``node_update`` pipeline zoic.cpp:1615-1698).

    Element arrays are rear-first, centimeters, already rescaled by the
    focal-length ratio.  ``aperture`` holds clear-aperture *diameters*
    (the trace culls at ``aperture/2``, zoic.cpp:1114).
    """

    curvature: Array            # f32[E] signed radius of curvature
    thickness: Array            # f32[E] axial gap (element 0 shifted negative)
    ior: Array                  # f32[E]
    abbe: Array                 # f32[E]
    aperture: Array             # f32[E] clear-aperture diameter
    center: Array               # f32[E] sphere-center z (computeLensCenters)
    user_aperture_radius: Array  # f32[] iris radius from fStop (zoic.cpp:1664)
    origin_shift: Array         # f32[] film-plane z (calculateImageDistance)
    aperture_distance: Array    # f32[] film->iris distance (zoic.cpp:1678-1685)
    focal_length_ratio: Array   # f32[] user focal / traced focal (zoic.cpp:1654)
    traced_focal_length: Array  # f32[] post-scale traced focal length
    film_diagonal: Array        # f32[] sqrt(sw^2 + sh^2) (zoic.cpp:1633)
    focal_distance: Array       # f32[]
    lut: Optional[PupilLUT]
    profile: Optional["PupilProfile"] = None
    # static (non-leaf) metadata
    aperture_element: int = dataclasses.field(metadata=dict(static=True), default=-1)
    # Film-area fraction whose per-draw acceptance is so low the retry
    # budget will exhaust ("vignetted by design", e.g. 57% for the fisheye —
    # zoic.cpp:1458-1544's self-test shows those pupils).  Measured at
    # profile-build time (pupil.dead_film_fraction), QUANTIZED to one decimal
    # so same-shape lenses share jit cache entries.  Drives the compaction
    # schedule regime (trace_kernel._compaction_schedule): dead-heavy lenses
    # keep whole-tile rounds until the budget drains, because folding can't
    # shrink a working set that never resolves.
    dead_frac: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    # The iris row's packed eta is exactly 1.0 for every shipped
    # prescription (air on both sides), which makes its refract chain the
    # bit-exact identity for forward rays (k = c1 - |c1| = 0; c1 ~ |dz| +
    # O(1/R) > 0 at the flattened R~1e5 stop).  Verified at compile time
    # (camera.compile_camera) and used to skip ~20 ops/attempt in the
    # fused kernel (trace_kernel._trace_block).
    iris_identity: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # Per-element TOPOLOGICAL flags, stable under focus/rescale (signs of
    # curvature and the ior ordering don't change when the stack is
    # scaled): bit0 = TIR possible (ior decreasing, the reference's
    # ``ior > ior_next`` gate, zoic.cpp:1135), bit1 = negative curvature
    # (intersection picks tca - thc).  Set by camera.compile_camera from
    # the concrete solve; () disables the static specialization (the
    # kernel falls back to the packed SMEM sign_r/tir_thr columns).
    elem_flags: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # Candidate domain the pupil profile's bound was fitted/validated on
    # (pupil.build_profile ``domain``): "disk" covers concentric-map
    # candidates only; "square" covers all of [-1,1]^2 and is REQUIRED
    # for the image-bokeh pre-check (bokehSample emits square offsets —
    # a disk-fitted bound is unsound at the corners).
    profile_domain: str = dataclasses.field(
        metadata=dict(static=True), default="disk"
    )
    # Whether the fused kernel evaluates the pre-check bound from
    # PupilProfile.poly (tight polynomial fit, smooth profiles) instead
    # of the 32-key select chain — set at compile time from the measured
    # fit deficit (camera.compile_camera; dead-region cliffs like the
    # fisheye's keep the exact chain).
    profile_poly: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )

    @property
    def count(self) -> int:
        return int(self.curvature.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BokehImage:
    """Prepared image-based bokeh sampler state (reference ``imageData``,
    zoic.cpp:115-486).  See :mod:`zoic_tpu.bokeh` for construction."""

    cdf_row: Array        # f32[h]    row CDF over sorted row sums
    row_indices: Array    # i32[h]    descending-sum row order
    cdf_col: Array        # f32[h, w] per-row CDF over sorted columns
    col_indices: Array    # i32[h, w] per-row descending column order (global idx)
    # precomputed [-1, 1] remaps of the discrete picks (bokehSample's
    # centering + scaling, zoic.cpp:441-485), built with HOST true f32
    # division: XLA rewrites division-by-constant to multiply-by-reciprocal
    # under jit (1 ulp off), so selecting final values keeps the fused
    # sampler (ops/bokeh_kernel.py) bit-equal to the C++ inversion
    dx_col: Array         # f32[h, w] final dx per (row, sorted col)
    dy_srow: Array        # f32[h]    final dy per SORTED row index
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraState:
    """Everything ``create_rays`` needs, device-resident
    (reference ``cameraData``, zoic.cpp:627-643)."""

    fov: Array                  # f32[] thin-lens fov (zoic.cpp:1606)
    tan_fov: Array              # f32[] tan(fov/2)
    aperture_radius: Array      # f32[] thin-lens aperture radius f/(2 fStop)
    sensor_width: Array         # f32[]
    sensor_height: Array        # f32[]
    focal_distance: Array       # f32[]
    ov_distance: Array          # f32[] opticalVignettingDistance
    ov_radius: Array            # f32[] opticalVignettingRadius
    exposure_control: Array     # f32[]
    lens: Optional[LensSystem]
    bokeh: Optional[BokehImage]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayBatch:
    """Batched camera-ray output (the reference's per-ray ``output`` struct
    fields origin/dir/weight/dOdy/dDdy, zoic.cpp:1752-1990)."""

    origin: Array   # f32[B, 3]
    dir: Array      # f32[B, 3]
    weight: Array   # f32[B]
    d_ody: Array    # f32[B, 3] fake derivative (zoic.cpp:1974-1977)
    d_ddy: Array    # f32[B, 3]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayStats:
    """Run counters (reference ``Lensdata`` counters + node_finish report,
    zoic.cpp:533-534, 1729-1732), returned as reduced arrays instead of
    racy shared ints."""

    success: Array     # i32[] rays that passed within the retry budget
    vignetted: Array   # i32[] rays zero-weighted after exhausting retries
    tir: Array         # i32[] total-internal-reflection events
    # retry telemetry (no reference counter): total retry draws consumed
    # beyond the first attempt — attempts/ray = 1 + tries_total / batch.
    # The straggler-waste signal the retry machines optimize (bench.py).
    tries_total: Array  # i32[]

    def vignetted_percent(self) -> Array:
        denom = self.success.astype(jnp.float32) + self.vignetted.astype(jnp.float32)
        return jnp.where(denom > 0, self.vignetted / denom * 100.0, 0.0)
