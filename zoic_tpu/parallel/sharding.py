"""Data-parallel ray sharding over a TPU mesh.

The reference's only parallelism is Arnold's render-thread pool calling
``camera_create_ray`` concurrently against shared read-only state
(SURVEY.md §2 "Parallelism strategies") — embarrassingly parallel per
sample.  The TPU-native equivalent is pure data parallelism over the ray
batch on a 1-D device mesh riding ICI: the compiled lens state is replicated
(a few KB), the sample arrays are sharded on the batch axis, and the only
cross-device values are the run counters, reduced with ``psum``
(the deterministic replacement for the reference's racy shared ints,
zoic.cpp:533-534, 1826-1829).

No tensor/pipeline/sequence parallelism applies: rays never communicate, and
the per-ray state (6 floats) has nothing to shard.  See SURVEY.md §5.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import create_rays as _create_rays
from ..config import CameraConfig
from ..system import CameraState, RayBatch, RayStats

Array = jnp.ndarray

AXIS = "rays"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices; ICI-contiguous order."""
    if devices is None:
        devices = jax.devices()
    return jax.make_mesh((len(devices),), (AXIS,), devices=devices)


def create_rays_sharded(
    mesh: Mesh,
    state: CameraState,
    config: CameraConfig,
    sx: Array,
    sy: Array,
    lensx: Array,
    lensy: Array,
    key: Optional[Array] = None,
) -> Tuple[RayBatch, RayStats]:
    """Generate rays with the batch sharded across the mesh.

    The batch size must divide by the mesh size.  Outputs are sharded the
    same way; stats are psum-reduced to replicated scalars.
    """
    n = mesh.devices.size
    b = sx.shape[0]
    if b % n:
        raise ValueError(f"batch size {b} not divisible by mesh size {n}")
    if key is None:
        key = jax.random.PRNGKey(0)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(
            jax.tree_util.tree_map(lambda _: P(AXIS), _raybatch_struct()),
            jax.tree_util.tree_map(lambda _: P(), _raystats_struct()),
        ),
        # pallas_call outputs carry no varying-mesh-axes annotation; rays
        # never communicate (pure DP), so the vma check adds nothing here
        check_vma=False,
    )
    def _shard_fn(state_, sx_, sy_, lx_, ly_, key_):
        # decorrelate retry streams across shards
        key_ = jax.random.fold_in(key_, jax.lax.axis_index(AXIS))
        rays, stats = _create_rays(state_, config, sx_, sy_, lx_, ly_, key_)
        stats = RayStats(
            jax.lax.psum(stats.success, AXIS),
            jax.lax.psum(stats.vignetted, AXIS),
            jax.lax.psum(stats.tir, AXIS),
            jax.lax.psum(stats.tries_total, AXIS),
        )
        return rays, stats

    return _shard_fn(state, sx, sy, lensx, lensy, key)


def _raybatch_struct() -> RayBatch:
    z = 0
    return RayBatch(z, z, z, z, z)


def _raystats_struct() -> RayStats:
    z = 0
    return RayStats(z, z, z, z)


def shard_samples(mesh: Mesh, *arrays: Array) -> Tuple[Array, ...]:
    """Device_put sample arrays with batch-axis sharding (lays data out
    before the jitted call so XLA skips the gather)."""
    sh = NamedSharding(mesh, P(AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)
