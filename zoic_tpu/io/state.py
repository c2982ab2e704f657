"""Compiled-camera state serialization and the on-disk compile cache.

The reference has no checkpointing; its only setup caching is the
``lensChanged``/``bokehChanged`` memoization that skips ``node_update``
recomputation in-process (src/zoic.cpp:595-611, 1615).  The TPU-native
equivalent treats the compiled :class:`CameraState` as a serializable
pytree: :func:`save`/:func:`load` round-trip it through one ``.npz`` file
(leaf arrays + a JSON treedef with the static fields), and
:func:`cached_compile` persists lens compiles across processes keyed by the
same parameter tuple ``lensChanged`` compares — useful because a 32x100k
exit-pupil LUT build is a real cost on every cold start.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig
from ..system import BokehImage, CameraState, LensSystem, PupilLUT, PupilProfile

FORMAT_VERSION = 7  # v7: PupilProfile.poly_scale leaf + static kind (circle form)


def _flatten(state: CameraState):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    static = {
        "format": FORMAT_VERSION,
        "has_lens": state.lens is not None,
        "has_bokeh": state.bokeh is not None,
        "has_lut": state.lens is not None and state.lens.lut is not None,
        "has_profile": state.lens is not None and state.lens.profile is not None,
        "aperture_element": (
            state.lens.aperture_element if state.lens is not None else None
        ),
        "iris_identity": (
            state.lens.iris_identity if state.lens is not None else False
        ),
        "dead_frac": (
            state.lens.dead_frac if state.lens is not None else 0.0
        ),
        "elem_flags": (
            list(state.lens.elem_flags) if state.lens is not None else []
        ),
        "profile_domain": (
            state.lens.profile_domain if state.lens is not None else "disk"
        ),
        "profile_poly": (
            state.lens.profile_poly if state.lens is not None else False
        ),
        "profile_kind": (
            state.lens.profile.kind
            if state.lens is not None and state.lens.profile is not None
            else "harmonic"
        ),
        "bokeh_wh": (
            [state.bokeh.width, state.bokeh.height]
            if state.bokeh is not None
            else None
        ),
    }
    return leaves, static


def save(path: str, state: CameraState) -> None:
    leaves, static = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    with open(path, "wb") as f:  # exact path (np.savez would append .npz)
        np.savez(f, __static__=json.dumps(static), **arrays)


def load(path: str) -> CameraState:
    with np.load(path, allow_pickle=False) as z:
        static = json.loads(str(z["__static__"]))
        if static.get("format") != FORMAT_VERSION:
            raise ValueError(f"unsupported state format: {static.get('format')}")
        leaves = [
            jnp.asarray(z[f"leaf_{i}"])
            for i in range(sum(1 for k in z.files if k.startswith("leaf_")))
        ]
    # rebuild an identically-structured skeleton, then unflatten into it
    skeleton = _skeleton(static)
    treedef = jax.tree_util.tree_structure(skeleton)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _skeleton(static: dict) -> CameraState:
    z = jnp.zeros(())
    zi = jnp.zeros((), jnp.int32)
    lut = (
        PupilLUT(z, z, z, z, z, z, z) if static["has_lut"] else None
    )
    profile = (
        PupilProfile(
            z, z, z, z, z, z, z,
            kind=static.get("profile_kind", "harmonic"),
        )
        if static.get("has_profile")
        else None
    )
    lens = (
        LensSystem(
            z, z, z, z, z, z, z, z, z, z, z, z, z, lut, profile,
            aperture_element=static["aperture_element"],
            iris_identity=static.get("iris_identity", False),
            dead_frac=static.get("dead_frac", 0.0),
            elem_flags=tuple(static.get("elem_flags", ())),
            profile_domain=static.get("profile_domain", "disk"),
            profile_poly=static.get("profile_poly", False),
        )
        if static["has_lens"]
        else None
    )
    bokeh = (
        BokehImage(
            z, zi, z, zi, z, z,
            width=static["bokeh_wh"][0], height=static["bokeh_wh"][1],
        )
        if static["has_bokeh"]
        else None
    )
    return CameraState(z, z, z, z, z, z, z, z, z, lens, bokeh)


def _cache_path(cache_dir: str, config: CameraConfig) -> str:
    key_parts = [repr(config.lens_key()), repr(config.bokeh_key())]
    # content-hash referenced files so edits invalidate the cache
    for p in (config.lens_data_path, config.bokeh_path):
        if p and os.path.exists(p):
            with open(p, "rb") as f:
                key_parts.append(hashlib.sha256(f.read()).hexdigest())
    digest = hashlib.sha256("|".join(key_parts).encode()).hexdigest()[:24]
    return os.path.join(cache_dir, f"zoic_state_{digest}.npz")


def cached_compile(
    config: CameraConfig,
    cache_dir: str,
    lut_key: Optional[jax.Array] = None,
) -> CameraState:
    """``compile_camera`` with a persistent on-disk cache (the cross-process
    extension of the reference's ``lensChanged`` memoization)."""
    from ..camera import compile_camera

    os.makedirs(cache_dir, exist_ok=True)
    path = _cache_path(cache_dir, config)
    if os.path.exists(path):
        try:
            return load(path)
        except (ValueError, KeyError, OSError):
            pass  # stale/corrupt cache entry: recompute
    state = compile_camera(config, lut_key)
    save(path, state)
    return state
