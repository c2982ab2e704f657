"""Shared machinery for the two camera models.

The reference's per-ray ``while (!ok && tries <= maxtries)`` resample loops
(src/zoic.cpp:1802-1830 thin-lens, 1879-1957 raytraced) become whole-batch
masked rounds inside one ``lax.while_loop``: round r gives every
still-pending ray its r-th retry with fresh counted-PRNG draws, so each
ray's accepted sample has exactly the sequential loop's distribution.

Semantics preserved exactly, including the reference's boundary quirk: the
loop exits with ``tries == maxtries+1`` whether or not the final retry
succeeded, and the ``tries > maxtries`` check then zero-weights the ray —
so a ray whose 26th retry succeeds is still vignetted (zoic.cpp:1824-1827,
1951-1954).  Rays stop consuming retries the round after they succeed, which
matches per-ray sequential behavior because rounds are exchangeable.

RNG: the reference draws retry samples from one process-global, non-thread-
safe xorshift128 stream (zoic.cpp:647-652) — irreproducible under Arnold's
thread scheduling.  We use counted ``jax.random`` keys folded per round:
deterministic for a given key, statistically equivalent.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import bokeh as bokeh_mod
from .. import sampling

Array = jnp.ndarray


def aperture_sample(
    use_image: bool,
    bokeh_image,
    u1: Array,
    u2: Array,
) -> Tuple[Array, Array]:
    """Sampler dispatch (zoic.cpp:1787, 1870): concentric disk map or
    image-based bokeh CDF inversion.  ``use_image`` is static."""
    if use_image:
        assert bokeh_image is not None, "use_image=True requires bokeh state"
        return bokeh_mod.sample(bokeh_image, u1, u2)
    return sampling.concentric_disk_sample(u1, u2)


class LoopState(NamedTuple):
    round: Array        # i32[] current retry round (1-based)
    tries: Array        # i32[B] retries consumed per ray
    ok: Array           # bool[B]
    payload: tuple      # model-specific per-ray arrays (origin, dir, ...)
    tir_total: Array    # i32[]
    key: Array


def resample_rounds(
    initial_ok: Array,
    initial_payload: tuple,
    retry_fn: Callable[[Array, Array], Tuple[Array, tuple, Array]],
    key: Array,
    max_tries: int,
    initial_tir: Array,
) -> Tuple[Array, tuple, Array, Array]:
    """Run masked retry rounds until every ray succeeded or the budget is
    exhausted.

    ``retry_fn(round_key, pending) -> (ok, payload, tir_count)`` recomputes a
    full-batch attempt from fresh uniforms; results are merged only for
    pending rays.  Returns ``(ok, payload, tries, tir_total)``.
    """
    b = initial_ok.shape

    def cond(s: LoopState) -> Array:
        return (s.round <= max_tries + 1) & jnp.any(~s.ok)

    def body(s: LoopState) -> LoopState:
        round_key = jax.random.fold_in(s.key, s.round)
        pending = ~s.ok
        new_ok, new_payload, tir = retry_fn(round_key, pending)
        ok = jnp.where(pending, new_ok, s.ok)
        payload = tuple(
            jnp.where(pending, new_p, old_p)
            for new_p, old_p in zip(new_payload, s.payload)
        )
        tries = jnp.where(pending, s.round, s.tries)
        return LoopState(s.round + 1, tries, ok, payload, s.tir_total + tir, s.key)

    # derive the zero init from initial_ok so it stays batch-varying under
    # shard_map's vma tracking
    tries0 = initial_ok.astype(jnp.int32) * 0
    init = LoopState(
        jnp.int32(1),
        tries0,
        initial_ok,
        initial_payload,
        initial_tir,
        key,
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.ok, out.payload, out.tries, out.tir_total


def weight_and_stats(
    tries: Array, max_tries: int, count_stats: bool = True
) -> Tuple[Array, Array, Array]:
    """The ``tries > maxtries`` epilogue (zoic.cpp:1824-1830, 1951-1957):
    returns (weight, success_count, vignetted_count)."""
    vignetted = tries > max_tries
    weight = jnp.where(vignetted, 0.0, 1.0).astype(jnp.float32)
    n_vig = jnp.sum(vignetted, dtype=jnp.int32)
    n_ok = jnp.sum(~vignetted, dtype=jnp.int32)
    return weight, n_ok, n_vig


def apply_exposure(weight: Array, exposure_control: Array) -> Array:
    """Exposure epilogue (zoic.cpp:1980-1987): x(1+e^2) for e>0,
    x1/(1+e^2) for e<0."""
    e2 = exposure_control * exposure_control
    up = weight * (1.0 + e2)
    down = weight * (1.0 / (1.0 + e2))
    return jnp.where(
        exposure_control > 0.0, up, jnp.where(exposure_control < 0.0, down, weight)
    )


def fake_derivatives(
    tries: Array, origin: Array, direction: Array
) -> Tuple[Array, Array]:
    """The reference's admittedly-incorrect derivative fix-up for retried
    rays (zoic.cpp:1974-1977): dOdy = origin, dDdy = dir when tries > 0,
    else zero (Arnold's own derivative estimate is absent here)."""
    retried = (tries > 0)[..., None]
    zeros = jnp.zeros_like(origin)
    return jnp.where(retried, origin, zeros), jnp.where(retried, direction, zeros)
