"""Bit-parity of the fused Pallas bokeh sampler vs the jnp CDF inversion.

The jnp path (bokeh.sample) is itself gated bit-exact against the C++
oracle's std::upper_bound inversion (test_oracle_parity.py), so equality
here extends the chain to the kernel (zoic.cpp:420-485).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import zoic_tpu.bokeh as bokeh
from zoic_tpu.ops import bokeh_kernel


def _disk(n=64, r=0.8):
    yy, xx = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    img = ((xx**2 + yy**2) < r).astype(np.float32)
    return np.stack([img, img, img], -1)


def _assert_bit_equal(image, u1, u2):
    dx_j, dy_j = bokeh.sample(image, u1, u2)
    dx_k, dy_k = bokeh_kernel.sample_fused(image, u1, u2, interpret=True)
    np.testing.assert_array_equal(np.asarray(dx_j), np.asarray(dx_k))
    np.testing.assert_array_equal(np.asarray(dy_j), np.asarray(dy_k))


def test_disk_image_random_uniforms():
    image = bokeh.build(_disk())
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (2, 4096), dtype=jnp.float32)
    _assert_bit_equal(image, u[0], u[1])


def test_random_image_nonsquare():
    # h != w exercises the reference's width/height centering mix
    # (zoic.cpp:441, 466) through both paths
    rng = np.random.default_rng(3)
    img = rng.random((48, 80, 3), dtype=np.float32)
    image = bokeh.build(img)
    key = jax.random.PRNGKey(11)
    u = jax.random.uniform(key, (2, 2048), dtype=jnp.float32)
    _assert_bit_equal(image, u[0], u[1])


def test_zero_rows_and_width_not_multiple_of_8():
    # zero-luminance rows leave flat CDF segments (upper_bound tie
    # regions); w=36 exercises the pad-row compare guard
    rng = np.random.default_rng(5)
    img = rng.random((40, 36, 3), dtype=np.float32)
    img[::3, :, :] = 0.0
    image = bokeh.build(img)
    key = jax.random.PRNGKey(13)
    u = jax.random.uniform(key, (2, 2048), dtype=jnp.float32)
    _assert_bit_equal(image, u[0], u[1])


def test_exact_cdf_boundary_uniforms():
    # u equal to CDF entries: upper_bound's strict > must flip identically
    # on both paths (the bit-exactness the one-hot matmul must preserve)
    image = bokeh.build(_disk(32))
    cdf_row = np.asarray(image.cdf_row)
    cdf_col = np.asarray(image.cdf_col)
    u1 = jnp.asarray(
        np.concatenate([cdf_row, cdf_row * 0.999999, [0.0, 1.0]])
    ).astype(jnp.float32)
    picks = cdf_col[np.asarray(image.row_indices)[:len(u1) % 32], 0]
    u2 = jnp.asarray(
        np.resize(np.concatenate([cdf_col[:, 7], picks]), len(u1))
    ).astype(jnp.float32)
    _assert_bit_equal(image, u1, u2)


def test_small_batch_and_padding():
    image = bokeh.build(_disk(16))
    key = jax.random.PRNGKey(17)
    u = jax.random.uniform(key, (2, 77), dtype=jnp.float32)
    _assert_bit_equal(image, u[0], u[1])


def test_size_gate():
    image = bokeh.build(_disk(64))
    assert bokeh_kernel.supports(image)
    big = bokeh.build(np.ones((256, 8, 3), np.float32))
    assert not bokeh_kernel.supports(big)
    with pytest.raises(AssertionError):
        bokeh_kernel.sample_fused(
            big, jnp.zeros((8,)), jnp.zeros((8,)), interpret=True
        )
