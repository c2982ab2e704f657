"""Bokeh importance-sampler distribution properties
(reference machinery: src/zoic.cpp:222-485)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zoic_tpu.bokeh as bokeh


def _sample_counts(img, n, seed=0):
    image = bokeh.build(img)
    u = jax.random.uniform(jax.random.PRNGKey(seed), (2, n), dtype=jnp.float32)
    dx, dy = bokeh.sample(image, u[0], u[1])
    return np.asarray(dx), np.asarray(dy), image


def test_sampling_frequency_proportional_to_luminance():
    """Pixel visit frequencies must match the luminance PDF (chi-square
    sanity at 3-sigma)."""
    rng = np.random.default_rng(0)
    h = w = 8
    img = rng.uniform(0.05, 1.0, (h, w, 3)).astype(np.float32)
    n = 400_000
    dx, dy, image = _sample_counts(img, n)

    # invert the output mapping back to pixel indices
    # dx = (col - (h-1)//2)/w*2 ; dy = -(row - (w-1)//2)/h*2  (note the
    # reference's width/height swaps, zoic.cpp:441-484)
    col = np.round(dx * w / 2 + (h - 1) // 2).astype(int)
    row = np.round(-dy * h / 2 + (w - 1) // 2).astype(int)
    counts = np.zeros((h, w))
    np.add.at(counts, (row, col), 1)

    lum = bokeh.luminance(img)
    pdf = lum / lum.sum()
    expected = pdf * n
    # 3-sigma per-bin Poisson bound
    sigma = np.sqrt(expected)
    assert np.all(np.abs(counts - expected) < 4.0 * sigma + 5)


def test_zero_regions_never_sampled():
    h = w = 16
    img = np.zeros((h, w, 3), np.float32)
    img[4:12, 4:12] = 1.0
    n = 100_000
    dx, dy, _ = _sample_counts(img, n, seed=1)
    col = np.round(np.asarray(dx) * w / 2 + (w - 1) // 2).astype(int)
    row = np.round(-np.asarray(dy) * h / 2 + (h - 1) // 2).astype(int)
    assert col.min() >= 4 and col.max() < 12
    assert row.min() >= 4 and row.max() < 12


def test_grayscale_and_two_channel_fallbacks():
    """Channel-offset fallbacks (zoic.cpp:238-239)."""
    rng = np.random.default_rng(2)
    mono = rng.uniform(0.1, 1.0, (8, 8)).astype(np.float32)
    lum1 = bokeh.luminance(mono)
    np.testing.assert_allclose(lum1, mono * np.float32(0.3 + 0.59 + 0.11), rtol=1e-6)
    two = rng.uniform(0.1, 1.0, (8, 8, 2)).astype(np.float32)
    lum2 = bokeh.luminance(two)
    want = two[:, :, 0] * np.float32(0.3) + two[:, :, 1] * np.float32(0.59 + 0.11)
    np.testing.assert_allclose(lum2, want, rtol=1e-5)


def test_output_range():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    dx, dy, _ = _sample_counts(img, 50_000, seed=4)
    assert np.abs(dx).max() <= 1.0 and np.abs(dy).max() <= 1.0


def test_zero_luminance_rejected():
    with pytest.raises(ValueError):
        bokeh.build(np.zeros((8, 8, 3), np.float32))


def test_build_trace_dump(tmp_path):
    """The _DEBUGIMAGESAMPLING equivalent (zoic.cpp:47-51, 248-409): the
    trace must carry every build intermediate, keyed the way the
    reference keys its dumps (row CDF by the sorted row's original index,
    column CDF by the global pixel index), and the dumped values must be
    the ones the sampler actually uses."""
    import io
    import re

    rng = np.random.default_rng(11)
    h, w = 6, 5
    img = rng.uniform(0.05, 1.0, (h, w, 3)).astype(np.float32)
    buf = io.StringIO()
    image = bokeh.build(img, trace=buf)
    text = buf.getvalue()

    def section(label):
        pat = re.compile(rf"^{re.escape(label)} \[(\d+)\]: (\S+)$", re.M)
        return [(int(k), float(v)) for k, v in pat.findall(text)]

    assert len(section("Pixel Luminance")) == h * w
    assert len(section("Normalized Pixel Value")) == h * w
    assert len(section("Summed Values row")) == h
    rows = section("CDF row")
    assert [k for k, _ in rows] == list(np.asarray(image.row_indices))
    np.testing.assert_allclose(
        [v for _, v in rows], np.asarray(image.cdf_row), rtol=1e-6
    )
    cols = section("CDF column")
    assert [k for k, _ in cols] == list(np.asarray(image.col_indices).ravel())
    np.testing.assert_allclose(
        [v for _, v in cols], np.asarray(image.cdf_col).ravel(), rtol=1e-6
    )

    # config-level plumbing: DebugOptions.image_sampling_trace
    import zoic_tpu as zt

    npy = tmp_path / "bokeh.npy"
    np.save(npy, img)
    cfg = zt.CameraConfig(
        lens_model=zt.LensModel.THINLENS,
        focal_length=5.0, fstop=1.4, focal_distance=100.0, use_dof=True,
        use_image=True, bokeh_path=str(npy),
        debug=zt.DebugOptions(
            image_sampling_trace=str(tmp_path / "trace.txt")
        ),
    )
    zt.compile_camera(cfg)
    assert (tmp_path / "trace.txt").read_text() == text
