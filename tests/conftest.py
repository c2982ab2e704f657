"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Tests never touch the TPU (the single chip is reserved for benchmarks) and
sharding tests need 8 virtual devices (``xla_force_host_platform_device_count``).

This host's site customization (a ``sitecustomize.py`` on PYTHONPATH) imports
jax at interpreter startup and programmatically sets
``jax.config.jax_platforms`` to the TPU plugin, so setting the
``JAX_PLATFORMS`` env var here is too late.  ``jax.config.update`` before the
backend initializes wins regardless — backends are created lazily, at the
first ``jax.devices()``/trace, which no sane sitecustomize does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: the interpret-mode Pallas programs (the A/B
# machinery tests) take tens of seconds to build; shapes repeat across
# sessions, so caching cuts suite wall time sharply (VERDICT r2 #4)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run slow tests (full retry budgets, all 8 lens goldens)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-budget interpret-mode A/Bs and the full per-lens golden "
        "sweep; excluded by default (VERDICT r2 #4), run with --slow or "
        "-m slow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return  # explicit marker selection wins
    skip = pytest.mark.skip(reason="slow test: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def _install_compile_camera_cache():
    """Session-scoped memo for ``compile_camera(config, lut_key=None)``.

    ``compile_camera`` is deterministic for the default keys (PRNGKey(0)/
    fold_in) and returns an immutable pytree, but costs 10-25s on the
    1-core CPU host (the 32 x n_samples LUT/profile Monte-Carlo builds)
    and the same handful of configs is built by many test files.  Caching
    by config is semantically transparent; explicit ``lut_key`` callers
    (the oracle-parity seeded builds) bypass the cache."""
    import zoic_tpu
    from zoic_tpu import camera as _camera

    import dataclasses

    raw = _camera.compile_camera
    memo = {}

    def cached(config, lut_key=None):
        if lut_key is not None:
            return raw(config, lut_key)
        # normalize the fields compile_camera does NOT read, so e.g. the
        # jnp/pallas config pair of an A/B test shares one lens build
        k = dataclasses.replace(
            config, impl="auto", max_tries=25, use_dof=True,
            debug=type(config.debug)(),
        )
        if k not in memo:
            memo[k] = raw(config)
        return memo[k]

    _camera.compile_camera = cached
    zoic_tpu.compile_camera = cached


_install_compile_camera_cache()


def pytest_sessionstart(session):
    n = jax.device_count()
    assert jax.default_backend() == "cpu", (
        f"tests must run on the CPU backend, got {jax.default_backend()!r}; "
        "a site plugin initialized a non-CPU backend before conftest ran"
    )
    assert n >= 8, f"need 8 virtual CPU devices for sharding tests, have {n}"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
