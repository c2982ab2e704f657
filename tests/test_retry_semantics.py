"""Retry-loop semantics: the batched masked rounds must reproduce the
reference's sequential per-ray loop exactly (tries accounting, the
26th-retry zero-weight quirk, acceptance distribution).

Reference loop (zoic.cpp:1804, 1824-1830):

    tries = 0
    while (!ok && tries <= maxtries) { resample; ++tries; }
    if (tries > maxtries) weight = 0;

so a ray that succeeds on retry #26 still gets weight 0: the loop runs
the initial attempt plus retries tries=1..25, and
P(weight=0) = P(initial and retries 1..25 all fail) = (1-p)^26.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zoic_tpu.models import common


def _run_batched(p_accept, n, max_tries, seed):
    """Drive resample_rounds with a synthetic Bernoulli acceptance test."""
    key = jax.random.PRNGKey(seed)
    k0, kr = jax.random.split(key)
    u0 = jax.random.uniform(k0, (n,))
    ok0 = u0 < p_accept
    payload0 = (u0,)

    def retry(round_key, pending):
        u = jax.random.uniform(round_key, (n,))
        return u < p_accept, (u,), jnp.int32(0)

    ok, payload, tries, _ = common.resample_rounds(
        ok0, payload0, retry, kr, max_tries, jnp.int32(0)
    )
    weight, n_ok, n_vig = common.weight_and_stats(tries, max_tries)
    return np.asarray(ok), np.asarray(tries), np.asarray(weight)


def test_tries_distribution_matches_sequential():
    """tries histogram must match the geometric law of the sequential loop:
    P(tries = k) = p (1-p)^k for k <= maxtries, remainder at maxtries+1."""
    p = 0.35
    n = 200_000
    max_tries = 10  # keeps the vignetted tail mass statistically testable
    ok, tries, weight = _run_batched(p, n, max_tries, seed=0)

    # all rays terminate: tries in [0, max_tries+1]
    assert tries.min() >= 0 and tries.max() <= max_tries + 1
    # geometric head
    for k in [0, 1, 2, 5]:
        want = p * (1 - p) ** k
        got = float(np.mean(tries == k))
        assert got == pytest.approx(want, rel=0.05), f"k={k}"
    # zero-weight mass = (1-p)^(maxtries+1); expected count ~1750 here
    want_vig = (1 - p) ** (max_tries + 1)
    got_vig = float(np.mean(weight == 0.0))
    assert got_vig == pytest.approx(want_vig, rel=0.15)


def test_26th_retry_success_still_zero_weight():
    """Rays whose final allowed retry succeeds are vignetted anyway
    (zoic.cpp:1824-1827 evaluates tries AFTER the loop)."""
    p = 0.02  # low acceptance: plenty of budget-exhausting rays
    n = 100_000
    max_tries = 5
    ok, tries, weight = _run_batched(p, n, max_tries, seed=1)
    at_budget = tries == max_tries + 1
    assert at_budget.any()
    # among budget-exhausted rays, some DID succeed on the final retry...
    assert (ok & at_budget).any()
    # ...but every one of them is zero-weighted
    assert (weight[at_budget] == 0.0).all()
    # and every ray under budget has weight 1
    assert (weight[~at_budget] == 1.0).all()


def test_max_tries_zero():
    """max_tries=0: one retry round runs, then everything pending is
    vignetted — weight>0 iff the initial attempt succeeded."""
    p = 0.5
    n = 50_000
    ok, tries, weight = _run_batched(p, n, 0, seed=2)
    first_attempt_ok = tries == 0
    np.testing.assert_array_equal(weight > 0, first_attempt_ok)


def test_accepted_sample_distribution_unbiased():
    """Accepted payloads must be distributed as (payload | accept) — the
    resampling must not skew accepted values (here: uniforms conditioned
    below the threshold stay uniform on [0, p))."""
    p = 0.3
    n = 200_000
    ok, tries, weight = _run_batched(p, n, 25, seed=3)
    key = jax.random.PRNGKey(3)
    k0, kr = jax.random.split(key)
    u0 = np.asarray(jax.random.uniform(k0, (n,)))
    # reconstruct: payload for tries==0 rays is u0
    sel = (tries == 0)
    vals = u0[sel]
    assert vals.max() < p
    # uniform on [0, p): mean p/2, quartiles p/4, 3p/4
    assert float(vals.mean()) == pytest.approx(p / 2, rel=0.02)
    assert float(np.quantile(vals, 0.25)) == pytest.approx(p / 4, rel=0.04)
