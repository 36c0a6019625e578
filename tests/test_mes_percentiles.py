"""MES internals: the jit-compatible bisection must find the same
optimum-value percentiles as the reference's brentq root solves
(bask/acquisition.py:243-252)."""

import numpy as np
import scipy.stats as st
from scipy.optimize import brentq
import jax
import jax.numpy as jnp

from bask_tpu.acquisition import MaxValueSearch
from bask_tpu.utils.stats import norm_logcdf


def test_bisection_matches_brentq():
    rng = np.random.RandomState(0)
    mu = rng.randn(101)
    std = rng.uniform(0.1, 1.0, 101)
    mean = -mu

    def probf(x):
        return np.exp(np.sum(st.norm.logcdf((x - mean) / std)))

    left = float(np.min(mean - 3 * std))
    right = float(np.max(mean + 5 * std))

    # our in-jit bisection, extracted the same way MES does it
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    def cdf_max(x):
        return jnp.exp(jnp.sum(norm_logcdf((x - mean_j) / std_j)))

    def percentile(q):
        lo, hi = left, right
        for _ in range(72):
            mid = 0.5 * (lo + hi)
            below = float(cdf_max(mid)) < q
            lo, hi = (mid, hi) if below else (lo, mid)
        return 0.5 * (lo + hi)

    for q in (0.25, 0.5, 0.75):
        ref = brentq(lambda x: probf(x) - q, left, right)
        ours = percentile(q)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mes_deterministic_given_key():
    mu = jnp.asarray(np.linspace(-1, 1, 31))
    std = jnp.asarray(np.full(31, 0.5))
    acq = MaxValueSearch()
    a = np.asarray(acq(mu, std, key=jax.random.PRNGKey(7)))
    b = np.asarray(acq(mu, std, key=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
