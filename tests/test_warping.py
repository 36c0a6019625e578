"""Beta-CDF warping parity vs scipy and round-trip exactness."""

import numpy as np
import scipy.stats as st
import jax.numpy as jnp

from bask_tpu.models import warping as wp


def test_warp_matches_scipy_beta_cdf():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(40, 3))
    la = np.log([0.7, 1.0, 2.3])
    lb = np.log([1.5, 1.0, 0.4])
    ours = np.asarray(wp.warp(jnp.asarray(X), jnp.asarray(la), jnp.asarray(lb)))
    for j in range(3):
        ref = st.beta(np.exp(la[j]), np.exp(lb[j])).cdf(X[:, j])
        np.testing.assert_allclose(ours[:, j], ref, rtol=1e-8, atol=1e-10)


def test_unwarp_matches_scipy_beta_ppf():
    rng = np.random.RandomState(1)
    Z = rng.uniform(0.01, 0.99, size=(30, 2))
    la = np.log([0.8, 2.0])
    lb = np.log([1.3, 0.6])
    ours = np.asarray(
        wp.unwarp(jnp.asarray(Z), jnp.asarray(la), jnp.asarray(lb))
    )
    for j in range(2):
        ref = st.beta(np.exp(la[j]), np.exp(lb[j])).ppf(Z[:, j])
        np.testing.assert_allclose(ours[:, j], ref, atol=1e-9)


def test_warp_unwarp_roundtrip():
    rng = np.random.RandomState(2)
    X = rng.uniform(0.02, 0.98, size=(25, 2))
    la = jnp.asarray(np.log([1.4, 0.5]))
    lb = jnp.asarray(np.log([0.9, 1.8]))
    Z = wp.warp(jnp.asarray(X), la, lb)
    back = np.asarray(wp.unwarp(Z, la, lb))
    np.testing.assert_allclose(back, X, atol=1e-9)


def test_identity_warp_prior_peak():
    # identity warp (a=b=1) should maximize the default warp prior
    zero = jnp.zeros(2)
    p0 = float(wp.default_warp_log_prior(zero, zero))
    p1 = float(wp.default_warp_log_prior(zero + 0.5, zero - 0.2))
    assert p0 > p1


def test_split_warp_params():
    x = jnp.arange(7.0)
    theta, la, lb = wp.split_warp_params(x, 2)
    assert theta.tolist() == [0.0, 1.0, 2.0]
    assert la.tolist() == [3.0, 4.0]
    assert lb.tolist() == [5.0, 6.0]
