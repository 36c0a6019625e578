"""Priors, stats, and geometric-median tests.

Includes the reference's golden prior values (reference
tests/test_utils.py pins guess_priors on a nested kernel to 4 priors with
exact logpdf values at x=-0.9) and quadrature normalization of the
round-flat prior (reference tests/test_priors.py).
"""

import numpy as np
import scipy.stats as st
from scipy.integrate import quad

from bask_tpu.ops import kernels as bk
from bask_tpu.utils import priors as bp
from bask_tpu.utils import stats as bs
from bask_tpu.utils.median import geometric_median


def test_roundflat_normalized():
    prior = bp.make_roundflat()
    value = quad(lambda x: np.exp(float(prior(x))), 0.0, 10.0)[0]
    np.testing.assert_almost_equal(value, 1.0, decimal=6)


def test_guess_priors_golden():
    kernel = bk.Exponentiation(
        bk.ConstantKernel(1.0, "fixed") * bk.Matern(1.0, (1e-5, 1e5), nu=1.5)
        + bk.WhiteKernel(1.0, (1e-5, 1e5))
        + bk.RBF((1.0, 1.0), (1e-5, 1e5)),
        2.0,
    )
    priors = bp.guess_priors(kernel)
    assert len(priors) == 4
    expected = [
        -0.02116327824572739,
        -2.112906921232193,
        -0.02116327824572739,
        -0.02116327824572739,
    ]
    for p, v in zip(priors, expected, strict=True):
        np.testing.assert_almost_equal(float(p(-0.9)), v, decimal=6)


def test_default_kernel_theta_size():
    k = bp.construct_default_kernel([0, 1])
    assert k.n_theta == 3


def test_stats_vs_scipy():
    x = np.linspace(-3, 3, 31)
    np.testing.assert_allclose(
        np.asarray(bs.norm_logpdf(x, 0.3, 1.7)),
        st.norm(0.3, 1.7).logpdf(x),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(bs.norm_cdf(x)), st.norm.cdf(x), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(bs.norm_logcdf(x)), st.norm.logcdf(x), rtol=1e-6
    )
    xp = np.linspace(0.01, 5, 23)
    np.testing.assert_allclose(
        np.asarray(bs.halfnorm_logpdf(xp, scale=2.0)),
        st.halfnorm(scale=2.0).logpdf(xp),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(bs.invgamma_logpdf(xp, a=5.0, scale=1.0)),
        st.invgamma(a=5.0, scale=1.0).logpdf(xp),
        rtol=1e-9,
    )


def test_geometric_median():
    rng = np.random.RandomState(3)
    X = rng.randn(200, 4) + np.array([1.0, -2.0, 0.5, 3.0])
    med = np.asarray(geometric_median(X))

    # Verify first-order optimality of the Fermat point: the sum of unit
    # vectors to all points ~ 0.
    d = X - med
    u = d / np.linalg.norm(d, axis=1, keepdims=True)
    assert np.linalg.norm(u.sum(axis=0)) < 0.5

    # Degenerate case: all rows identical -> the common point
    same = np.tile([[1.0, 2.0]], (5, 1))
    np.testing.assert_allclose(
        np.asarray(geometric_median(same)), [1.0, 2.0], atol=1e-8
    )


def test_hdi_unimodal_and_multimodal():
    rng = np.random.RandomState(0)
    x = rng.randn(4000)
    iv = bs.hdi(x, hdi_prob=0.95, multimodal=False)
    assert iv.shape == (2,)
    np.testing.assert_allclose(iv, [-1.96, 1.96], atol=0.2)

    bimodal = np.concatenate([rng.randn(2000) - 4, rng.randn(2000) + 4])
    ivs = bs.hdi(bimodal, hdi_prob=0.9, multimodal=True)
    assert ivs.shape[0] >= 2
    assert ivs.shape[1] == 2
