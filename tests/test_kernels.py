"""Kernel algebra parity vs sklearn (the substrate the reference builds on).

The reference relies on sklearn/skopt kernels with log-space theta
vectorization (reference bask/bayesgpr.py:163, bask/utils.py:68-151);
these tests pin our gram matrices and theta ordering to sklearn's.
"""

import numpy as np
import pytest
import sklearn.gaussian_process.kernels as skk

from bask_tpu.ops import kernels as bk

rng = np.random.RandomState(0)
X = rng.uniform(size=(7, 3))
Y = rng.uniform(size=(5, 3))


PAIRS = [
    (
        bk.ConstantKernel(1.3, (0.1, 2.0)),
        skk.ConstantKernel(1.3, (0.1, 2.0)),
    ),
    (bk.WhiteKernel(0.7, (1e-5, 1e5)), skk.WhiteKernel(0.7, (1e-5, 1e5))),
    (bk.RBF(0.4, (0.1, 1.0)), skk.RBF(0.4, (0.1, 1.0))),
    (
        bk.RBF((0.4, 0.2, 0.9), (0.1, 1.0)),
        skk.RBF((0.4, 0.2, 0.9), (0.1, 1.0)),
    ),
    (bk.Matern(0.5, (0.1, 1.0), nu=0.5), skk.Matern(0.5, (0.1, 1.0), nu=0.5)),
    (bk.Matern(0.5, (0.1, 1.0), nu=1.5), skk.Matern(0.5, (0.1, 1.0), nu=1.5)),
    (bk.Matern(0.5, (0.1, 1.0), nu=2.5), skk.Matern(0.5, (0.1, 1.0), nu=2.5)),
    (
        bk.ConstantKernel(1.5, (0.1, 2.0)) * bk.Matern((0.3, 0.3, 0.3), (0.2, 0.5), nu=2.5)
        + bk.WhiteKernel(0.1, (1e-5, 1e5)),
        skk.ConstantKernel(1.5, (0.1, 2.0)) * skk.Matern((0.3, 0.3, 0.3), (0.2, 0.5), nu=2.5)
        + skk.WhiteKernel(0.1, (1e-5, 1e5)),
    ),
    (
        bk.Exponentiation(
            bk.ConstantKernel(1.0, "fixed") * bk.Matern(1.0, (0.1, 10.0), nu=1.5)
            + bk.RBF((1.0, 1.0, 1.0), (0.1, 10.0)),
            2.0,
        ),
        skk.Exponentiation(
            skk.ConstantKernel(1.0, "fixed") * skk.Matern(1.0, (0.1, 10.0), nu=1.5)
            + skk.RBF((1.0, 1.0, 1.0), (0.1, 10.0)),
            2.0,
        ),
    ),
]


@pytest.mark.parametrize("ours,theirs", PAIRS)
def test_theta_layout(ours, theirs):
    assert ours.n_theta == len(theirs.theta)
    np.testing.assert_allclose(ours.theta0, theirs.theta, rtol=1e-12)
    np.testing.assert_allclose(ours.bounds, theirs.bounds, rtol=1e-12)


@pytest.mark.parametrize("ours,theirs", PAIRS)
def test_gram_parity(ours, theirs):
    theta = ours.theta0
    np.testing.assert_allclose(
        np.asarray(ours.eval(theta, X)), theirs(X), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ours.eval(theta, X, Y)), theirs(X, Y), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ours.diag(theta, X)), theirs.diag(X), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("ours,theirs", PAIRS)
def test_gram_at_other_theta(ours, theirs):
    if ours.n_theta == 0:
        return
    theta = ours.theta0 + 0.37
    theirs2 = theirs.clone_with_theta(theirs.theta + 0.37)
    np.testing.assert_allclose(
        np.asarray(ours.eval(theta, X)), theirs2(X), rtol=1e-10, atol=1e-12
    )
    ours2 = ours.with_theta(theta)
    np.testing.assert_allclose(ours2.theta0, theirs2.theta, rtol=1e-10)


def test_white_theta_index():
    k = (
        bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern((0.3, 0.3), (0.2, 0.5), nu=2.5)
        + bk.WhiteKernel(1.0, (1e-5, 1e5))
    )
    assert bk.white_theta_index(k) == 3
    assert bk.white_theta_index(bk.RBF(1.0, (0.1, 1.0))) is None
