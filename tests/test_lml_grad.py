"""LML gradient parity: JAX autodiff vs sklearn's analytic
eval_gradient (the formulas the reference's ML-II warm start uses)."""

import numpy as np
import jax.numpy as jnp
import sklearn.gaussian_process as skgp
import sklearn.gaussian_process.kernels as skk

from bask_tpu.models import bayesgpr as bg
from bask_tpu.models import gp as gpc
from bask_tpu.ops import kernels as bk


def test_lml_gradient_matches_sklearn():
    rng = np.random.RandomState(0)
    n, d = 20, 2
    X = rng.uniform(size=(n, d))
    y = np.sin(3 * X[:, 0]) + 0.1 * rng.randn(n)

    ours = bk.ConstantKernel(1.1, (0.1, 2.0)) * bk.Matern(
        (0.4, 0.3), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    theirs = skk.ConstantKernel(1.1, (0.1, 2.0)) * skk.Matern(
        (0.4, 0.3), (0.05, 2.0), nu=2.5
    ) + skk.WhiteKernel(0.05, (1e-5, 1e5))

    m = skgp.GaussianProcessRegressor(kernel=theirs, alpha=1e-10, optimizer=None)
    m.fit(X, y)

    data = gpc.make_data(X, y, np.full(n, 1e-10), np.ones(n, bool))
    for shift in (0.0, 0.15, -0.2):
        theta = ours.theta0 + shift
        vg = np.asarray(
            bg._lml_value_grad(jnp.asarray(theta), data, kernel=ours)
        )
        v, g = vg[0], vg[1:]  # packed [value, grad...] (one fetch)
        ref_v, ref_g = m.log_marginal_likelihood(theta, eval_gradient=True)
        np.testing.assert_allclose(float(-v), ref_v, rtol=1e-8)
        np.testing.assert_allclose(-np.asarray(g), ref_g, rtol=1e-6, atol=1e-9)
