"""Reference-style NumPy/SciPy priors must keep working.

The reference accepts arbitrary Python callables as hyperparameter
priors (``bask/bayesgpr.py:368-372`` — its tests build them from
``scipy.stats``). bask-tpu's chain is jitted, so non-traceable priors
are routed through a ``pure_callback`` host adapter; the chain must be
bit-identical to the jnp-native formulation of the same density.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import halfnorm

from bask_tpu import BayesGPR
from bask_tpu.ops.kernels import ConstantKernel, Matern
from bask_tpu.utils.priors import make_roundflat


def _data():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(12, 1))
    y = np.sin(4.0 * X[:, 0]) + 0.1 * rng.randn(12)
    return X, y


def _kernel():
    return ConstantKernel(1.0, (0.1, 10.0)) * Matern(1.0, (0.05, 5.0), nu=2.5)


def _scipy_priors():
    """The reference tutorials' prior construction, verbatim style."""
    roundflat = make_roundflat()

    def variance_prior(x):
        return (
            halfnorm(scale=2.0).logpdf(np.sqrt(np.exp(x)))
            + x / 2.0
            - np.log(2.0)
        )

    return [
        variance_prior,
        lambda x: roundflat(np.exp(x)) + x,
        variance_prior,
    ]


def _jnp_priors():
    from bask_tpu.utils.priors import lengthscale_prior  # noqa: F401

    roundflat = make_roundflat()

    def variance_prior(x):
        # halfnorm(scale=2).logpdf(z) = log(sqrt(2/pi)/2) - z^2/8
        z2 = jnp.exp(x)
        return (
            0.5 * math.log(2.0 / math.pi)
            - math.log(2.0)
            - z2 / 8.0
            + x / 2.0
            - math.log(2.0)
        )

    return [
        variance_prior,
        lambda x: roundflat(jnp.exp(x)) + x,
        variance_prior,
    ]


def test_scipy_priors_match_jnp_chain():
    X, y = _data()
    chains = []
    for priors in (_scipy_priors(), _jnp_priors()):
        gp = BayesGPR(kernel=_kernel(), random_state=3)
        gp.fit(
            X, y, priors=priors, n_burnin=4, n_desired_samples=50,
            progress=False,
        )
        chains.append(np.asarray(gp.chain_))
    assert np.isfinite(chains[0]).all()
    np.testing.assert_allclose(chains[0], chains[1], rtol=0, atol=1e-6)


def test_host_prior_warns_once_and_is_cached():
    X, y = _data()
    priors = _scipy_priors()
    gp = BayesGPR(kernel=_kernel(), random_state=1)
    with pytest.warns(UserWarning, match="not JAX-traceable"):
        gp.fit(X, y, priors=priors, n_burnin=2, n_desired_samples=20,
               progress=False)
    # same prior objects resolve to the same cached wrappers -> the
    # jitted chain (static priors arg) is not recompiled per tell
    wrapped_a = gp._resolve_priors(priors)
    wrapped_b = gp._resolve_priors(priors)
    assert wrapped_a == wrapped_b


def test_joint_host_prior_callable():
    X, y = _data()

    def joint(theta):  # whole-vector NumPy prior
        return float(-0.5 * np.sum(np.square(np.asarray(theta))))

    gp = BayesGPR(kernel=_kernel(), random_state=2)
    with pytest.warns(UserWarning, match="not JAX-traceable"):
        gp.fit(X, y, priors=joint, n_burnin=2, n_desired_samples=20,
               progress=False)
    assert np.isfinite(np.asarray(gp.chain_)).all()
