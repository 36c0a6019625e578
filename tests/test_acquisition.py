"""Acquisition layer tests.

- PVRS/VR fused rank-1 path vs a naive per-candidate Cholesky oracle
  (the algorithm the reference implements with a Python loop,
  bask/acquisition.py:289-299)
- argmax sanity of all 8 acquisitions on the reference's 4-point fixture
  (tests/test_acquisition.py in the reference; exact indices depend on
  the emcee RNG so we assert windows around the reference argmaxes)
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.linalg import cho_solve, cholesky

from bask_tpu import acquisition as acq
from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk
from bask_tpu.utils import stats as bs


def _hn_prior(x):
    return (
        bs.halfnorm_logpdf(jnp.sqrt(jnp.exp(x)), scale=1.0)
        + x / 2.0
        - np.log(2.0)
    )


def _ig_prior(x):
    return bs.invgamma_logpdf(jnp.exp(x), a=5.0, scale=1.0) + x


@pytest.fixture(scope="module")
def fitted_gp():
    kernel = bk.ConstantKernel(1.0, (0.01**2, 1.0)) * bk.RBF(1.0, (0.5, 1.5))
    gp = BayesGPR(random_state=1, normalize_y=False, kernel=kernel)
    priors = [_hn_prior, _ig_prior, _hn_prior]
    x = np.array([-2.0, -1.0, 1.0, 2.0])[:, None]
    y = np.array([0.0, -1.0, 1.0, 2.0])
    gp.fit(x, y, priors=priors, progress=False, n_burnin=5)
    return gp


def _naive_variance_explained(gp, X_cand, P):
    """Reference algorithm: per-candidate augmented Cholesky."""
    kernel = gp.kernel_
    theta = gp._theta
    X_train = gp._X_orig
    n = len(X_train)
    alpha_vec = np.asarray(gp._data.alpha_diag)[:n]
    out = []
    for c in X_cand:
        Xa = np.vstack([X_train, c[None, :]])
        K = np.array(kernel.eval(jnp.asarray(theta), jnp.asarray(Xa)))
        K[np.diag_indices_from(K)] += np.concatenate([alpha_vec, [0.0]])
        L = cholesky(K, lower=True)
        Kt = np.asarray(
            kernel.eval(jnp.asarray(theta), jnp.asarray(P), jnp.asarray(Xa))
        )
        v = cho_solve((L, True), Kt.T)
        out.append(np.trace(Kt @ v))
    return np.array(out)


def test_fused_variance_reduction_matches_naive(fitted_gp):
    gp = fitted_gp
    X_cand = np.linspace(-2, 2, 17)[:, None]
    P = np.linspace(-2, 2, 9)[:, None]
    fused = np.asarray(
        acq._variance_explained(
            gp.kernel_,
            jnp.asarray(gp._theta),
            gp._post,
            gp._post_data,
            jnp.asarray(X_cand),
            jnp.asarray(P),
        )
    )
    naive = _naive_variance_explained(gp, X_cand, P)
    np.testing.assert_allclose(fused, naive, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize(
    "acq_cls, n_samples, ref_argmax, window",
    [
        (acq.MaxValueSearch, 1, 37, 12),
        (acq.VarianceReduction, 0, 50, 10),
        (acq.PVRS, 0, 38, 25),
        (acq.LCB, 1, 38, 12),
        (acq.ExpectedImprovement, 1, 33, 12),
        (acq.Expectation, 1, 30, 12),
        (acq.ThompsonSampling, 1, 25, 50),
        (acq.TopTwoEI, 1, 32, 12),
    ],
)
def test_acquisition_argmax(acq_cls, n_samples, ref_argmax, window, fitted_gp):
    x = np.linspace(-2.0, 2.0, num=101)[:, None]
    values = acq.evaluate_acquisitions(
        X=x,
        gpr=fitted_gp,
        acquisition_functions=[acq_cls()],
        random_state=1,
        n_samples=n_samples,
    )
    assert values.shape == (1, 101)
    am = int(np.argmax(values))
    assert abs(am - ref_argmax) <= window, (
        f"{acq_cls.__name__}: argmax {am} vs reference {ref_argmax}"
    )


def test_evaluate_multiple_acquisitions_at_once(fitted_gp):
    x = np.linspace(-2.0, 2.0, num=31)[:, None]
    values = acq.evaluate_acquisitions(
        X=x,
        gpr=fitted_gp,
        acquisition_functions=[
            acq.ExpectedImprovement(),
            acq.ThompsonSampling(),
            acq.PVRS(),
        ],
        random_state=2,
        n_samples=5,
    )
    assert values.shape == (3, 31)
    assert np.isfinite(values).all()
