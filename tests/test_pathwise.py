"""Pathwise (RFF-decoupled) posterior sampling: moment parity with the
exact predictive distribution, and the large-candidate batch ask."""

import numpy as np
import pytest

from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(30, 2))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.randn(30)
    gp = BayesGPR(
        kernel=bk.ConstantKernel(1.0, (0.1, 2.0))
        * bk.Matern((0.3, 0.3), (0.05, 2.0), nu=2.5),
        random_state=0,
    )
    gp.fit(X, y, n_burnin=3, progress=False)
    return gp


def test_pathwise_moments_match_exact(fitted):
    gp = fitted
    rng = np.random.RandomState(1)
    Xq = rng.uniform(size=(40, 2))
    S = 3000
    draws = gp.sample_y_pathwise(
        Xq, n_samples=S, random_state=2, n_features=2048
    )
    assert draws.shape == (40, S)
    mean, std = gp.predict(Xq, return_std=True)
    with gp.noise_set_to_zero():
        _, std_nf = gp.predict(Xq, return_std=True)

    emp_mean = draws.mean(axis=1)
    emp_std = draws.std(axis=1)
    # Monte-Carlo + RFF approximation error: generous but meaningful bands
    np.testing.assert_allclose(emp_mean, mean, atol=4 * std_nf.max() / np.sqrt(S) + 0.05)
    np.testing.assert_allclose(emp_std, std_nf, rtol=0.35, atol=0.03)


def test_pathwise_rejects_unsupported_kernel():
    gp = BayesGPR(
        kernel=bk.Exponentiation(bk.RBF(1.0, (0.1, 10.0)), 2.0),
        random_state=0,
    )
    X = np.random.RandomState(0).uniform(size=(8, 1))
    gp.fit(X, np.sin(X[:, 0]), n_burnin=1, progress=False)
    with pytest.raises(NotImplementedError):
        gp.sample_y_pathwise(X, n_samples=2)


def test_large_candidate_batch_ask(fitted):
    from bask_tpu.optimizer import Optimizer

    opt = Optimizer(
        dimensions=[(0.0, 1.0), (0.0, 1.0)],
        n_initial_points=0,
        n_points=4096,  # > 2048 triggers the pathwise branch
        random_state=3,
    )
    rng = np.random.RandomState(4)
    Xi = rng.uniform(size=(12, 2)).tolist()
    yi = [float(x[0] ** 2 + x[1]) for x in Xi]
    opt.tell(Xi, yi, gp_burnin=2)
    batch = opt.ask(n_points=8)
    assert len(batch) == 8
    assert len({tuple(p) for p in batch}) == 8
