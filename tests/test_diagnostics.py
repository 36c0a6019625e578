"""MCMC convergence diagnostics (split R-hat, ESS, autocorr time).

Estimators validated on synthetic chains with known properties, then on
a real BayesGPR hyperposterior (the reference exposes no diagnostics —
``bask/bayesgpr.py:510-534`` discards the emcee sampler).
"""

import numpy as np
import pytest

from bask_tpu.utils.diagnostics import (
    effective_sample_size,
    integrated_autocorr_time,
    split_rhat,
)


def test_iid_chains_converged():
    rng = np.random.RandomState(0)
    x = rng.randn(400, 8, 2)  # iid: perfectly mixed
    rhat = split_rhat(x)
    ess = effective_sample_size(x)
    tau = integrated_autocorr_time(x)
    assert np.all(rhat < 1.02), rhat
    assert np.all(ess > 0.5 * 400 * 8), ess
    assert np.all(tau < 2.0), tau


def test_ar1_chains_reduced_ess():
    """AR(1) with phi=0.9: tau ~ (1+phi)/(1-phi) = 19, ESS ~ N/tau."""
    rng = np.random.RandomState(1)
    phi = 0.9
    n, m = 2000, 6
    x = np.zeros((n, m))
    eps = rng.randn(n, m) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t]
    tau = integrated_autocorr_time(x[:, :, None])[0]
    assert 10.0 < tau < 40.0, tau
    ess = effective_sample_size(x[:, :, None])[0]
    assert 0.3 * n * m / 19 < ess < 3.0 * n * m / 19, ess
    assert split_rhat(x[:, :, None])[0] < 1.1


def test_disjoint_chains_flagged():
    rng = np.random.RandomState(2)
    x = rng.randn(200, 4, 1) * 0.1
    x[:, 0] += 3.0  # one chain stuck elsewhere
    assert split_rhat(x)[0] > 1.5
    # persistent between-chain differences also crush the pooled ESS
    assert effective_sample_size(x)[0] < 100


def test_short_chain_raises():
    with pytest.raises(ValueError):
        split_rhat(np.zeros((2, 4, 1)))


def test_bayesgpr_diagnostics_end_to_end():
    from bask_tpu import BayesGPR
    from bask_tpu.ops.kernels import ConstantKernel, Matern

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(12, 1))
    y = np.sin(4.0 * X[:, 0]) + 0.1 * rng.randn(12)
    gp = BayesGPR(
        kernel=ConstantKernel(1.0, (0.1, 10.0))
        * Matern(1.0, (0.05, 5.0), nu=2.5),
        random_state=0,
    )
    # long chain: diagnostics need n_steps >> autocorrelation time
    # (a 30-step chain correctly reads rhat ~ 2 — not converged)
    gp.fit(X, y, n_burnin=100, n_desired_samples=30000, progress=False)
    diag = gp.mcmc_diagnostics()
    d = gp.chain_.shape[1]
    assert diag["rhat"].shape == (d,)
    assert np.all(np.isfinite(diag["rhat"]))
    assert np.all(diag["rhat"] < 1.2), diag["rhat"]
    assert np.all(diag["ess"] > 100), diag["ess"]
    assert np.all(diag["autocorr_time"] >= 1.0)
    assert 0.0 < diag["acceptance"] <= 1.0
    assert diag["n_steps"] == gp.chain_steps_.shape[0] == 300
    assert diag["n_walkers"] == 100

    # chain_steps_ flattens to exactly chain_ (same kept steps)
    np.testing.assert_array_equal(
        gp.chain_steps_.reshape(-1, d), gp.chain_
    )

    # diagnostics survive checkpoint/resume (incl. acceptance counters)
    import tempfile

    from bask_tpu import load_gpr, save_gpr

    with tempfile.NamedTemporaryFile(suffix=".npz") as fh:
        save_gpr(gp, fh.name)
        gp2 = load_gpr(fh.name)
    diag2 = gp2.mcmc_diagnostics()
    np.testing.assert_allclose(diag2["rhat"], diag["rhat"])
    assert diag2["acceptance"] == diag["acceptance"]


def test_add_chain_accumulates_consistently():
    """sample(add=True) must keep chain_, chain_steps_, and the
    acceptance counters describing the SAME combined chain — and the
    flat chain stays a zero-copy view of the step-major array."""
    from bask_tpu import BayesGPR
    from bask_tpu.ops.kernels import ConstantKernel, Matern

    rng = np.random.RandomState(1)
    X = rng.uniform(size=(10, 1))
    y = np.sin(3.0 * X[:, 0]) + 0.1 * rng.randn(10)
    gp = BayesGPR(
        kernel=ConstantKernel(1.0, (0.1, 10.0))
        * Matern(1.0, (0.05, 5.0), nu=2.5),
        random_state=3,
    )
    gp.fit(X, y, n_burnin=4, n_desired_samples=400, progress=False)
    acc1, prop1 = gp.n_accepted_, gp.n_proposals_
    gp.sample(add=True, n_burnin=0, n_desired_samples=400)
    assert gp.n_proposals_ > prop1  # accumulated, not overwritten
    assert gp.n_accepted_ >= acc1
    d = gp.chain_.shape[1]
    assert gp.chain_steps_.shape == (8, 100, d)
    np.testing.assert_array_equal(
        gp.chain_steps_.reshape(-1, d), gp.chain_
    )
    assert np.shares_memory(gp.chain_, gp.chain_steps_)
    diag = gp.mcmc_diagnostics()
    assert diag["n_steps"] == 8
    assert 0.0 < diag["acceptance"] <= 1.0


def test_diagnostics_require_chain():
    from bask_tpu import BayesGPR

    with pytest.raises(ValueError):
        BayesGPR().mcmc_diagnostics()
