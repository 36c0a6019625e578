"""BayesGPR facade behavior, mirroring reference tests/test_bayesgpr.py:
high-noise downweighting, noise_set_to_zero semantics, sample-without-fit,
plus chain/consensus sanity on a 1-D regression task."""

import numpy as np
import pytest

from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk
from bask_tpu.utils import stats as bs


@pytest.fixture(params=[False, True])
def minimal_gp(request):
    kernel = bk.ConstantKernel(1.0, (0.01**2, 1.0)) * bk.RBF(
        1.0, (0.5, 1.5)
    )
    return BayesGPR(
        random_state=1,
        normalize_y=False,
        kernel=kernel,
        warp_inputs=request.param,
    )


@pytest.fixture
def minimal_priors():
    import jax.numpy as jnp

    return [
        lambda x: bs.halfnorm_logpdf(jnp.sqrt(jnp.exp(x)), scale=1.0)
        + x / 2.0
        - np.log(2.0),
        lambda x: bs.invgamma_logpdf(jnp.exp(x), a=5.0, scale=1.0) + x,
        lambda x: bs.halfnorm_logpdf(jnp.sqrt(jnp.exp(x)), scale=1.0)
        + x / 2.0
        - np.log(2.0),
    ]


def test_noise_vector(minimal_gp, minimal_priors):
    X = np.array([[0.0], [0.0]])
    y = np.array([1.0, 0.0])
    noise_vector = np.array([1234.0, 0.0])
    minimal_gp.fit(
        X,
        y,
        noise_vector=noise_vector,
        n_burnin=1,
        progress=False,
        priors=minimal_priors,
    )
    prediction = minimal_gp.predict(np.array([[0.0]]))
    # The high-noise observation must barely influence the mean
    assert prediction < 0.01


def test_noise_set_to_zero(minimal_gp, minimal_priors):
    X = np.array([[0.1], [0.0], [-0.1]])
    y = np.array([0.0, 0.0, 0.0])
    minimal_gp.fit(X, y, n_burnin=1, progress=False, priors=minimal_priors)
    minimal_gp.theta = np.array([0.0, 0.0, 0.0])
    _, std = minimal_gp.predict(np.array([[0.0]]), return_std=True)
    assert std >= 1.0
    with minimal_gp.noise_set_to_zero():
        _, std_nf = minimal_gp.predict(np.array([[0.0]]), return_std=True)
        assert std_nf < 1.0
    _, std_after = minimal_gp.predict(np.array([[0.0]]), return_std=True)
    assert std_after >= 1.0


def test_sample_without_fit(minimal_gp):
    with pytest.raises(ValueError):
        minimal_gp.sample()


def test_fit_recovers_function():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(25, 1))
    y = np.sin(2 * np.pi * X[:, 0]) + 0.1 * rng.randn(25)
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        0.3, (0.05, 0.8), nu=2.5
    )
    gp = BayesGPR(kernel=kernel, random_state=0)
    gp.fit(X, y, n_burnin=3, n_desired_samples=100, progress=False)

    assert gp.chain_ is not None and gp.chain_.shape[1] == 3
    assert gp.pos_ is not None and gp.pos_.shape == (100, 3)
    assert np.isfinite(gp.log_marginal_likelihood_value_)
    assert gp.noise_ is not None and gp.noise_ > 0

    Xq = np.linspace(0, 1, 50)[:, None]
    mean = gp.predict(Xq)
    rms = np.sqrt(np.mean((mean - np.sin(2 * np.pi * Xq[:, 0])) ** 2))
    assert rms < 0.25

    # acceptance rate in a healthy band
    rate = gp.n_accepted_ / gp.n_proposals_
    assert 0.1 < rate < 0.95


def test_sample_y_shapes_and_consistency():
    rng = np.random.RandomState(1)
    X = rng.uniform(size=(15, 1))
    y = np.sin(4 * X[:, 0])
    gp = BayesGPR(random_state=2)
    gp.fit(X, y, n_burnin=2, progress=False)
    Xq = np.linspace(0, 1, 11)[:, None]

    s_mean = gp.sample_y(Xq, sample_mean=True, n_samples=5, random_state=3)
    assert s_mean.shape == (11, 5)
    s_hyper = gp.sample_y(Xq, n_samples=7, random_state=4)
    assert s_hyper.shape == (11, 7)
    assert np.isfinite(s_hyper).all()

    # warm-start continuation: second sample() reuses pos_ and keeps shapes
    gp.sample(n_desired_samples=100, add=True)
    assert gp.chain_.shape[0] == 200


def test_predict_gradients_match_fd():
    rng = np.random.RandomState(5)
    X = rng.uniform(size=(12, 2))
    y = X[:, 0] ** 2 + 0.3 * X[:, 1]
    gp = BayesGPR(random_state=6)
    gp.fit(X, y, n_burnin=2, progress=False)
    Xq = np.array([[0.4, 0.6]])
    mean, std, mg, sg = gp.predict(
        Xq, return_std=True, return_mean_grad=True, return_std_grad=True
    )
    eps = 1e-6
    for j in range(2):
        Xp = Xq.copy()
        Xp[0, j] += eps
        mp, sp = gp.predict(Xp, return_std=True)
        np.testing.assert_allclose(
            (mp[0] - mean[0]) / eps, mg[0, j], rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            (sp[0] - std[0]) / eps, sg[0, j], rtol=1e-3, atol=1e-5
        )


def test_progress_chunked_chain_identical():
    """progress=True must not change results: the chunked scan consumes
    the same per-step key array as the fused single-scan path."""
    from bask_tpu.models.bayesgpr import BayesGPR

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(10, 2))
    y = np.sin(3 * X[:, 0])

    chains = []
    for progress in (False, True):
        gp = BayesGPR(random_state=11)
        gp.fit(
            X,
            y,
            n_desired_samples=20,
            n_burnin=3,
            n_walkers_per_thread=10,
            progress=progress,
        )
        chains.append(np.copy(gp.chain_))
    np.testing.assert_array_equal(chains[0], chains[1])


def test_exponentiation_kernel_end_to_end():
    """A composite (Const*RBF)**1.5 user kernel through the full
    fit/predict/sample_y path (non-fusable: exercises the generic
    batched-LML fallback and guess_priors over Exponentiation,
    reference kernel algebra bask/bayesgpr.py:163)."""
    from bask_tpu.models.bayesgpr import BayesGPR
    from bask_tpu.ops import kernels as bk

    rng = np.random.RandomState(4)
    X = rng.uniform(size=(12, 2))
    y = np.sin(3 * X[:, 0]) + 0.1 * rng.randn(12)
    kernel = bk.Exponentiation(
        bk.ConstantKernel(1.0, (0.1, 10.0)) * bk.RBF(0.5, (0.05, 5.0)), 1.5
    )
    gp = BayesGPR(kernel=kernel, random_state=5)
    gp.fit(X, y, n_desired_samples=30, n_burnin=3, progress=False)
    assert np.isfinite(gp.chain_).all()
    mu, std = gp.predict(X, return_std=True)
    # interpolates its own training data within predicted uncertainty
    assert np.all(np.abs(mu - y) < 3 * std + 0.3)
    draws = gp.sample_y(X[:5], n_samples=4, random_state=0)
    assert draws.shape == (5, 4) and np.isfinite(draws).all()


def test_empty_retained_chain_raises():
    """A sample() call whose burn-in/thin would retain zero steps must
    raise instead of silently producing a nan geometric-median consensus
    (-inf LML, nan predictions) — the exact failure the n=32768 hardware
    tier hit before the guard existed. The reference inherits the hazard
    from emcee's get_chain(discard=...) (bask/bayesgpr.py:528-534)."""
    kernel = bk.ConstantKernel(1.0, (0.01**2, 1.0)) * bk.RBF(
        1.0, (0.5, 1.5)
    )
    gp = BayesGPR(random_state=0, normalize_y=True, kernel=kernel)
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(16, 2))
    y = X.sum(axis=1) + 0.1 * rng.randn(16)
    # burn-in exceeds total steps (negative desired samples)
    with pytest.raises(ValueError, match="Retained chain would be empty"):
        gp.fit(
            X, y, n_burnin=4, n_desired_samples=-2,
            n_walkers_per_thread=2, progress=False,
        )
    # thinning eats every post-burnin step
    with pytest.raises(ValueError, match="Retained chain would be empty"):
        gp.fit(
            X, y, n_burnin=2, n_desired_samples=2, n_thin=5,
            n_walkers_per_thread=2, progress=False,
        )
    # the minimal valid shape still fits cleanly
    gp.fit(
        X, y, n_burnin=1, n_desired_samples=2,
        n_walkers_per_thread=2, progress=False,
    )
    assert np.isfinite(gp.log_marginal_likelihood_value_)
    assert gp.chain_steps_.shape[0] == 1
