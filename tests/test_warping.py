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


# -- public warper API (reference bask/bayesgpr.py:249-316) -----------------


def _fitted_warped_gp():
    from bask_tpu.models.bayesgpr import BayesGPR
    from bask_tpu.ops import kernels as bk

    rng = np.random.RandomState(3)
    X = rng.uniform(0.05, 0.95, size=(12, 2))
    y = np.sin(4 * X[:, 0]) + X[:, 1]
    gp = BayesGPR(
        kernel=bk.ConstantKernel(1.0, (0.1, 2.0))
        * bk.Matern((0.3, 0.3), (0.05, 2.0), nu=2.5),
        warp_inputs=True,
        random_state=5,
    )
    gp.fit(
        X,
        y,
        n_desired_samples=16,
        n_burnin=2,
        n_walkers_per_thread=16,
        progress=False,
    )
    return gp, X


def test_create_warpers_rewarp_reference_usage():
    """The reference's evaluate_acquisitions manipulates the GP exactly
    like this (bask/acquisition.py:113-121); ported user code must run
    unmodified and produce the per-draw warped prediction."""
    gp, X = _fitted_warped_gp()
    row = gp.chain_[len(gp.chain_) // 2]
    n_theta = gp.kernel_.n_theta
    alphas, betas = row[n_theta : n_theta + 2], row[n_theta + 2 :]

    gp.create_warpers(alphas, betas)
    gp.rewarp()
    gp.theta = row[:n_theta]
    Xq = np.random.RandomState(0).uniform(0.1, 0.9, size=(5, 2))
    mu, std = gp.predict(Xq, return_std=True)

    # oracle: independent scipy-warped GP prediction at the same theta
    import jax.numpy as jnp

    from bask_tpu.models import gp as gpc

    Xw = np.stack(
        [st.beta(np.exp(a), np.exp(b)).cdf(X[:, j])
         for j, (a, b) in enumerate(zip(alphas, betas))],
        axis=1,
    )
    Xqw = np.stack(
        [st.beta(np.exp(a), np.exp(b)).cdf(Xq[:, j])
         for j, (a, b) in enumerate(zip(alphas, betas))],
        axis=1,
    )
    data = gpc.make_data(
        jnp.asarray(Xw),
        jnp.asarray(gp.y_train_),
        jnp.asarray(np.asarray(gp._data.alpha_diag)[: len(X)]),
        jnp.ones(len(X), bool),
    )
    theta = jnp.asarray(row[:n_theta])
    post = gpc.posterior(gp.kernel_, theta, data)
    mu_o, std_o = gpc.predict(
        gp.kernel_, theta, post, data, jnp.asarray(Xqw), return_std=True
    )
    np.testing.assert_allclose(mu, np.asarray(mu_o), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(std, np.asarray(std_o), rtol=1e-6, atol=1e-8)


def test_warpers_unwarpers_properties_match_scipy():
    gp, X = _fitted_warped_gp()
    ws, uws = gp.warpers_, gp.unwarpers_
    assert len(ws) == 2 and len(uws) == 2
    x = np.linspace(0.05, 0.95, 11)
    for j in range(2):
        ref = st.beta(
            np.exp(gp.warp_alphas_[j]), np.exp(gp.warp_betas_[j])
        ).cdf(x)
        np.testing.assert_allclose(ws[j](x), ref, rtol=1e-12)
        np.testing.assert_allclose(uws[j](ws[j](x)), x, rtol=1e-9)
    # X_train_ exposes the warped view built from the same warpers
    np.testing.assert_allclose(
        gp.X_train_,
        np.stack([ws[j](X[:, j]) for j in range(2)], axis=1),
        rtol=1e-7,
        atol=1e-9,
    )


def test_x_train_setter_updates_predictions():
    gp, X = _fitted_warped_gp()
    mu_before = gp.predict(np.full((1, 2), 0.5))
    X2 = np.clip(X + 0.02, 0.0, 1.0)
    gp.X_train_ = X2
    np.testing.assert_allclose(
        gp._X_orig, X2
    )
    mu_after = gp.predict(np.full((1, 2), 0.5))
    assert not np.allclose(mu_before, mu_after)
