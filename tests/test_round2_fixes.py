"""Round-2 parity-burr fixes (VERDICT.md #6 + ADVICE.md items).

Pins: exact ``alpha == "inf"`` in LCB (reference
``bask/acquisition.py:213-216``), log-uniform Integer dimensions,
WhiteKernel detection restricted to Sum summands (reference
``_param_for_white_kernel_in_Sum``), NotFittedError on unfitted
prediction, fit_params forwarding in BayesSearchCV, serialization
restoring gp.alpha and the sb init RNG, and the capped _ask_batch
fallback for non-fusable kernels.
"""

import warnings

import numpy as np
import pytest

from bask_tpu.acquisition import LCB
from bask_tpu.ops import kernels as bk
from bask_tpu.space import Integer


def test_lcb_inf_exact_match():
    mu = np.array([0.0, 1.0])
    std = np.array([1.0, 2.0])
    np.testing.assert_allclose(LCB()(mu, std, alpha="inf"), std)
    np.testing.assert_allclose(
        LCB()(mu, std, alpha=2.0), 2.0 * std - mu
    )
    # any other string is an error (reference falls through to the
    # arithmetic and raises TypeError)
    with pytest.raises(TypeError):
        np.asarray(LCB()(mu, std, alpha="huge"))


class TestIntegerPrior:
    def test_log_uniform_transform_roundtrip(self):
        dim = Integer(1, 1024, prior="log-uniform")
        vals = np.array([1, 2, 32, 1024])
        t = dim.transform(vals)
        assert np.all((t >= 0) & (t <= 1))
        np.testing.assert_allclose(
            t, np.log2(vals) / 10.0, rtol=1e-12
        )
        back = dim.inverse_transform(t)
        np.testing.assert_array_equal(back, vals)

    def test_log_uniform_rvs_is_log_spread(self):
        dim = Integer(1, 10000, prior="log-uniform")
        rs = np.random.RandomState(0)
        draws = dim.rvs(4000, rs)
        assert draws.min() >= 1 and draws.max() <= 10000
        # median of log-uniform on [1, 1e4] is 100; uniform would be ~5000
        assert np.median(draws) < 1000

    def test_invalid_prior_raises(self):
        with pytest.raises(ValueError):
            Integer(1, 8, prior="normal")
        with pytest.raises(ValueError):
            Integer(0, 8, prior="log-uniform")


class TestWhiteThetaIndex:
    def test_top_level_sum_found(self):
        k = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.RBF(
            0.3, (0.05, 2.0)
        ) + bk.WhiteKernel(0.01, (1e-5, 1e5))
        assert bk.white_theta_index(k) == 2

    def test_nested_sum_found(self):
        inner = bk.RBF(0.3, (0.05, 2.0)) + bk.WhiteKernel(0.01, (1e-5, 1e5))
        k = inner + bk.ConstantKernel(1.0, (0.1, 2.0))
        assert bk.white_theta_index(k) == 1

    def test_white_in_product_ignored(self):
        # a WhiteKernel factor is not additive noise: zeroing it would
        # zero the whole product term (ADVICE.md kernels.py:430)
        k = bk.RBF(0.3, (0.05, 2.0)) * bk.WhiteKernel(0.01, (1e-5, 1e5))
        assert bk.white_theta_index(k) is None
        k2 = k + bk.ConstantKernel(1.0, (0.1, 2.0))
        assert bk.white_theta_index(k2) is None

    def test_product_then_sum_white(self):
        k = bk.RBF(0.3, (0.05, 2.0)) * bk.WhiteKernel(
            0.01, (1e-5, 1e5)
        ) + bk.WhiteKernel(0.02, (1e-5, 1e5))
        assert bk.white_theta_index(k) == 2


class TestUnfittedPriorPredict:
    """Unfitted predict/sample_y use the GP *prior* — the sklearn GPR
    behavior the reference inherits (``bask/bayesgpr.py:622``)."""

    def _pair(self):
        import sklearn.gaussian_process as skgp
        import sklearn.gaussian_process.kernels as skk

        from bask_tpu import BayesGPR
        from bask_tpu.ops import kernels as bk

        k = bk.ConstantKernel(2.0, (0.1, 10.0)) * bk.Matern(
            0.7, (0.05, 2.0), nu=2.5
        )
        sk = skk.ConstantKernel(2.0, (0.1, 10.0)) * skk.Matern(
            0.7, (0.05, 2.0), nu=2.5
        )
        return BayesGPR(kernel=k), skgp.GaussianProcessRegressor(
            kernel=sk, optimizer=None
        )

    def test_prior_mean_std_cov_match_sklearn(self):
        gpr, skr = self._pair()
        X = np.random.RandomState(0).uniform(size=(7, 3))
        mu, std = gpr.predict(X, return_std=True)
        mu_ref, std_ref = skr.predict(X, return_std=True)
        np.testing.assert_allclose(mu, mu_ref, atol=1e-12)
        np.testing.assert_allclose(std, std_ref, rtol=1e-10)
        _, cov = gpr.predict(X, return_cov=True)
        _, cov_ref = skr.predict(X, return_cov=True)
        np.testing.assert_allclose(cov, cov_ref, rtol=1e-10, atol=1e-12)

    def test_prior_grads_zero_for_stationary(self):
        gpr, _ = self._pair()
        X = np.random.RandomState(1).uniform(size=(4, 3))
        mu, std, mg, sg = gpr.predict(
            X, return_std=True, return_mean_grad=True, return_std_grad=True
        )
        np.testing.assert_allclose(mg, 0.0, atol=1e-12)
        np.testing.assert_allclose(sg, 0.0, atol=1e-9)

    def test_prior_sample_y_moments(self):
        gpr, _ = self._pair()
        X = np.random.RandomState(2).uniform(size=(5, 3))
        draws = gpr.sample_y(X, n_samples=4000, random_state=0)
        assert draws.shape == (5, 4000)
        # prior mean 0, marginal variance = kernel diagonal (2.0)
        np.testing.assert_allclose(draws.mean(axis=1), 0.0, atol=0.15)
        np.testing.assert_allclose(draws.var(axis=1), 2.0, rtol=0.15)


def test_searchcv_forwards_fit_params():
    from sklearn.base import BaseEstimator, ClassifierMixin
    from sklearn.datasets import load_iris

    from bask_tpu import BayesSearchCV
    from bask_tpu.space import Real

    seen = {"flag": 0}

    class NeedsParam(ClassifierMixin, BaseEstimator):
        def __init__(self, c=1.0):
            self.c = c

        def fit(self, X, y, special_flag=None):
            assert special_flag is not None, "fit param was dropped"
            seen["flag"] += 1
            self.classes_ = np.unique(y)
            return self

        def predict(self, X):
            return np.full(len(X), self.classes_[0])

    X, y = load_iris(return_X_y=True)
    search = BayesSearchCV(
        NeedsParam(),
        {"c": Real(0.1, 10.0)},
        n_iter=2,
        cv=2,
        refit=True,
        random_state=0,
        fit_params={"special_flag": True},
        optimizer_kwargs={"n_initial_points": 2},
    )
    search.fit(X, y)
    assert seen["flag"] >= 4  # 2 iterations x 2 folds (+ refit)


def test_save_optimizer_warns_on_custom_acquisition(tmp_path):
    from bask_tpu import Optimizer
    from bask_tpu.acquisition import UncertaintyAcquisition
    from bask_tpu.utils.serialization import save_optimizer

    class MyAcq(UncertaintyAcquisition):
        def __call__(self, mu, std, *args, **kwargs):
            return -mu

    opt = Optimizer(
        dimensions=[(-1.0, 1.0)],
        acq_func=MyAcq(),
        n_initial_points=2,
        init_strategy="random",
        random_state=0,
    )
    opt.tell([0.3], 0.1, fit=False)
    with pytest.warns(UserWarning, match="not in ACQUISITION_FUNC"):
        save_optimizer(opt, str(tmp_path / "opt.npz"))


def test_load_optimizer_restores_alpha_and_init_rng(tmp_path):
    from bask_tpu import Optimizer
    from bask_tpu.utils.serialization import load_optimizer, save_optimizer

    opt = Optimizer(
        dimensions=[(-1.0, 1.0), (0.0, 2.0)],
        n_initial_points=4,
        init_strategy="sb",
        random_state=7,
        gp_kwargs={"alpha": 3e-7},
    )
    opt.tell([0.3, 1.0], 0.1, fit=False)
    path = str(tmp_path / "opt.npz")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        save_optimizer(opt, path)
    opt2 = load_optimizer(path)
    assert opt2.gp.alpha == 3e-7
    # the sb init stream must continue identically after resume
    assert opt.ask() == opt2.ask()


def test_ask_batch_fallback_caps_grid(monkeypatch):
    from bask_tpu import Optimizer

    opt = Optimizer(
        dimensions=[(-1.0, 1.0)],
        n_points=4096,
        n_initial_points=1,
        init_strategy="random",
        random_state=0,
    )
    opt.tell([0.3], 0.1, n_samples=2, gp_samples=20, gp_burnin=2)
    assert opt._n_initial_points <= 0

    sizes = {}

    def fake_topk(X, **kwargs):
        raise NotImplementedError

    def fake_sample_y(X, n_samples=1, random_state=None, **kwargs):
        sizes["m"] = len(X)
        return np.random.RandomState(0).randn(len(X), n_samples)

    monkeypatch.setattr(opt.gp, "thompson_argmin_pathwise", fake_topk)
    monkeypatch.setattr(opt.gp, "sample_y", fake_sample_y)
    pts = opt.ask(n_points=3)
    assert len(pts) == 3
    assert sizes["m"] == 2048  # fallback grid capped, not the full 4096


def test_tell_progress_true_end_to_end():
    """progress=True through Optimizer.tell: chunked chain + dispatcher
    bar, same results as progress=False (chain identity is pinned in
    test_bayesgpr; here the full tell path must simply work)."""
    from bask_tpu import Optimizer

    results = []
    for progress in (False, True):
        opt = Optimizer(
            dimensions=[(0.0, 1.0)],
            n_initial_points=2,
            init_strategy="random",
            n_points=32,
            random_state=5,
        )
        opt.tell(
            [[0.2], [0.8], [0.5]],
            [0.3, 0.1, -0.2],
            n_samples=2,
            gp_samples=20,
            gp_burnin=2,
            progress=progress,
        )
        results.append(opt.ask())
    assert results[0] == results[1]
