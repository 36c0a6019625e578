"""BayesGPR(row_mesh=...) — the estimator-level huge-n mode.

ops/dist_chol's sweeps are parity-pinned in test_dist_chol.py; these
tests pin the PLUMBING: the chain log-prob, ML-II gradients, consensus
refresh, predict/sample_y, and LML routing all go through the
row-sharded paths without ever materializing an (n_pad, n_pad) factor,
and agree with the per-chip implementation to float64 precision. The
reference has no distributed execution at all (SURVEY §2 absent-rows).
"""

import pickle
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bask_tpu.models import gp as gpc
from bask_tpu.models.bayesgpr import (
    BayesGPR,
    _lml_value_grad,
    _make_log_prob_batch,
    _row_lml_value_grad,
)
from bask_tpu.ops.kernels import ConstantKernel, Matern, WhiteKernel


def _row_mesh():
    devs = np.array(jax.devices("cpu")[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(devs, ("r",))


def _wr_mesh():
    devs = np.array(jax.devices("cpu")[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(devs.reshape(2, 4), ("w", "r"))


def _kernel(d=2):
    return ConstantKernel(1.0, (0.1, 10.0)) * Matern(
        (0.5,) * d, (0.05, 5.0), nu=2.5
    )


def _problem(n=53, d=2, seed=3):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    y = np.sin(3.0 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.randn(n)
    return X, y


def _fit(gp, X, y, **kw):
    kw.setdefault("n_desired_samples", 24)
    kw.setdefault("n_burnin", 2)
    kw.setdefault("n_walkers_per_thread", 8)
    kw.setdefault("progress", False)
    return gp.fit(X, y, **kw)


def test_log_prob_batch_row_matches_plain():
    """The chain's row-sharded log-prob == the batched_lml log-prob."""
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=1)
    gp._spec = gp._user_kernel + WhiteKernel(1.0, (1e-5, 1e5))
    gp._set_data(X, y, None)
    priors = gp._resolve_priors(None)
    data = gp._data

    plain = _make_log_prob_batch(gp._spec, priors, None, 0, data)
    row = _make_log_prob_batch(
        gp._spec, priors, None, 0, data,
        row_cfg=(_row_mesh(), 16, False),
    )
    rng = np.random.RandomState(0)
    thetas = jnp.asarray(
        gp._spec.theta0[None, :] + 0.1 * rng.randn(8, gp._spec.n_theta)
    )
    np.testing.assert_allclose(
        np.asarray(row(thetas)), np.asarray(plain(thetas)),
        rtol=1e-9, atol=1e-9,
    )


def test_log_prob_batch_2d_mesh_matches_plain():
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=1)
    gp._spec = gp._user_kernel + WhiteKernel(1.0, (1e-5, 1e5))
    gp._set_data(X, y, None)
    priors = gp._resolve_priors(None)
    data = gp._data
    plain = _make_log_prob_batch(gp._spec, priors, None, 0, data)
    row = _make_log_prob_batch(
        gp._spec, priors, None, 0, data,
        row_cfg=(_wr_mesh(), 16, False),
    )
    rng = np.random.RandomState(1)
    thetas = jnp.asarray(
        gp._spec.theta0[None, :] + 0.1 * rng.randn(8, gp._spec.n_theta)
    )
    np.testing.assert_allclose(
        np.asarray(row(thetas)), np.asarray(plain(thetas)),
        rtol=1e-9, atol=1e-9,
    )


def test_log_prob_batch_row_matches_plain_warped():
    """Warped chains in row mode (VERDICT r3 #4): the per-walker
    Beta-CDF warp folds into each walker's distributed sweep and must
    match the dense warped log-prob to f64 precision."""
    from bask_tpu.models import warping as wpm

    X, y = _problem(n=48)
    gp = BayesGPR(kernel=_kernel(), random_state=1, warp_inputs=True)
    gp._spec = gp._user_kernel + WhiteKernel(1.0, (1e-5, 1e5))
    gp._set_data(X, y, None)
    priors = gp._resolve_priors(None)
    data = gp._data
    n_warp = X.shape[1]

    plain = _make_log_prob_batch(
        gp._spec, priors, wpm.default_warp_log_prior, n_warp, data
    )
    row = _make_log_prob_batch(
        gp._spec, priors, wpm.default_warp_log_prior, n_warp, data,
        row_cfg=(_row_mesh(), 16, False),
    )
    rng = np.random.RandomState(0)
    D = gp._spec.n_theta + 2 * n_warp
    base = np.concatenate([gp._spec.theta0, np.zeros(2 * n_warp)])
    rows = jnp.asarray(base[None, :] + 0.15 * rng.randn(8, D))
    np.testing.assert_allclose(
        np.asarray(row(rows)), np.asarray(plain(rows)),
        rtol=1e-9, atol=1e-9,
    )


def test_warped_row_fit_predict_matches_dense():
    """End-to-end warped fit in row mode: identical chain + consensus
    state as the dense warped model (same seeds), predict/sample_y
    parity at 1e-8, prediction gradients chain-ruled through the warp
    Jacobian parity vs the dense autodiff grads."""
    X, y = _problem(n=48)
    kw = dict(n_desired_samples=24, n_burnin=2, n_walkers_per_thread=8,
              progress=False)

    gp_row = BayesGPR(
        kernel=_kernel(), random_state=7, warp_inputs=True,
        row_mesh=_row_mesh(), row_nb=16,
    )
    gp_row.fit(X, y, **kw)
    gp_dense = BayesGPR(
        kernel=_kernel(), random_state=7, warp_inputs=True,
    )
    gp_dense.fit(X, y, **kw)

    # same seeds + bit-parity contract: identical chains & warp params
    np.testing.assert_allclose(
        gp_row.chain_, gp_dense.chain_, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        gp_row.warp_alphas_, gp_dense.warp_alphas_, rtol=1e-12
    )
    assert np.isfinite(gp_row.log_marginal_likelihood_value_)
    np.testing.assert_allclose(
        gp_row.log_marginal_likelihood_value_,
        gp_dense.log_marginal_likelihood_value_,
        rtol=1e-8,
    )

    Xq = X[:6]
    m_r, s_r, mg_r, sg_r = gp_row.predict(
        Xq, return_std=True, return_mean_grad=True, return_std_grad=True
    )
    m_d, s_d, mg_d, sg_d = gp_dense.predict(
        Xq, return_std=True, return_mean_grad=True, return_std_grad=True
    )
    np.testing.assert_allclose(m_r, m_d, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(s_r, s_d, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(mg_r, mg_d, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sg_r, sg_d, rtol=1e-5, atol=1e-7)

    # consensus joint draws: same key -> same draws as the dense path
    d_r = gp_row.sample_y(Xq, sample_mean=True, n_samples=3,
                          random_state=5)
    d_d = gp_dense.sample_y(Xq, sample_mean=True, n_samples=3,
                            random_state=5)
    np.testing.assert_allclose(d_r, d_d, rtol=1e-7, atol=1e-9)
    # marginalized draws run (per-row warp parameters inside the sweep)
    d_m = gp_row.sample_y(Xq, n_samples=2, random_state=5)
    assert d_m.shape == (6, 2) and np.isfinite(d_m).all()


def test_ml2_value_grad_matches_plain():
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=1, row_mesh=_row_mesh())
    gp._spec = gp._user_kernel + WhiteKernel(1.0, (1e-5, 1e5))
    gp._set_data(X, y, None)
    theta = jnp.asarray(gp._spec.theta0 + 0.2)
    vg_row = np.asarray(
        _row_lml_value_grad(
            theta, gp._data, kernel=gp._spec, row_cfg=gp._row_cfg()
        )
    )
    vg_plain = np.asarray(
        _lml_value_grad(theta, gp._data, kernel=gp._spec)
    )
    np.testing.assert_allclose(vg_row, vg_plain, rtol=1e-8, atol=1e-9)


def test_fit_predict_end_to_end_row_mode():
    """Full fit in row mode, then predict parity against a per-chip
    model forced to the SAME consensus theta."""
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y)
    assert gp._post is None  # no (n, n) factor was ever stored
    assert np.isfinite(gp.theta).all()
    assert np.isfinite(gp.log_marginal_likelihood_value_)
    assert gp.chain_.shape[1] == gp._spec.n_theta

    ref = BayesGPR(kernel=_kernel(), random_state=7)
    ref._spec = gp._spec
    ref._set_data(X, y, None)
    ref.theta = gp.theta

    Xq = np.random.RandomState(5).uniform(size=(9, X.shape[1]))
    m_row, s_row = gp.predict(Xq, return_std=True)
    m_ref, s_ref = ref.predict(Xq, return_std=True)
    np.testing.assert_allclose(m_row, m_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(s_row, s_ref, rtol=1e-7, atol=1e-9)

    m_row, c_row = gp.predict(Xq, return_cov=True)
    m_ref, c_ref = ref.predict(Xq, return_cov=True)
    np.testing.assert_allclose(c_row, c_ref, rtol=1e-6, atol=1e-8)

    # noise-free prediction context
    with gp.noise_set_to_zero():
        s_nf = gp.predict(Xq, return_std=True)[1]
    with ref.noise_set_to_zero():
        s_nf_ref = ref.predict(Xq, return_std=True)[1]
    np.testing.assert_allclose(s_nf, s_nf_ref, rtol=1e-7, atol=1e-9)

    # consensus LML equals the per-chip one at the same theta
    np.testing.assert_allclose(
        gp.log_marginal_likelihood(gp.theta),
        ref.log_marginal_likelihood(gp.theta),
        rtol=1e-9,
    )


def test_fit_2d_mesh_rounds_walkers_and_runs():
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_wr_mesh())
    _fit(gp, X, y, n_walkers_per_thread=6)
    # halves must shard over the 2-wide walker axis: 6 -> 8
    assert gp.chain_steps_.shape[1] % 4 == 0
    assert np.isfinite(gp.theta).all()


def test_sample_y_row_mode():
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y)
    Xq = np.random.RandomState(2).uniform(size=(7, X.shape[1]))
    mean_draws = gp.sample_y(Xq, sample_mean=True, n_samples=5)
    assert mean_draws.shape == (7, 5)
    assert np.isfinite(mean_draws).all()
    marg = gp.sample_y(Xq, n_samples=3, random_state=11)
    assert marg.shape == (7, 3)
    assert np.isfinite(marg).all()
    # draws concentrate near the predictive mean at modest noise
    m = gp.predict(Xq)
    assert np.abs(mean_draws.mean(axis=1) - m).max() < 2.0


def test_row_mode_normalize_y():
    X, y = _problem()
    y = y * 37.0 + 250.0
    gp = BayesGPR(
        kernel=_kernel(), random_state=7, row_mesh=_row_mesh(),
        normalize_y=True,
    )
    _fit(gp, X, y)
    ref = BayesGPR(kernel=_kernel(), random_state=7, normalize_y=True)
    ref._spec = gp._spec
    ref._set_data(X, y, None)
    ref.theta = gp.theta
    Xq = np.random.RandomState(5).uniform(size=(6, X.shape[1]))
    np.testing.assert_allclose(
        gp.predict(Xq, return_std=True)[0],
        ref.predict(Xq, return_std=True)[0],
        rtol=1e-8,
    )


def test_row_mode_guards():
    mesh = _row_mesh()
    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    with pytest.raises(ValueError, match="one .* or two"):
        BayesGPR(kernel=_kernel(), row_mesh=Mesh(devs, ("a", "b", "c")))
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=mesh)
    _fit(gp, X, y)
    with pytest.raises(ValueError, match="mutually exclusive"):
        gp.sample(mesh=mesh, n_desired_samples=4)
    with pytest.raises(ValueError, match="return_cov"):
        gp.predict(X[:3], return_cov=True, return_mean_grad=True)


def test_row_mode_predict_gradients_match_plain():
    """Row-mode mean/std gradients (extra sweep columns) == the per-chip
    autodiff gradients at the same consensus theta."""
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y)
    ref = BayesGPR(kernel=_kernel(), random_state=7)
    ref._spec = gp._spec
    ref._set_data(X, y, None)
    ref.theta = gp.theta

    Xq = np.random.RandomState(9).uniform(size=(6, X.shape[1]))
    m_r, s_r, mg_r, sg_r = gp.predict(
        Xq, return_std=True, return_mean_grad=True, return_std_grad=True
    )
    m_p, s_p, mg_p, sg_p = ref.predict(
        Xq, return_std=True, return_mean_grad=True, return_std_grad=True
    )
    np.testing.assert_allclose(m_r, m_p, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(s_r, s_p, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(mg_r, mg_p, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sg_r, sg_p, rtol=1e-5, atol=1e-7)

    # grads also come through the noise-free context (theta_diag path)
    with gp.noise_set_to_zero():
        out_nf = gp.predict(Xq, return_std=True, return_std_grad=True)
    with ref.noise_set_to_zero():
        ref_nf = ref.predict(Xq, return_std=True, return_std_grad=True)
    np.testing.assert_allclose(out_nf[2], ref_nf[2], rtol=1e-5, atol=1e-7)

    # mean-grad only: result shape contract matches the per-chip path
    out = gp.predict(Xq, return_mean_grad=True)
    assert isinstance(out, tuple) and len(out) == 2
    np.testing.assert_allclose(out[1], mg_r, rtol=1e-12)


def test_optimizer_rejects_row_mesh():
    from bask_tpu.optimizer import Optimizer

    with pytest.raises(ValueError, match="row_mesh"):
        Optimizer(
            [(0.0, 1.0)], gp_kwargs={"row_mesh": _row_mesh()},
            n_initial_points=2,
        )


def test_row_mode_pickle_detaches_mesh():
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y)
    blob = pickle.dumps(gp)
    loaded = pickle.loads(blob)
    assert loaded.row_mesh is None
    np.testing.assert_allclose(loaded.theta, gp.theta)
    # reattach the (process-local) mesh: predictions work again
    loaded.row_mesh = _row_mesh()
    Xq = X[:4]
    np.testing.assert_allclose(
        loaded.predict(Xq), gp.predict(Xq), rtol=1e-10
    )


def test_row_mode_lbfgs_device_matches_host_driver():
    """optimizer='lbfgs-device' in row mode runs the whole ML-II warm
    start as one device program whose gradients come from the adjoint of
    the distributed sweep (custom VJP) — optimum quality must match the
    host L-BFGS-B driver on the same row-sharded objective."""
    from bask_tpu.models.bayesgpr import _row_lml_value

    X, y = _problem()
    gp = BayesGPR(
        kernel=_kernel(), random_state=7, row_mesh=_row_mesh(),
        optimizer="lbfgs-device",
    )
    gp._spec = gp._user_kernel + WhiteKernel(1.0, (1e-5, 1e5))
    gp._set_data(X, y, None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        theta_dev = gp._ml2_optimize()
    assert not any("lbfgs-device" in str(x.message) for x in w)

    host = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    host._spec = gp._spec
    host._set_data(X, y, None)
    theta_host = host._ml2_optimize()

    def neg_lml(g, t):
        return -float(
            _row_lml_value(
                jnp.asarray(t), g._data, kernel=g._spec,
                row_cfg=g._row_cfg(),
            )
        )

    obj_dev = neg_lml(gp, theta_dev)
    obj_host = neg_lml(host, theta_host)
    assert obj_dev <= obj_host + 1e-6 * abs(obj_host) + 1e-6
    b = gp._spec.bounds
    assert (theta_dev >= b[:, 0] - 1e-12).all()
    assert (theta_dev <= b[:, 1] + 1e-12).all()


def test_row_grad_method_knob():
    """ADVICE r3 #1: the huge-n memory/speed trade is a constructor
    knob — row_grad_method='jvp' routes the host ML-II gradients through
    the lean forward-mode sweeps and matches the adjoint default."""
    from bask_tpu.models.bayesgpr import _row_lml_value_grad

    X, y = _problem()
    gp = BayesGPR(
        kernel=_kernel(), random_state=7, row_mesh=_row_mesh(),
        row_grad_method="jvp",
    )
    gp._spec = gp._user_kernel + WhiteKernel(1.0, (1e-5, 1e5))
    gp._set_data(X, y, None)
    theta = jnp.asarray(gp._spec.theta0, dtype=gp._dtype())
    vg_jvp = np.asarray(
        _row_lml_value_grad(
            theta, gp._data, kernel=gp._spec, row_cfg=gp._row_cfg(),
            grad_method="jvp",
        )
    )
    vg_adj = np.asarray(
        _row_lml_value_grad(
            theta, gp._data, kernel=gp._spec, row_cfg=gp._row_cfg(),
            grad_method="adjoint",
        )
    )
    np.testing.assert_allclose(vg_jvp, vg_adj, rtol=1e-6, atol=1e-8)
    # end-to-end: a jvp-gradient fit produces a usable model
    theta_ml = gp._ml2_optimize()
    assert np.isfinite(theta_ml).all()

    with pytest.raises(ValueError, match="row_grad_method"):
        BayesGPR(kernel=_kernel(), row_grad_method="bogus")


def test_row_mode_progress_and_add():
    """The chunked (progress) and add-chains legacy paths run row-sharded."""
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y, progress=True)
    w0 = gp.chain_steps_.shape[1]
    n0 = len(gp.chain_)
    gp.sample(
        n_desired_samples=16, n_burnin=0, n_walkers_per_thread=w0,
        n_threads=1, add=True,
    )
    assert len(gp.chain_) > n0


def test_row_mode_noise_free_theta_diag_consistency():
    """noise=True vs noise=False sample_y variance ordering."""
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y)
    Xq = np.random.RandomState(8).uniform(size=(5, X.shape[1]))
    key_draws = gp.sample_y(
        Xq, sample_mean=True, noise=True, n_samples=400, random_state=3
    )
    nf_draws = gp.sample_y(
        Xq, sample_mean=True, noise=False, n_samples=400, random_state=3
    )
    assert key_draws.var(axis=1).mean() >= nf_draws.var(axis=1).mean()


def test_unfitted_row_mode_prior_predict():
    gp = BayesGPR(kernel=_kernel(), row_mesh=_row_mesh())
    Xq = np.random.RandomState(0).uniform(size=(4, 2))
    m, s = gp.predict(Xq, return_std=True)
    np.testing.assert_allclose(m, 0.0)
    assert (s > 0).all()


def test_row_mode_consensus_state_is_lml_consistent():
    """theta setter refreshes the consensus LML via the sweep."""
    X, y = _problem()
    gp = BayesGPR(kernel=_kernel(), random_state=7, row_mesh=_row_mesh())
    _fit(gp, X, y)
    t = gp.theta
    gp.theta = t  # re-trigger the refresh
    np.testing.assert_allclose(
        float(gp._consensus_lml_), gp.log_marginal_likelihood(t), rtol=1e-12
    )
    data = gp._data
    oracle = gpc.log_marginal_likelihood(
        gp._spec, jnp.asarray(t, dtype=data.X.dtype), data
    )
    np.testing.assert_allclose(
        float(gp._consensus_lml_), float(oracle), rtol=1e-9
    )
