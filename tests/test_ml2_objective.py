"""MAP warm-start objective (round 5).

``BayesGPR(ml2_objective="map")`` optimizes LML + guessed priors for
the chain seed instead of the reference's bare LML
(``bask/bayesgpr.py:78-79``). Measured motivation (BASELINE round 5):
the bare-LML optimum RAILS against kernel bounds on every measured
shape — the round-flat priors plunge there (log-posterior −1e9-class)
— and a short chain seeded at the rail left the n=32768 f32 row fit's
consensus in a non-PD region (−inf LML).
"""

import numpy as np
import pytest

from bask_tpu import BayesGPR
from bask_tpu.models import bayesgpr as bg
from bask_tpu.ops import kernels as bk


def _railing_problem(n=64, d=4, seed=42):
    """The ladder family: smooth objective, tight lengthscale bounds —
    bare-LML ML-II rails at log(2.0) here (measured)."""
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * d), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    y = np.sum((X - 0.5) ** 2, axis=1) + 0.2 * rng.randn(n)
    return kernel, X, y


def _warm_theta(objective, **kw):
    kernel, X, y = _railing_problem()
    gp = BayesGPR(
        kernel=kernel, normalize_y=True, random_state=0,
        ml2_objective=objective, **kw,
    )
    gp._spec = gp._user_kernel
    gp._priors_cache = None
    gp._set_data(X, y, None)
    return gp, gp._ml2_optimize()


def _log_post(gp, theta):
    import jax.numpy as jnp

    priors = gp._resolve_priors(None)
    vg = np.asarray(
        bg._log_post_value_grad(
            gp._data, jnp.asarray(theta, gp._dtype()),
            kernel=gp._spec, priors=priors, n_warp=0,
        )
    )
    return -float(vg[0])


def test_map_seed_sits_in_posterior_mass():
    gp_l, t_lml = _warm_theta("lml")
    gp_m, t_map = _warm_theta("map")
    lp_lml = _log_post(gp_l, t_lml)
    lp_map = _log_post(gp_m, t_map)
    # the bare-LML seed is deep in the prior wall; MAP is in the mass
    assert lp_map > lp_lml + 1e3, (lp_map, lp_lml)
    assert np.isfinite(lp_map)


def test_map_fit_end_to_end():
    kernel, X, y = _railing_problem()
    gp = BayesGPR(
        kernel=kernel, normalize_y=True, random_state=0,
        ml2_objective="map",
    )
    gp.fit(X, y, n_desired_samples=40, n_burnin=2, progress=False)
    mu, std = gp.predict(X[:5], return_std=True)
    assert np.isfinite(mu).all() and np.isfinite(std).all()
    assert np.isfinite(gp.log_marginal_likelihood_value_)


def test_map_with_subsample():
    kernel, X, y = _railing_problem(n=96)
    gp = BayesGPR(
        kernel=kernel, normalize_y=True, random_state=0,
        ml2_objective="map", ml2_subsample=48,
    )
    gp.fit(X, y, n_desired_samples=30, n_burnin=2, progress=False)
    assert np.isfinite(gp.predict(X[:3])).all()


def test_map_device_optimizer_falls_back_with_warning():
    kernel, X, y = _railing_problem()
    gp = BayesGPR(
        kernel=kernel, normalize_y=True, random_state=0,
        ml2_objective="map", optimizer="lbfgs-device",
    )
    with pytest.warns(UserWarning, match="lbfgs-device"):
        gp.fit(X, y, n_desired_samples=20, n_burnin=1, progress=False)


def test_invalid_objective_raises():
    with pytest.raises(ValueError, match="ml2_objective"):
        BayesGPR(ml2_objective="mle")


def test_objective_checkpoint_roundtrip(tmp_path):
    from bask_tpu.utils.serialization import load_gpr, save_gpr

    kernel, X, y = _railing_problem()
    gp = BayesGPR(kernel=kernel, random_state=0, ml2_objective="map")
    gp.fit(X, y, n_desired_samples=20, n_burnin=1, progress=False)
    p = tmp_path / "gp.npz"
    save_gpr(gp, p)
    assert load_gpr(p).ml2_objective == "map"
