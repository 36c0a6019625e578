"""On-device lift of frozen scipy.stats priors.

Reference users pass scipy log-densities as priors
(``/root/reference/bask/bayesgpr.py:368-372``). When the prior IS a
frozen distribution's ``logpdf`` bound method, bask-tpu rebuilds the
exact density in jnp instead of routing it through a host callback —
the chain then lowers to pure XLA and works on callback-rejecting
backends (the axon TPU tunnel). This file pins the lift's numerical
parity with scipy, its wiring into ``_traceable_or_host`` (identity
stability, no warning, callback-free lowering), chain bit-parity with
a hand-written jnp formulation, and the fallback for unsupported
callables.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from bask_tpu import BayesGPR
from bask_tpu.models.bayesgpr import _HOST_PRIOR_CACHE
from bask_tpu.ops.kernels import ConstantKernel, Matern
from bask_tpu.utils.scipy_lift import lift_scipy_prior

# family → (frozen dist, probe grid incl. out-of-support points)
_CASES = {
    "norm": (sps.norm(-1.2, 0.7), np.linspace(-6, 4, 41)),
    "halfnorm": (sps.halfnorm(scale=2.0), np.linspace(-1, 8, 41)),
    "halfnorm_loc": (sps.halfnorm(loc=0.5, scale=1.5), np.linspace(-1, 8, 41)),
    "uniform": (sps.uniform(-0.5, 2.0), np.linspace(-1, 2, 31)),
    "expon": (sps.expon(scale=0.8), np.linspace(-1, 6, 41)),
    "gamma": (sps.gamma(2.3, scale=1.4), np.linspace(-1, 9, 41)),
    "invgamma": (sps.invgamma(3.1, scale=0.9), np.linspace(-1, 9, 41)),
    "lognorm": (sps.lognorm(0.6, scale=1.2), np.linspace(-1, 9, 41)),
    "beta": (sps.beta(2.0, 3.5), np.linspace(-0.2, 1.2, 31)),
    "cauchy": (sps.cauchy(0.3, 1.7), np.linspace(-8, 8, 41)),
    "laplace": (sps.laplace(-0.4, 1.1), np.linspace(-6, 6, 41)),
    "logistic": (sps.logistic(0.2, 0.9), np.linspace(-8, 8, 41)),
    "t": (sps.t(4.5, loc=0.1, scale=1.3), np.linspace(-8, 8, 41)),
    "chi2": (sps.chi2(3.0, scale=1.2), np.linspace(-1, 12, 41)),
    "rayleigh": (sps.rayleigh(scale=1.4), np.linspace(-1, 8, 41)),
    "gumbel_r": (sps.gumbel_r(0.2, 1.1), np.linspace(-6, 9, 41)),
    "weibull_min": (
        sps.weibull_min(1.8, scale=0.9), np.linspace(-1, 6, 41)
    ),
    "pareto": (sps.pareto(2.6, scale=1.3), np.linspace(0.5, 9, 41)),
}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_lift_matches_scipy_logpdf(case):
    dist, grid = _CASES[case]
    lifted = lift_scipy_prior(dist.logpdf)
    assert lifted is not None, f"{case} should lift"
    got = np.asarray(jax.jit(jax.vmap(lifted))(jnp.asarray(grid)))
    want = dist.logpdf(grid)
    both_inf = np.isneginf(got) & np.isneginf(want)
    np.testing.assert_allclose(
        got[~both_inf], want[~both_inf], rtol=1e-10, atol=1e-12
    )
    assert (np.isneginf(got) == np.isneginf(want)).all()


def test_lift_pdf_variant():
    dist = sps.gamma(1.7, scale=0.6)
    lifted = lift_scipy_prior(dist.pdf)
    grid = np.linspace(0.01, 5, 20)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lifted)(jnp.asarray(grid))),
        dist.pdf(grid),
        rtol=1e-10,
    )


def test_lift_unfrozen_default_args():
    lifted = lift_scipy_prior(sps.norm.logpdf)
    assert lifted is not None
    grid = np.linspace(-3, 3, 11)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lifted)(jnp.asarray(grid))),
        sps.norm.logpdf(grid),
        rtol=1e-12,
    )


def test_lift_unfrozen_pdf_variant():
    # regression: the probe must compare log-densities even when the
    # user passed an UNFROZEN .pdf (ref = owner.logpdf unconditionally)
    lifted = lift_scipy_prior(sps.norm.pdf)
    assert lifted is not None
    grid = np.linspace(-3, 3, 11)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lifted)(jnp.asarray(grid))),
        sps.norm.pdf(grid),
        rtol=1e-12,
    )


def test_tabulate_prior_rejects_infinite_bounds():
    from bask_tpu.utils.scipy_lift import tabulate_prior

    with pytest.raises(ValueError, match="finite"):
        tabulate_prior(lambda x: -x * x, -np.inf, 3.0)
    with pytest.raises(ValueError, match="finite"):
        tabulate_prior(lambda x: -x * x, -3.0, np.nan)


def test_lift_rejects_unsupported():
    assert lift_scipy_prior(sps.vonmises(1.0).logpdf) is None
    assert lift_scipy_prior(lambda x: sps.norm.logpdf(x)) is None
    assert lift_scipy_prior(sps.norm(0, 1).cdf) is None
    # array-valued params cannot be an elementwise scalar prior
    assert lift_scipy_prior(sps.norm(np.zeros(3), 1.0).logpdf) is None


def test_lift_lowering_is_callback_free():
    lifted = lift_scipy_prior(sps.halfnorm(scale=2.0).logpdf)
    text = jax.jit(lifted).lower(jnp.float64(0.3)).as_text()
    assert "callback" not in text.lower()


def _gp(kernel=None):
    kernel = kernel or ConstantKernel(1.0, (0.1, 10.0)) * Matern(
        1.0, (0.05, 5.0), nu=2.5
    )
    return BayesGPR(kernel=kernel, random_state=7)


def test_traceable_or_host_lifts_without_warning():
    gp = _gp()
    dist = sps.norm(-1.0, 0.7)
    p = dist.logpdf
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        lifted = gp._traceable_or_host(p)
    assert hasattr(lifted, "__wrapped_scipy__")
    # identity-stable across calls (jit static key): re-passing the
    # same callable AND a fresh bound method of the same frozen dist
    # (dist.logpdf creates a new-but-equal method per access) must
    # return the SAME wrapper object, or the chain recompiles per tell
    assert gp._traceable_or_host(p) is lifted
    assert gp._traceable_or_host(dist.logpdf) is lifted
    assert p in _HOST_PRIOR_CACHE[False]


def test_traceable_or_host_falls_back_with_warning():
    gp = _gp()
    with pytest.warns(UserWarning, match="host callback"):
        wrapped = gp._traceable_or_host(sps.vonmises(1.0).logpdf)
    assert not hasattr(wrapped, "__wrapped_scipy__")


def test_tabulate_prior_accuracy_and_extrapolation():
    from scipy.stats import halfnorm

    from bask_tpu.utils.scipy_lift import tabulate_prior

    def p(x):  # the reference tutorials' variance-prior lambda shape
        return (
            halfnorm(scale=2.0).logpdf(np.sqrt(np.exp(x)))
            + x / 2.0
            - np.log(2.0)
        )

    interp, max_err = tabulate_prior(p, -8.0, 8.0)
    # worst case sits at the right edge where curvature is e^x/8 (a
    # log-density of ~-370, rejected regardless); the bound is loose
    assert max_err < 1e-3
    grid = np.linspace(-7.5, 4.0, 301)  # the region that matters
    got = np.asarray(jax.jit(jax.vmap(interp))(jnp.asarray(grid)))
    np.testing.assert_allclose(got, p(grid), atol=1e-5, rtol=1e-6)
    # beyond the table: finite linear extrapolation, falling in the
    # direction the density falls
    far = np.asarray(jax.vmap(interp)(jnp.asarray([-12.0, 12.0])))
    assert np.isfinite(far).all()
    assert far[1] < got[-1]  # density keeps decreasing to the right
    # callback-free lowering
    text = jax.jit(interp).lower(jnp.float64(0.1)).as_text()
    assert "callback" not in text.lower()


def test_tabulate_prior_floors_neg_inf():
    from bask_tpu.utils.scipy_lift import tabulate_prior

    def p(x):
        return np.log(np.maximum(0.0, np.where(np.abs(x) < 1, 1.0, 0.0)))

    with np.errstate(divide="ignore"):
        interp, _ = tabulate_prior(p, -3.0, 3.0, n_knots=601)
    vals = np.asarray(jax.vmap(interp)(jnp.asarray([-2.0, 0.0, 2.0])))
    assert np.isfinite(vals).all()
    assert vals[1] == 0.0  # exact on the flat region
    assert vals[0] < -1e10 and vals[2] < -1e10  # rejected in practice


def test_interp_mode_end_to_end():
    """host_prior_mode='interp' runs an opaque lambda prior fully on
    device: the resolved prior is the tabulated interpolant (identity-
    stable, callback-free) and the fit produces a healthy chain close
    to the exact-prior one at the log-prob level."""
    from scipy.stats import halfnorm

    def variance_prior(x):
        return (
            halfnorm(scale=2.0).logpdf(np.sqrt(np.exp(x)))
            + x / 2.0
            - np.log(2.0)
        )

    gp = BayesGPR(
        kernel=ConstantKernel(1.0, (0.1, 10.0))
        * Matern(1.0, (0.05, 5.0), nu=2.5),
        random_state=11,
        host_prior_mode="interp",
    )
    rng = np.random.RandomState(2)
    X = rng.uniform(size=(12, 1))
    y = np.sin(4.0 * X[:, 0]) + 0.1 * rng.randn(12)
    priors = [variance_prior] * 3
    with pytest.warns(UserWarning, match="interp"):
        gp.fit(
            X, y, priors=priors,
            n_burnin=3, n_desired_samples=40,
            n_walkers_per_thread=10, progress=False,
        )
    assert np.isfinite(gp.chain_).all()
    # the resolved wrapper is the tabulated interpolant, stable across
    # resolutions (jit static key)
    w1 = gp._traceable_or_host(variance_prior, dim=0)
    w2 = gp._traceable_or_host(variance_prior, dim=0)
    assert hasattr(w1, "__tabulated__") and w1 is w2
    # log-prob parity with the exact prior at 1e-5 over the table range
    grid = np.linspace(-4.0, 2.0, 101)
    got = np.asarray(jax.vmap(w1)(jnp.asarray(grid)))
    np.testing.assert_allclose(got, variance_prior(grid), atol=2e-5)


def test_invalid_host_prior_mode_raises():
    with pytest.raises(ValueError, match="host_prior_mode"):
        BayesGPR(host_prior_mode="magic")


def test_chain_bit_identical_to_jnp_formulation():
    """Frozen scipy priors produce the same chain as hand-written jnp
    priors implementing the same formula — the lift is exact."""
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(10, 1))
    y = np.sin(4.0 * X[:, 0]) + 0.1 * rng.randn(10)

    loc, scale = -1.0, 0.7
    const = 0.5 * np.log(2.0 * np.pi)

    def jnp_norm(x):
        z = (x - loc) / scale
        return -0.5 * z * z - const - np.log(scale)

    chains = []
    for priors in (
        [sps.norm(loc, scale).logpdf] * 3,
        [jnp_norm] * 3,
    ):
        gp = _gp()
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the lift must not warn
            # ...but the round-5 convergence-honest default guard
            # (warn_rhat=1.1) legitimately fires on this deliberately
            # short 4-kept-step chain — unrelated to the lift
            warnings.filterwarnings(
                "ignore", message=".*may not be converged.*"
            )
            gp.fit(
                X,
                y,
                priors=priors,
                n_burnin=3,
                n_desired_samples=40,
                n_walkers_per_thread=10,
                progress=False,
            )
        chains.append(np.asarray(gp.chain_))
    np.testing.assert_array_equal(chains[0], chains[1])
