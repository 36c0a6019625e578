"""Acquisition layer tests.

- PVRS/VR fused rank-1 path vs a naive per-candidate Cholesky oracle
  (the algorithm the reference implements with a Python loop,
  bask/acquisition.py:289-299)
- every acquisition surface on the reference's 4-point fixture with a
  REAL (seeded) MCMC chain, pinned at rtol=1e-5 with exact argmax against
  the NumPy/SciPy oracles from test_parity_golden (which also pins the
  same surfaces on a fixed deterministic chain). The reference's exact
  argmax indices (MES 37, EI 33, ...) depend on the emcee RNG stream; the
  smooth deterministic surfaces are additionally asserted to land near
  them.
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
            jnp.asarray(gp._theta),
            gp._post,
            gp._post_data,
            jnp.asarray(X_cand),
            jnp.asarray(P),
            kernel=gp._spec,
        )
    )
    naive = _naive_variance_explained(gp, X_cand, P)
    np.testing.assert_allclose(fused, naive, rtol=1e-6, atol=1e-8)


X_GRID = np.linspace(-2.0, 2.0, num=101)[:, None]
N_DRAWS = 10
SEED = 1


def _oracle_marginal(gp, oracle, seed=SEED, n_draws=N_DRAWS):
    """Replicate the dispatcher's row selection + marginalization with
    the scipy oracle prediction."""
    from test_parity_golden import np_predict

    rs = np.random.RandomState(seed)
    idx = rs.choice(len(gp.chain_), replace=False, size=n_draws)
    expected = np.zeros(len(X_GRID))
    for theta in gp.chain_[idx]:
        mu, std = np_predict(theta, X_GRID)
        expected += oracle(mu, std) / n_draws
    return expected


@pytest.mark.parametrize(
    "acq_cls, oracle_name, ref_argmax",
    [
        (acq.LCB, "oracle_lcb", 38),
        (acq.ExpectedImprovement, "oracle_ei", 33),
        (acq.Expectation, "oracle_mean", 30),
        (acq.TopTwoEI, "oracle_ttei", 32),
    ],
)
def test_acquisition_matches_oracle_on_real_chain(
    acq_cls, oracle_name, ref_argmax, fitted_gp
):
    import test_parity_golden as oracles

    values = acq.evaluate_acquisitions(
        X=X_GRID,
        gpr=fitted_gp,
        acquisition_functions=[acq_cls()],
        random_state=SEED,
        n_samples=N_DRAWS,
    )
    assert values.shape == (1, 101)
    expected = _oracle_marginal(fitted_gp, getattr(oracles, oracle_name))
    np.testing.assert_allclose(values[0], expected, rtol=1e-5, atol=1e-10)
    am = int(np.argmax(values))
    assert am == int(np.argmax(expected))
    # smooth surfaces land near the reference's RNG-dependent argmax.
    # Measured wobble (20 seeds on this fixture chain, round 5): at
    # n_draws=10 the argmax spans <=4 cells around the reference index
    # (e.g. EI in {32..36} vs ref 33); window 6 leaves margin for
    # platform RNG variation. test_acquisition_argmax_stabilizes pins
    # the tighter many-draw contract.
    assert abs(am - ref_argmax) <= 6, (
        f"{acq_cls.__name__}: argmax {am} vs reference {ref_argmax}"
    )


def test_acquisition_argmax_stabilizes(fitted_gp):
    """With enough hyperposterior draws the marginal argmax is seed-
    independent and lands within 5 cells of the reference's published
    indices (`/root/reference/tests/test_acquisition.py:42-54`).

    Measured (round 5, 20 seeds at n_draws=100): the argmax is
    IDENTICAL across seeds per acquisition — LCB 40 (ref 38), EI 34
    (ref 33), mean 27 (ref 30), TTEI 30 (ref 32) — so the residual
    offset is the chain-distribution difference (our RNG stream +
    DE/snooker default sampler vs emcee's stretch), not MC noise.
    """
    for acq_cls, ref in (
        (acq.LCB, 38),
        (acq.ExpectedImprovement, 33),
        (acq.Expectation, 30),
        (acq.TopTwoEI, 32),
    ):
        ams = set()
        for seed in (0, 7):
            values = acq.evaluate_acquisitions(
                X=X_GRID,
                gpr=fitted_gp,
                acquisition_functions=[acq_cls()],
                random_state=seed,
                n_samples=100,
            )
            ams.add(int(np.argmax(values)))
        assert len(ams) == 1, f"{acq_cls.__name__}: seed-dependent {ams}"
        am = ams.pop()
        assert abs(am - ref) <= 5, (
            f"{acq_cls.__name__}: stabilized argmax {am} vs ref {ref}"
        )


def test_mes_matches_oracle_on_real_chain(fitted_gp):
    import jax
    import jax.numpy as jnp

    from test_parity_golden import np_predict, oracle_mes

    values = acq.evaluate_acquisitions(
        X=X_GRID,
        gpr=fitted_gp,
        acquisition_functions=[acq.MaxValueSearch()],
        random_state=SEED,
        n_samples=N_DRAWS,
    )
    rs = np.random.RandomState(SEED)
    idx = rs.choice(len(fitted_gp.chain_), replace=False, size=N_DRAWS)
    _ = rs.randint(0, 2**31 - 1)  # the sample_y key (unused by MES)
    acq_keys = jax.random.split(
        jax.random.PRNGKey(rs.randint(0, 2**31 - 1)), N_DRAWS
    )
    expected = np.zeros(len(X_GRID))
    for theta, k in zip(fitted_gp.chain_[idx], acq_keys):
        mu, std = np_predict(theta, X_GRID)
        u = np.asarray(
            jax.random.uniform(
                k, (1000,), dtype=jnp.float64, minval=1e-12, maxval=1.0
            )
        )
        expected += oracle_mes(mu, std, u) / N_DRAWS
    np.testing.assert_allclose(values[0], expected, rtol=1e-5, atol=1e-10)
    assert int(np.argmax(values)) == int(np.argmax(expected))


@pytest.mark.parametrize("acq_cls", [acq.VarianceReduction, acq.PVRS])
def test_fullgp_acquisitions_match_oracle_on_real_chain(acq_cls, fitted_gp):
    from test_parity_golden import oracle_variance_explained

    values = acq.evaluate_acquisitions(
        X=X_GRID,
        gpr=fitted_gp,
        acquisition_functions=[acq_cls()],
        random_state=SEED,
        n_samples=0,
    )
    if acq_cls is acq.PVRS:
        rs = np.random.RandomState(SEED)
        ts = fitted_gp.sample_y(
            X_GRID, sample_mean=True, n_samples=10, random_state=rs
        )
        probes = X_GRID[np.argmin(ts, axis=0)]
    else:
        probes = X_GRID
    expected = oracle_variance_explained(
        np.asarray(fitted_gp.theta), X_GRID, probes
    )
    np.testing.assert_allclose(values[0], expected, rtol=1e-5)
    assert int(np.argmax(values)) == int(np.argmax(expected))


def test_thompson_sampling_bound_on_real_chain(fitted_gp):
    """5-sigma Monte-Carlo bound around the exact expectation -E[mu]
    (per-draw function realizations are the only irreducible RNG)."""
    from test_parity_golden import np_predict

    S = 64
    values = acq.evaluate_acquisitions(
        X=X_GRID,
        gpr=fitted_gp,
        acquisition_functions=[acq.ThompsonSampling()],
        random_state=SEED,
        n_samples=S,
    )[0]
    rs = np.random.RandomState(SEED)
    idx = rs.choice(len(fitted_gp.chain_), replace=False, size=S)
    mus, var_sum = np.zeros(len(X_GRID)), np.zeros(len(X_GRID))
    for theta in fitted_gp.chain_[idx]:
        mu, std = np_predict(theta, X_GRID)
        mus += mu / S
        var_sum += std**2
    tol = 5.0 * np.sqrt(var_sum) / S + 1e-12
    assert np.all(np.abs(values - (-mus)) < tol)


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
