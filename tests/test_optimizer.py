"""Optimizer ask/tell behavior, mirroring the reference test contract
(reference tests/test_optimizer.py). Golden statistical values there
depend on the NumPy/emcee RNG stream, so the diagnostics are asserted in
tight behavioral bands instead of to 2 decimals."""

import warnings

import numpy as np
import pytest

from bask_tpu.optimizer import Optimizer


def bench1(x):
    """x[0]^2 benchmark (same objective family the reference tests use)."""
    return float(x[0] ** 2)


def test_multiple_asks_are_noop():
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=1, init_strategy="random"
    )
    opt.run(bench1, n_iter=3, gp_burnin=0, n_samples=1)
    assert len(opt.Xi) == 3
    opt.ask()
    assert len(opt.Xi) == 3
    assert opt.ask() == opt.ask()


@pytest.mark.parametrize("init_strategy", ("r2", "sb", "random"))
def test_initial_points(init_strategy):
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)],
        n_initial_points=3,
        init_strategy=init_strategy,
    )
    x = opt.ask()
    assert not isinstance(x[0], list)
    opt.tell([x], [0.0])
    assert opt._n_initial_points == opt.n_initial_points_ - 1

    opt.tell([x], [0.0])
    assert opt._n_initial_points == opt.n_initial_points_ - 2
    assert opt.gp.chain_ is None

    opt.tell([[0.1], [0.2], [0.3]], [0.0, 0.1, 0.2], replace=True)
    assert opt._n_initial_points == opt.n_initial_points_ - 3
    assert opt.gp.chain_ is not None


def test_noise_vector():
    opt = Optimizer(dimensions=[(-2.0, 2.0)], n_initial_points=5)
    opt.tell(
        [[-2.0], [-1.0], [0.0], [1.0], [2.0]],
        [0.0, -1.0, 0.0, -1.0, 0.0],
        noise_vector=[1.0, 1.0, 1.0, 0.0, 1.0],
    )
    # The noise-free optimum at x=1 must pull the mean lower than the
    # noisy one at x=-1
    y_noisy, y = opt.gp.predict([[-1.0], [1.0]])
    assert y_noisy > y

    x = opt.ask()
    opt.tell(x, 0.0, noise_vector=0.5)


def test_run_with_noise_tuple_objective():
    rs = np.random.RandomState(123)

    def func(x):
        return (np.sin(x[0]) + rs.randn()).item(), 1.0

    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=1, init_strategy="random"
    )
    opt.run(func, n_iter=2, n_samples=1, gp_burnin=0)
    # noise vector of 1.0 per point lands on the GP's alpha diagonal
    n = len(opt.yi)
    np.testing.assert_almost_equal(
        np.asarray(opt.gp._data.alpha_diag)[:n], np.ones(n) + 1e-10
    )


def test_no_error_on_unknown_kwargs():
    Optimizer(dimensions=[(-2.0, 2.0)], n_initial_points=5, unknown_argument=42)


def test_last_timings_observability():
    """Every fitting tell records wall-clock of the MCMC refit and the
    acquisition pass plus the chain acceptance rate (bask-tpu
    observability; the reference exposes nothing, SURVEY.md §5)."""
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=1, init_strategy="random"
    )
    assert not hasattr(opt, "last_timings_")
    opt.run(bench1, n_iter=2, gp_burnin=2, gp_samples=20, n_samples=1)
    t = opt.last_timings_
    assert t["gp_fit_s"] > 0.0 and t["acquisition_s"] > 0.0
    assert 0.0 < t["mcmc_acceptance"] <= 1.0


def test_tell_returns_optimize_result():
    """tell() returns a scipy OptimizeResult carrying the incumbent,
    history, space, and the GP model (create_result contract)."""
    opt = Optimizer(dimensions=[(-2.0, 2.0)], n_initial_points=2)
    res = opt.tell([[-1.0], [1.5]], [3.0, -2.0])
    assert res.x == [1.5] and res.fun == -2.0
    assert res.x_iters == [[-1.0], [1.5]]
    assert list(res.func_vals) == [3.0, -2.0]
    assert res.models == [opt.gp]
    assert res.space is opt.space


def test_error_on_invalid_priors():
    opt = Optimizer(dimensions=[(-2.0, 2.0)], gp_priors=[], n_initial_points=0)
    with pytest.raises(ValueError):
        opt.tell([(0.0,)], 0.0)


@pytest.fixture(scope="module")
def fitted_opt():
    # Reference-comparable sampler configuration: the diagnostics tests
    # below pin the MC ESTIMATOR formulas against the reference's
    # published values, which its emcee-default stretch sampler
    # produced. The library default (demix + converged cold fit) finds
    # the secondary tiny-noise posterior mode the stretch move never
    # visits, legitimately widening the hyperposterior — so isolate the
    # estimator parity from the sampler change here;
    # test_diagnostics_under_default_sampler covers the honest default.
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=0, random_state=123,
        gp_sample_kwargs={"moves": "stretch", "until_rhat": None},
    )
    opt.tell(
        [[-2.0], [-1.0], [0.0], [1.0], [2.0]],
        [2.0, 0.0, -2.0, 0.0, 2.0],
        gp_burnin=10,
    )
    return opt


@pytest.mark.parametrize(
    "kwargs,golden,reference",
    [
        # golden: measured on this implementation under fixed seeds
        # (deterministic: seeded MCMC + seeded MC draws); pinned at
        # 2 decimals like the reference's own golden tests.
        # reference: the value the reference pins under ITS RNG stream
        # (tests/test_optimizer.py:85-110) — asserted as a proximity
        # band, since RNG streams legitimately differ.
        (dict(normalized_scores=False, threshold=1.0), 0.9650, 0.99),
        (dict(normalized_scores=True, threshold=1.0), 0.9900, 0.99),
    ],
)
def test_probability_of_optimality(fitted_opt, kwargs, golden, reference):
    prob = fitted_opt.probability_of_optimality(
        threshold=kwargs["threshold"],
        n_random_starts=100,
        random_state=1,
        normalized_scores=kwargs["normalized_scores"],
    )
    np.testing.assert_almost_equal(prob, golden, decimal=2)
    assert abs(prob - reference) <= 0.07


def test_probability_of_optimality_tuple_threshold(fitted_opt):
    probs = fitted_opt.probability_of_optimality(
        threshold=(0.9, 0.5),
        n_random_starts=100,
        random_state=1,
        normalized_scores=False,
    )
    np.testing.assert_almost_equal(probs, [0.9500, 0.8000], decimal=2)
    # reference pins (0.98, 0.86) under its RNG
    assert abs(probs[0] - 0.98) <= 0.07 and abs(probs[1] - 0.86) <= 0.07


def test_probability_of_optimality_thresholds_monotone(fitted_opt):
    probs = fitted_opt.probability_of_optimality(
        threshold=[2.0, 1.0, 0.25, 0.05],
        n_random_starts=20,
        random_state=2,
    )
    assert len(probs) == 4
    assert all(
        probs[i] >= probs[i + 1] - 1e-9 for i in range(3)
    ), f"not monotone: {probs}"
    assert probs[0] > 0.95


@pytest.mark.slow
@pytest.mark.parametrize(
    "kwargs,golden,reference",
    [
        # golden: this implementation under fixed seeds (2-decimal pin);
        # reference: tests/test_optimizer.py:113-140 values (proximity)
        (dict(normalized_scores=False, use_mean_gp=True), 0.3101, 0.30),
        (dict(normalized_scores=True, use_mean_gp=True), 0.2550, 0.25),
        (dict(normalized_scores=True, use_mean_gp=False), 0.3217, 0.29),
    ],
)
def test_expected_optimality_gap(fitted_opt, kwargs, golden, reference):
    gap = fitted_opt.expected_optimality_gap(
        random_state=1,
        n_probabilities=10,
        n_space_samples=100,
        n_gp_samples=100,
        n_random_starts=10,
        tol=0.1,
        **kwargs,
    )
    np.testing.assert_almost_equal(gap, golden, decimal=2)
    assert abs(gap - reference) <= 0.07


def test_diagnostics_under_default_sampler():
    """The honest default (demix + converged cold fit) widens the
    hyperposterior vs the reference's under-mixed stretch chain (it
    visits the tiny-noise mode); the diagnostics must stay valid and
    coherent there, even though the reference-pinned values above are
    produced under the reference-comparable sampler."""
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=0, random_state=123,
        gp_sample_kwargs={"max_extensions": 2, "extension_steps": 50},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        opt.tell(
            [[-2.0], [-1.0], [0.0], [1.0], [2.0]],
            [2.0, 0.0, -2.0, 0.0, 2.0],
            gp_burnin=10,
        )
    prob = opt.probability_of_optimality(
        threshold=1.0, n_random_starts=100, random_state=1
    )
    assert 0.5 <= prob <= 1.0
    probs = opt.probability_of_optimality(
        threshold=(2.0, 0.05), n_random_starts=50, random_state=1
    )
    assert probs[0] >= probs[1] - 1e-9


def test_optimum_intervals():
    opt = Optimizer(
        dimensions=[(0.0, 1.0)], random_state=0, acq_func="mean", n_points=100
    )
    x = np.linspace(0, 1, num=20)[:, None]
    y = np.cos(np.pi * 4 * x).flatten() + opt.rng.randn(20) * 0.1
    opt.tell(x.tolist(), y.tolist(), gp_burnin=20, progress=False, n_samples=1)

    intervals = opt.optimum_intervals(random_state=0, space_samples=100)
    assert len(intervals) == 1
    assert len(intervals[0]) >= 2
    assert len(intervals[0][0]) == 2
    intervals = opt.optimum_intervals(
        random_state=0, space_samples=100, multimodal=False
    )
    assert len(intervals) == 1
    assert len(intervals[0]) == 2
