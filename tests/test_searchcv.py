"""End-to-end sklearn integration: SVC on iris, mixed
real/int/categorical space (reference tests/test_searchcv.py pins
score > 0.89 for both return policies after 11 iterations)."""

import pytest
from sklearn.datasets import load_iris
from sklearn.model_selection import train_test_split
from sklearn.svm import SVC

from bask_tpu.searchcv import BayesSearchCV
from bask_tpu.space import Categorical, Integer, Real


@pytest.mark.slow
@pytest.mark.parametrize("return_policy", ["best_setting", "best_mean"])
def test_searchcv_run(return_policy):
    X, y = load_iris(return_X_y=True)
    X_train, X_test, y_train, y_test = train_test_split(
        X, y, train_size=0.75, random_state=0
    )

    opt = BayesSearchCV(
        SVC(),
        {
            "C": Real(1e-6, 1e6, prior="log-uniform"),
            "gamma": Real(1e-6, 1e1, prior="log-uniform"),
            "degree": Integer(1, 8),
            "kernel": Categorical(["linear", "poly", "rbf"]),
        },
        n_iter=11,
        cv=None,
        return_policy=return_policy,
        random_state=0,
    )
    opt.fit(X_train, y_train)
    assert opt.score(X_test, y_test) > 0.89
    assert hasattr(opt, "cv_results_")
    assert hasattr(opt, "best_params_")


def test_optimizer_kwargs_step_defaults():
    """n_samples/gp_samples/gp_burnin are *step* parameters extracted
    from optimizer_kwargs with defaults 0/100/5, and the acquisition
    defaults to PVRS (reference bask/searchcv.py:286-290)."""
    from bask_tpu.acquisition import PVRS

    searcher = BayesSearchCV(
        SVC(), {"C": Real(1e-3, 1e3, prior="log-uniform")}, n_iter=1
    )

    captured = {}

    def fake_evaluate(params_list):
        captured["params"] = params_list
        return {"mean_test_score": [0.5] * 1}

    # drive _run_search directly with a stub evaluator (no CV fits)
    searcher._run_search(fake_evaluate)
    assert (searcher.n_samples_, searcher.gp_samples_, searcher.gp_burnin_) \
        == (0, 100, 5)
    space, optimizer = searcher.optimizers_[-1]
    assert isinstance(optimizer.acq_func, PVRS)
    assert len(captured["params"]) == 1

    custom = BayesSearchCV(
        SVC(),
        {"C": Real(1e-3, 1e3, prior="log-uniform")},
        n_iter=1,
        optimizer_kwargs=dict(
            n_samples=3, gp_samples=40, gp_burnin=2, acq_func="ei"
        ),
    )
    custom._run_search(fake_evaluate)
    assert (custom.n_samples_, custom.gp_samples_, custom.gp_burnin_) \
        == (3, 40, 2)


@pytest.mark.slow
def test_searchcv_batch_points():
    """n_points>1 (VERDICT r3 #7): candidates come from one fused
    Thompson ask(n_points) batch and go to evaluate_candidates in ONE
    call (so sklearn's n_jobs parallelizes across candidates). The
    reference documents this as not implemented
    (bask/searchcv.py:81-83)."""
    X, y = load_iris(return_X_y=True)
    X_train, X_test, y_train, y_test = train_test_split(
        X, y, train_size=0.75, random_state=0
    )
    opt = BayesSearchCV(
        SVC(),
        {
            "C": Real(1e-6, 1e6, prior="log-uniform"),
            "gamma": Real(1e-6, 1e1, prior="log-uniform"),
            "degree": Integer(1, 8),
            "kernel": Categorical(["linear", "poly", "rbf"]),
        },
        n_iter=12,
        n_points=3,
        cv=None,
        random_state=0,
    )
    opt.fit(X_train, y_train)
    assert opt.score(X_test, y_test) > 0.89
    assert len(opt.cv_results_["mean_test_score"]) == 12
    space, optimizer = opt.optimizers_[-1]
    assert len(optimizer.Xi) == 12


def test_searchcv_batch_call_shapes():
    """n_iter is the TOTAL candidate count; batches are n_points-sized
    with a ragged tail, each handed to evaluate_candidates in one call."""
    import numpy as np

    searcher = BayesSearchCV(
        SVC(),
        {"C": Real(1e-3, 1e3, prior="log-uniform")},
        n_iter=5,
        n_points=2,
        optimizer_kwargs=dict(gp_samples=20, gp_burnin=1),
        random_state=3,
    )
    calls = []
    state = {"scores": []}

    def fake_evaluate(params_list):
        calls.append(len(params_list))
        state["scores"].extend([0.5] * len(params_list))
        return {"mean_test_score": np.asarray(state["scores"])}

    searcher._run_search(fake_evaluate)
    assert calls == [2, 2, 1]
    _, optimizer = searcher.optimizers_[-1]
    assert len(optimizer.Xi) == 5


def test_make_optimizer_names_dimensions():
    """Dimension objects get the search-space parameter names attached
    (reference bask/searchcv.py:307-318)."""
    import numpy as np

    searcher = BayesSearchCV(
        SVC(),
        {"gamma": Real(1e-4, 1.0, prior="log-uniform"), "degree": Integer(1, 5)},
        n_iter=1,
    )
    searcher._rng = np.random.RandomState(0)
    searcher.optimizer_kwargs_ = {}
    optimizer = searcher._make_optimizer(
        {"gamma": Real(1e-4, 1.0, prior="log-uniform"), "degree": Integer(1, 5)}
    )
    names = [d.name for d in optimizer.space.dimensions]
    assert names == ["degree", "gamma"]  # sorted parameter order
