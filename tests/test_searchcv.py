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
