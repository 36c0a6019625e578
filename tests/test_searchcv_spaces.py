"""BayesSearchCV with multiple search (sub)spaces — list-of-dicts and
list-of-(dict, n_iter) forms (reference docstring cases 2 and 3,
bask/searchcv.py:40-49)."""

from sklearn.datasets import load_iris
from sklearn.svm import SVC

from bask_tpu.searchcv import BayesSearchCV
from bask_tpu.space import Categorical, Real


def test_multiple_search_spaces():
    X, y = load_iris(return_X_y=True)
    opt = BayesSearchCV(
        SVC(),
        [
            ({"C": Real(0.1, 100.0, prior="log-uniform")}, 3),
            (
                {
                    "gamma": Real(1e-3, 1.0, prior="log-uniform"),
                    "kernel": Categorical(["linear", "rbf"]),
                },
                4,
            ),
        ],
        cv=3,
        random_state=0,
    )
    opt.fit(X, y)
    assert len(opt.cv_results_["params"]) == 7
    assert len(opt.optimizers_) == 2
    assert opt.best_score_ > 0.8
