"""Tune an SVC on iris with the fully-Bayesian BayesSearchCV.

Runnable equivalent of the reference's doctest example
(``bask/searchcv.py:133-164``): mixed log-uniform/integer/categorical
space, 32 iterations.

Run:  python examples/searchcv_svc.py  (add --cpu to force CPU backend)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from sklearn.datasets import load_iris
from sklearn.model_selection import train_test_split
from sklearn.svm import SVC

from bask_tpu import BayesSearchCV
from bask_tpu.space import Categorical, Integer, Real


def main():
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
        n_iter=32,
        random_state=0,
    )
    t0 = time.time()
    opt.fit(X_train, y_train)
    print(f"32 iterations: {time.time() - t0:.1f}s")
    print("best params:", opt.best_params_)
    print("test score:", round(opt.score(X_test, y_test), 4))


if __name__ == "__main__":
    main()
