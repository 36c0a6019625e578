"""Estimators must be picklable (reference docstring contract,
bask/searchcv.py:162: 'model can be saved')."""

import pickle

import numpy as np

from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.optimizer import Optimizer


def test_pickle_fitted_gpr():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(10, 1))
    y = np.sin(3 * X[:, 0])
    gp = BayesGPR(random_state=0)
    gp.fit(X, y, n_burnin=1, progress=False)
    blob = pickle.dumps(gp)
    gp2 = pickle.loads(blob)
    np.testing.assert_allclose(gp2.theta, gp.theta)
    Xq = np.array([[0.3], [0.7]])
    np.testing.assert_allclose(gp2.predict(Xq), gp.predict(Xq), rtol=1e-10)


def test_pickle_optimizer():
    opt = Optimizer(
        dimensions=[(-1.0, 1.0)], n_initial_points=1,
        init_strategy="random", random_state=1,
    )
    opt.run(lambda x: float(x[0] ** 2), n_iter=2, gp_burnin=1, n_samples=1)
    opt2 = pickle.loads(pickle.dumps(opt))
    assert opt2.Xi == opt.Xi
    assert opt2.ask() == opt.ask()
