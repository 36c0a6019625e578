"""Remaining tell/run semantics from the reference contract:
fit=False defers refitting; run(replace=True) restarts data but reuses
the model; chain add/thin plumbing."""

import numpy as np

from bask_tpu.optimizer import Optimizer


def test_tell_fit_false_defers():
    opt = Optimizer(
        dimensions=[(-1.0, 1.0)], n_initial_points=1,
        init_strategy="random", random_state=0,
    )
    opt.tell([0.1], 0.5, gp_burnin=1, n_samples=1)
    chain_before = np.copy(opt.gp.chain_)
    opt.tell([0.2], 0.6, fit=False)
    assert len(opt.Xi) == 2
    np.testing.assert_array_equal(opt.gp.chain_, chain_before)
    # next fitting tell picks up all three points
    opt.tell([0.3], 0.7, gp_burnin=1, n_samples=1)
    assert len(opt.Xi) == 3
    assert opt.gp._X_orig.shape[0] == 3


def test_run_replace_restarts_data():
    opt = Optimizer(
        dimensions=[(-1.0, 1.0)], n_initial_points=1,
        init_strategy="random", random_state=1,
    )
    opt.run(lambda x: float(x[0] ** 2), n_iter=3, gp_burnin=1, n_samples=1)
    assert len(opt.Xi) == 3
    opt.run(
        lambda x: float(x[0] ** 2), n_iter=2, replace=True,
        gp_burnin=1, n_samples=1,
    )
    # replace resets observations but keeps optimizing
    assert len(opt.Xi) == 2


def test_sample_thinning():
    from bask_tpu.models.bayesgpr import BayesGPR

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(8, 1))
    y = np.sin(3 * X[:, 0])
    gp = BayesGPR(random_state=0)
    gp.fit(X, y, n_burnin=0, n_desired_samples=300, progress=False)
    n_full = len(gp.chain_)
    gp.sample(n_desired_samples=300, n_burnin=0, n_thin=3)
    assert len(gp.chain_) * 3 <= n_full + 100  # thinned chain is ~1/3
