"""Regression tests for the round-2 self-review findings (second pass:
space/searchcv/serialization/optimizer edge cases)."""

import numpy as np
import pytest

from bask_tpu import Optimizer, load_optimizer, save_optimizer
from bask_tpu.space import Categorical, Integer, Real, Space


def test_single_category_inverse_transform():
    """A pinned (single-category) dimension must survive the round trip
    for EVERY point, not just the first."""
    space = Space([Categorical(["a"]), Real(0.0, 1.0)])
    pts = [["a", 0.2], ["a", 0.5], ["a", 0.9]]
    back = space.inverse_transform(space.transform(pts))
    assert back == pts


def test_transform_rejects_out_of_bounds():
    r = Real(0.0, 1.0)
    with pytest.raises(ValueError, match="out of bounds"):
        r.transform([1.5])
    with pytest.raises(ValueError, match="out of bounds"):
        Integer(1, 8).transform([0])
    # float noise within tolerance is clipped, not rejected
    v = r.transform([1.0 + 1e-12, -1e-12])
    assert np.all((0.0 <= v) & (v <= 1.0))


def test_save_optimizer_with_numpy_scalars(tmp_path):
    opt = Optimizer(dimensions=[(0, 10)], n_initial_points=3)
    opt.tell(np.array([np.int64(3)]), np.float32(1.5))
    path = str(tmp_path / "ckpt.npz")
    save_optimizer(opt, path)  # used to crash: int64 not JSON serializable
    opt2 = load_optimizer(path)
    assert opt2.Xi == [[3]] and opt2.yi == [1.5]


def test_builtin_acq_instance_roundtrips(tmp_path):
    from bask_tpu.acquisition import ExpectedImprovement

    opt = Optimizer(
        dimensions=[(0.0, 1.0)],
        n_initial_points=2,
        acq_func=ExpectedImprovement(),  # fresh instance, not registry's
    )
    opt.tell([[0.2], [0.8]], [1.0, -1.0])
    path = str(tmp_path / "ckpt.npz")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no cannot-serialize warning
        save_optimizer(opt, path)
    opt2 = load_optimizer(path)
    assert isinstance(opt2.acq_func, ExpectedImprovement)


def test_resume_is_deterministic(tmp_path):
    """Two loads of the same checkpoint must continue identically (the
    GP's RNG stream round-trips, not just the optimizer's)."""
    opt = Optimizer(dimensions=[(0.0, 1.0)], n_initial_points=2, random_state=5)
    opt.tell([[0.2], [0.8], [0.5]], [1.0, -1.0, 0.3], gp_burnin=2,
             gp_samples=20, n_samples=1)
    path = str(tmp_path / "ckpt.npz")
    save_optimizer(opt, path)

    chains = []
    for _ in range(2):
        o = load_optimizer(path)
        o.tell([0.35], 0.1, gp_burnin=2, gp_samples=20, n_samples=1)
        chains.append(np.asarray(o.gp.chain_))
    np.testing.assert_array_equal(chains[0], chains[1])


def test_batch_ask_too_large_raises():
    opt = Optimizer(
        dimensions=[(0.0, 1.0)], n_points=20, n_initial_points=1,
        init_strategy="random", random_state=0,
    )
    opt.run(lambda x: float(x[0] ** 2), n_iter=2, gp_burnin=2,
            gp_samples=20, n_samples=1)
    with pytest.raises(ValueError, match="candidate grid"):
        opt.ask(n_points=21)
    assert len(opt.ask(n_points=5)) == 5


def test_callable_refit_is_honored():
    from sklearn.svm import SVC

    from bask_tpu.searchcv import BayesSearchCV

    searcher = BayesSearchCV(
        SVC(), {"C": Real(1e-3, 1e3, prior="log-uniform")}, n_iter=1,
        refit=lambda results: 1,  # user picks index 1, not the rank-min
    )
    results = {
        "rank_test_score": np.array([1, 2]),
        "params": [{"C": 1.0}, {"C": 2.0}],
    }
    assert searcher._select_best_index(searcher.refit, "score", results) == 1
