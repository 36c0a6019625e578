"""BO over a mixed real/integer/categorical space directly through the
Optimizer (the reference exercises this only via BayesSearchCV)."""

import numpy as np
import pytest

from bask_tpu.optimizer import Optimizer
from bask_tpu.space import Categorical, Integer, Real


def test_mixed_space_loop():
    opt = Optimizer(
        dimensions=[
            Real(0.0, 1.0),
            Integer(1, 4),
            Categorical(["a", "b", "c"]),
        ],
        n_initial_points=4,
        init_strategy="random",
        n_points=64,
        acq_func="ei",
        random_state=0,
    )

    def f(x):
        bonus = {"a": 0.0, "b": -0.5, "c": 0.2}[x[2]]
        return float((x[0] - 0.3) ** 2 + 0.1 * x[1] + bonus)

    res = opt.run(f, n_iter=7, n_samples=1, gp_samples=100, gp_burnin=2)
    assert len(opt.Xi) == 7
    # proposals remain valid mixed-type points
    x = opt.ask()
    assert isinstance(x[1], int) or np.issubdtype(type(x[1]), np.integer)
    assert x[2] in ("a", "b", "c")
    assert 0.0 <= x[0] <= 1.0
    assert np.isfinite(res.fun)

    # optimum_intervals must reject categorical spaces (reference
    # contract, bask/optimizer.py:669-672)
    with pytest.raises(NotImplementedError):
        opt.optimum_intervals()


def test_expected_minimum_categorical_fallback():
    from bask_tpu.utils.result import create_result, expected_minimum

    opt = Optimizer(
        dimensions=[Real(0.0, 1.0), Categorical(["u", "v"])],
        n_initial_points=0,
        n_points=32,
        random_state=1,
    )
    rng = np.random.RandomState(2)
    Xi = [[float(rng.uniform()), rng.choice(["u", "v"])] for _ in range(8)]
    yi = [float((x[0] - 0.5) ** 2 + (0.3 if x[1] == "v" else 0.0)) for x in Xi]
    opt.tell(Xi, yi, gp_burnin=2)
    res = create_result(opt.Xi, opt.yi, opt.space, opt.rng, models=[opt.gp])
    x, fun = expected_minimum(res, n_random_starts=10, random_state=3)
    assert x[1] in ("u", "v")
    assert np.isfinite(fun)
