"""Custom acquisition objects through the Optimizer (reference allows
any Acquisition instance as acq_func, bask/optimizer.py:136-139)."""

import jax.numpy as jnp
import numpy as np

from bask_tpu.acquisition import UncertaintyAcquisition
from bask_tpu.optimizer import Optimizer


class NegMeanPlusStd(UncertaintyAcquisition):
    """A custom UCB-flavored acquisition."""

    def __call__(self, mu, std, *args, kappa=0.5, **kwargs):
        return kappa * std - mu


def test_custom_acquisition_object():
    opt = Optimizer(
        dimensions=[(-1.0, 1.0)],
        n_initial_points=2,
        init_strategy="random",
        n_points=64,
        acq_func=NegMeanPlusStd(),
        acq_func_kwargs={"kappa": 1.0},
        random_state=0,
    )
    res = opt.run(
        lambda x: float(x[0] ** 2), n_iter=4, n_samples=2, gp_burnin=1
    )
    assert len(opt.Xi) == 4
    assert np.isfinite(res.fun)
    x = opt.ask()
    assert -1.0 <= x[0] <= 1.0
