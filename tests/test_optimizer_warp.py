"""End-to-end BO loop with input warping enabled (the reference's
warp_inputs pathway through Optimizer.tell, bask/optimizer.py:353-357)."""

import numpy as np

from bask_tpu.optimizer import Optimizer


def test_warped_optimizer_loop():
    opt = Optimizer(
        dimensions=[(0.0, 1.0)],
        n_initial_points=4,
        init_strategy="random",
        n_points=64,
        gp_kwargs={"warp_inputs": True},
        random_state=0,
    )

    def f(x):
        return float((x[0] - 0.7) ** 2)

    res = opt.run(f, n_iter=7, n_samples=1, gp_samples=100, gp_burnin=2)
    assert len(opt.Xi) == 7
    assert opt.gp.warp_alphas_ is not None
    assert opt.gp.warp_betas_ is not None
    # warped chain carries 2 extra dims per input dimension
    assert opt.gp.chain_.shape[1] == opt.gp.kernel_.n_theta + 2
    assert np.isfinite(res.fun)
    # predictions at the warped GP remain sane
    mean, std = opt.gp.predict(np.array([[0.5]]), return_std=True)
    assert np.isfinite(mean).all() and np.isfinite(std).all()
