"""Cross-feature integration: one BO run exercising input warping,
per-point noise, replace=True, batch ask, a padding-bucket transition,
mid-run checkpoint/resume, and diagnostics together.

Each feature has focused tests; this pins their *interactions* (the
kind of breakage refactors cause without any single-feature test going
red)."""

import numpy as np
import pytest

from bask_tpu import Optimizer, load_optimizer, save_optimizer


@pytest.mark.slow
def test_full_featured_bo_run(tmp_path):
    rng = np.random.RandomState(0)

    def objective(x):
        return float(
            np.sin(5.0 * x[0]) * (1.0 - x[1]) + 0.05 * rng.randn()
        )

    opt = Optimizer(
        dimensions=[(0.0, 1.0), (0.0, 1.0)],
        n_points=60,
        n_initial_points=4,
        init_strategy="r2",
        gp_kwargs=dict(warp_inputs=True, normalize_y=True),
        acq_func="pvrs",
        random_state=7,
    )

    # init phase + first fits, with heteroscedastic noise reports
    for i in range(8):
        x = opt.ask()
        opt.tell(
            x, objective(x), noise_vector=0.01 * (1 + i % 3),
            n_samples=1, gp_samples=40, gp_burnin=3,
        )
    assert opt.gp.chain_ is not None
    assert opt.gp.warp_alphas_ is not None  # warping active in the chain

    # mid-run checkpoint + resume must preserve the ask/tell state
    path = str(tmp_path / "ckpt.npz")
    save_optimizer(opt, path)
    opt2 = load_optimizer(path)
    assert opt2.Xi == opt.Xi and opt2.noisei == opt.noisei
    np.testing.assert_allclose(opt2.gp.chain_, opt.gp.chain_)
    assert opt2.ask() is not None

    # batch ask (exceeds reference) under warping
    batch = opt.ask(n_points=3)
    assert len(batch) == 3
    for x in batch:
        assert 0.0 <= x[0] <= 1.0 and 0.0 <= x[1] <= 1.0
    # batch points are distinct candidates
    assert len({tuple(np.round(x, 9)) for x in batch}) == 3

    # cross the 64-observation padding bucket (recompile boundary)
    X_bulk = rng.uniform(size=(60, 2))
    opt.tell(
        X_bulk.tolist(),
        [objective(x) for x in X_bulk],
        noise_vector=[0.01] * 60,
        n_samples=1, gp_samples=800, gp_burnin=3,  # >=4 kept steps for
        # the diagnostics below (100 walkers -> 8 steps)
    )
    assert len(opt.yi) == 68  # 8 + 60, bucket now 128
    assert opt.gp._data.X.shape[0] == 128

    # diagnostics on the warped chain (gp dims + 2*warp dims)
    diag = opt.gp.mcmc_diagnostics()
    n_dim = opt.gp._spec.n_theta + 2 * 2
    assert diag["rhat"].shape == (n_dim,)
    assert np.all(np.isfinite(diag["rhat"]))

    # replace=True resets observations but keeps the warm-started model
    pos_before = np.copy(opt.gp.pos_)
    opt.tell(
        [[0.2, 0.2], [0.8, 0.8], [0.5, 0.5], [0.1, 0.9]],
        [0.0, -0.5, 0.3, 0.1],
        replace=True, n_samples=1, gp_samples=40, gp_burnin=3,
    )
    assert len(opt.yi) == 4
    assert opt.gp.pos_.shape == pos_before.shape

    # the proposal machinery still works end to end
    x = opt.ask()
    assert 0.0 <= x[0] <= 1.0 and 0.0 <= x[1] <= 1.0
