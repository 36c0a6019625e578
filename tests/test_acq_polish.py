"""Gradient-polished acquisition argmax (round 5, beyond reference).

The reference optimizes acquisitions over a 500-point uniform random
grid only (``bask/optimizer.py:353-376``); bask-tpu's acquisitions are
jnp-differentiable, so :func:`bask_tpu.acquisition.polish_acquisition`
runs a best-tracking Adam ascent from the top grid points. Pinned here:
the ascent contract (never worse than the start under the program's own
draws), agreement with a fine grid on a smooth surface, warp support,
the unsupported-surface gates (MES/TS/custom), and the Optimizer flag.
"""

import warnings

import numpy as np
import pytest

import bask_tpu.acquisition as acq_mod
from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk


def _fitted_gp(seed=0, n=24, warp=False):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, 2))
    y = np.sum((X - np.array([0.3, 0.7])) ** 2, axis=1)
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.RBF(
        (0.3, 0.3), (0.05, 2.0)
    )
    gp = BayesGPR(kernel=kernel, random_state=seed, warp_inputs=warp)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gp.fit(X, y, n_burnin=2, n_desired_samples=40,
               n_walkers_per_thread=10, progress=False)
    return gp


@pytest.mark.parametrize("acq_name", ["pvrs", "vr", "ei", "ttei", "lcb", "mean"])
def test_polish_never_loses_to_its_starts(acq_name):
    """Best-tracking ascent: the returned value at each start must be
    >= that start's own value under the SAME program (t=0 is tracked),
    and the polished points stay inside [0, 1]^d."""
    from bask_tpu.optimizer import ACQUISITION_FUNC

    gp = _fitted_gp()
    acq = ACQUISITION_FUNC[acq_name]
    rng = np.random.RandomState(1)
    X0 = rng.uniform(size=(4, 2))
    out = acq_mod.polish_acquisition(
        X0, gp, acq, n_samples=8, random_state=2, n_steps=8
    )
    assert out is not None
    xb, vb = out
    assert xb.shape == (4, 2) and vb.shape == (4,)
    assert np.all(xb >= 0.0) and np.all(xb <= 1.0)
    assert np.all(np.isfinite(vb))
    # zero-step ascent == the starts' own values; more steps only help
    xb0, vb0 = acq_mod.polish_acquisition(
        X0, gp, acq, n_samples=8, random_state=2, n_steps=0
    )
    np.testing.assert_array_equal(xb0, X0)
    assert np.all(vb >= vb0 - 1e-12)


def test_polish_mean_matches_fine_grid_argmax():
    """On the smooth -mu surface the polished argmax must beat a coarse
    grid and land near the fine-grid optimum of the SAME surface."""
    from bask_tpu.optimizer import ACQUISITION_FUNC

    gp = _fitted_gp()
    acq = ACQUISITION_FUNC["mean"]
    # coarse 16-point grid vs a 4096-point reference grid
    rng = np.random.RandomState(3)
    coarse = rng.uniform(size=(16, 2))
    mu_c = gp.predict(coarse)
    x0 = coarse[np.argmin(mu_c)][None]
    xb, vb = acq_mod.polish_acquisition(
        x0, gp, acq, n_samples=8, random_state=4, n_steps=40, lr=0.05
    )
    fine = rng.uniform(size=(4096, 2))
    mu_f = gp.predict(fine)
    # the polished -mu must be at least as good as the best fine-grid
    # value minus a small tolerance (the ascent works on the true
    # surface, the grid only samples it)
    assert -float(gp.predict(xb[:1])[0]) >= -float(np.min(mu_f)) - 1e-3


def test_polish_warped_model():
    gp = _fitted_gp(warp=True)
    from bask_tpu.optimizer import ACQUISITION_FUNC

    for name in ["pvrs", "ei"]:
        out = acq_mod.polish_acquisition(
            np.random.RandomState(5).uniform(size=(3, 2)),
            gp, ACQUISITION_FUNC[name], n_samples=6, random_state=6,
            n_steps=5,
        )
        assert out is not None
        xb, vb = out
        assert np.all(np.isfinite(vb)) and np.all((xb >= 0) & (xb <= 1))


def test_polish_unsupported_surfaces_return_none():
    from bask_tpu.optimizer import ACQUISITION_FUNC

    gp = _fitted_gp()
    X0 = np.random.RandomState(7).uniform(size=(2, 2))
    # MES: min-value samples are fitted to the whole grid; TS: fresh
    # function draw per x is not a coherent surface
    assert acq_mod.polish_acquisition(
        X0, gp, ACQUISITION_FUNC["mes"], n_samples=4) is None
    assert acq_mod.polish_acquisition(
        X0, gp, ACQUISITION_FUNC["ts"], n_samples=4) is None

    class CustomFullGP(acq_mod.FullGPAcquisition):
        def __call__(self, X, gp, *args, **kwargs):
            return np.zeros(len(X))

    assert acq_mod.polish_acquisition(
        X0, gp, CustomFullGP(), n_samples=4) is None
    # marginalized acquisitions need draws
    assert acq_mod.polish_acquisition(
        X0, gp, ACQUISITION_FUNC["ei"], n_samples=0) is None


def test_optimizer_polish_flag_end_to_end():
    """acq_polish on the Optimizer: the loop runs, next_x stays in
    bounds, and a categorical space skips the polish silently."""
    import bask_tpu as bt

    def f(x):
        return float((x[0] - 0.3) ** 2)

    opt = bt.Optimizer(
        dimensions=[(-1.0, 1.0)], n_initial_points=2, random_state=11,
        n_points=32, acq_polish=5, acq_polish_starts=3,
        gp_sample_kwargs={"max_extensions": 1, "extension_steps": 8},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for _ in range(4):
            x = opt.ask()
            opt.tell(x, f(x), gp_samples=20, gp_burnin=2)
    assert -1.0 <= opt._next_x[0] <= 1.0

    opt2 = bt.Optimizer(
        dimensions=[(-1.0, 1.0), ("a", "b")], n_initial_points=2,
        random_state=11, n_points=32, acq_polish=5,
        gp_sample_kwargs={"max_extensions": 1, "extension_steps": 8},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for _ in range(4):
            x = opt2.ask()
            opt2.tell(x, f([x[0]]), gp_samples=20, gp_burnin=2)
    assert opt2._next_x is not None


def test_polish_noop_warns_once():
    """acq_polish that can never run must SAY so (one-time warning):
    categorical spaces warn at construction, surface-less acquisitions
    (MES/TS) at the first tell."""
    import bask_tpu as bt

    with pytest.warns(UserWarning, match="categorical"):
        bt.Optimizer(
            dimensions=[(-1.0, 1.0), ("a", "b")], random_state=0,
            acq_polish=5,
        )

    def f(x):
        return float((x[0] - 0.3) ** 2)

    opt = bt.Optimizer(
        dimensions=[(-1.0, 1.0)], n_initial_points=1, random_state=3,
        n_points=16, acq_polish=5, acq_func="ts",
        gp_sample_kwargs={"until_rhat": None},
    )
    x = opt.ask()
    with pytest.warns(UserWarning, match="acq_polish is inactive"):
        opt.tell(x, f(x), gp_samples=20, gp_burnin=2)
    # one-time: the second tell stays quiet
    x = opt.ask()
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        try:
            opt.tell(x, f(x), gp_samples=20, gp_burnin=2)
        except UserWarning as w:  # pragma: no cover
            assert "surface" not in str(w), w
