"""Checkpoint/resume round trips for kernels, BayesGPR, and Optimizer."""

import numpy as np

from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk
from bask_tpu.optimizer import Optimizer
from bask_tpu.utils import serialization as ser


def test_kernel_roundtrip():
    k = bk.Exponentiation(
        bk.ConstantKernel(1.3, (0.1, 2.0))
        * bk.Matern((0.3, 0.4), (0.2, 0.5), nu=2.5)
        + bk.WhiteKernel(0.1, "fixed"),
        2.0,
    )
    k2 = ser.kernel_from_dict(ser.kernel_to_dict(k))
    assert k2 == k
    np.testing.assert_allclose(k2.theta0, k.theta0)


def test_gpr_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(12, 1))
    y = np.sin(4 * X[:, 0])
    gp = BayesGPR(random_state=0)
    gp.fit(X, y, n_burnin=2, progress=False)
    path = str(tmp_path / "gp.npz")
    ser.save_gpr(gp, path)
    gp2 = ser.load_gpr(path)

    np.testing.assert_allclose(gp2.theta, gp.theta)
    np.testing.assert_allclose(gp2.chain_, gp.chain_)
    np.testing.assert_allclose(gp2.pos_, gp.pos_)
    Xq = np.linspace(0, 1, 5)[:, None]
    m1, s1 = gp.predict(Xq, return_std=True)
    m2, s2 = gp2.predict(Xq, return_std=True)
    np.testing.assert_allclose(m2, m1, rtol=1e-10)
    np.testing.assert_allclose(s2, s1, rtol=1e-8)


def test_optimizer_roundtrip(tmp_path):
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=2,
        init_strategy="random", random_state=3,
    )
    opt.run(lambda x: float(x[0] ** 2), n_iter=3, gp_burnin=0, n_samples=1)
    path = str(tmp_path / "opt.npz")
    ser.save_optimizer(opt, path)
    opt2 = ser.load_optimizer(path)

    assert opt2.Xi == opt.Xi
    assert opt2.yi == opt.yi
    assert opt2.ask() == opt.ask()
    np.testing.assert_allclose(opt2.gp.chain_, opt.gp.chain_)

    # resumed optimizer can continue the loop (warm start from pos_)
    opt2.tell(opt2.ask(), 0.1, gp_burnin=0, n_samples=1)
    assert len(opt2.Xi) == len(opt.Xi) + 1


def test_moves_none_roundtrips_as_none(tmp_path):
    """moves=None (explicit pure stretch) must NOT silently become the
    "auto" (demix) default on restore — a resumed optimizer would
    switch samplers mid-run (round-5 review finding)."""
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(10, 1))
    y = np.sin(4 * X[:, 0])
    for moves_in in (None, "auto", "demix", "demix:jump=0.25"):
        gp = BayesGPR(random_state=0, moves=moves_in)
        gp.fit(X, y, n_burnin=2, progress=False)
        path = str(tmp_path / "gp_moves.npz")
        ser.save_gpr(gp, path)
        gp2 = ser.load_gpr(path)
        assert gp2.moves == gp.moves, (moves_in, gp2.moves)


def test_acq_polish_roundtrips(tmp_path):
    """The opt-in polish settings survive a checkpoint resume."""
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)], n_initial_points=2,
        init_strategy="random", random_state=3,
        acq_polish=7, acq_polish_starts=5, acq_polish_lr=0.01,
    )
    opt.run(lambda x: float(x[0] ** 2), n_iter=3, gp_burnin=0, n_samples=1)
    path = str(tmp_path / "opt_polish.npz")
    ser.save_optimizer(opt, path)
    opt2 = ser.load_optimizer(path)
    assert opt2.acq_polish == 7
    assert opt2.acq_polish_starts == 5
    assert opt2.acq_polish_lr == 0.01
