"""Batch ask (Thompson-sampled) — a bask-tpu extension; the reference
raises NotImplementedError for n_points > 1 (bask/optimizer.py:201-204)."""

import numpy as np

from bask_tpu.optimizer import Optimizer


def test_batch_ask_init_phase():
    for strategy in ("random", "r2", "sb"):
        opt = Optimizer(
            dimensions=[(0.0, 1.0), (0.0, 1.0)],
            n_initial_points=6,
            init_strategy=strategy,
            random_state=0,
        )
        pts = opt.ask(n_points=4)
        assert len(pts) == 4
        assert all(len(p) == 2 for p in pts)


def test_batch_ask_after_fit():
    opt = Optimizer(
        dimensions=[(-2.0, 2.0)],
        n_initial_points=0,
        n_points=64,
        random_state=1,
    )
    opt.tell(
        [[-2.0], [-1.0], [0.0], [1.0], [2.0]],
        [2.0, 0.0, -2.0, 0.0, 2.0],
        gp_burnin=2,
    )
    batch = opt.ask(n_points=5)
    assert len(batch) == 5
    # all proposals unique and inside the space
    assert len({tuple(p) for p in batch}) == 5
    for p in batch:
        assert -2.0 <= p[0] <= 2.0
    # batch tell round trip
    opt.tell(batch, [float(p[0] ** 2) for p in batch], gp_burnin=2)
    assert len(opt.Xi) == 10
