"""Sharded hyperposterior sampling: BayesGPR.sample(mesh=...) across the
virtual 8-device mesh must reproduce the unsharded chain exactly (same
program, distributed execution)."""

import numpy as np

from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk
from bask_tpu.parallel.mesh import walker_mesh


def _make_gp(seed):
    return BayesGPR(
        kernel=bk.ConstantKernel(1.0, (0.1, 2.0))
        * bk.Matern(0.3, (0.05, 2.0), nu=2.5),
        random_state=seed,
    )


def test_sharded_matches_unsharded():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(14, 1))
    y = np.sin(5 * X[:, 0])

    gp_a = _make_gp(7)
    gp_a.fit(X, y, n_burnin=2, n_walkers_per_thread=64, progress=False)

    mesh = walker_mesh(8)
    gp_b = _make_gp(7)
    gp_b.fit(
        X, y, n_burnin=2, n_walkers_per_thread=64, progress=False,
        mesh=mesh,
    )

    np.testing.assert_allclose(gp_b.chain_, gp_a.chain_, rtol=1e-9)
    np.testing.assert_allclose(gp_b.pos_, gp_a.pos_, rtol=1e-9)
    np.testing.assert_allclose(gp_b.theta, gp_a.theta, rtol=1e-9)
