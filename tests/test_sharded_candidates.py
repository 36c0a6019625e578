"""Candidate-grid sharding: acquisition evaluation over a mesh-sharded
candidate grid must match the unsharded values exactly (pure data
parallelism; the only collective is the final argmax reduction)."""

import numpy as np
import jax
import jax.numpy as jnp

from bask_tpu.acquisition import ExpectedImprovement
from bask_tpu.models import gp as gpc
from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk
from bask_tpu.parallel.mesh import shard_candidates, walker_mesh


def test_sharded_candidate_grid_matches_unsharded():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(12, 2))
    y = np.sin(4 * X[:, 0]) + X[:, 1]

    gp = BayesGPR(
        kernel=bk.ConstantKernel(1.0, (0.1, 2.0))
        * bk.Matern((0.3, 0.3), (0.05, 2.0), nu=2.5),
        random_state=3,
    )
    gp.fit(
        X, y, n_burnin=2, n_desired_samples=16, n_walkers_per_thread=16,
        progress=False,
    )

    n_cand = 64  # 8 per device on the 8-device mesh
    Xc = rng.uniform(size=(n_cand, 2))
    theta = jnp.asarray(gp.theta)
    kernel = gp.kernel_
    data = gp._post_data
    post = gp._post
    ei = ExpectedImprovement()

    @jax.jit
    def acq_argmax(Xc):
        mu, std = gpc.predict(
            kernel, theta, post, data, Xc, return_std=True
        )
        vals = ei(mu, std)
        return vals, jnp.argmax(vals)

    vals_ref, best_ref = acq_argmax(jnp.asarray(Xc))

    mesh = walker_mesh(8, axis="cand")
    Xc_sharded = shard_candidates(jnp.asarray(Xc), mesh, axis="cand")
    vals_sh, best_sh = acq_argmax(Xc_sharded)

    np.testing.assert_allclose(
        np.asarray(vals_sh), np.asarray(vals_ref), rtol=1e-12
    )
    assert int(best_sh) == int(best_ref)
