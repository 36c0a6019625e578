"""Distributional correctness of the stretch-move sampler beyond
Gaussian moments: KS test against a skewed (Gamma) target, and noise
kernel-construction modes of BayesGPR."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bask_tpu.parallel import mcmc


import pytest


@pytest.mark.slow
def test_ks_gamma_target():
    a, scale = 3.0, 0.7

    def lp_one(x):
        z = x[0]
        return jnp.where(
            z > 0, (a - 1.0) * jnp.log(z) - z / scale, -jnp.inf
        )

    lp = jax.vmap(lp_one)
    key = jax.random.PRNGKey(0)
    pos0 = jax.random.gamma(key, a, (64, 1)) * scale
    chain, _ = mcmc.run_ensemble(lp, pos0, jax.random.PRNGKey(1), 1500)
    flat = np.asarray(mcmc.flatten_chain(chain, discard=500, thin=20))[:, 0]
    # thinned cross-walker samples ~ i.i.d.; KS against the true CDF
    stat, pvalue = st.kstest(flat, st.gamma(a, scale=scale).cdf)
    assert pvalue > 0.01, f"KS stat {stat}, p {pvalue}, n {len(flat)}"


def test_noise_modes():
    from bask_tpu.models.bayesgpr import BayesGPR
    from bask_tpu.ops import kernels as bk

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(10, 1))
    y = np.sin(3 * X[:, 0])
    base = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.RBF(0.3, (0.05, 2.0))

    # noise="gaussian": White appended once
    gp = BayesGPR(kernel=base, noise="gaussian", random_state=0)
    gp.fit(X, y, n_burnin=1, progress=False)
    assert gp.kernel_.n_theta == base.n_theta + 1
    assert gp.white_index_ is not None

    # user kernel already contains White: not appended twice
    gp2 = BayesGPR(
        kernel=base + bk.WhiteKernel(0.1, (1e-5, 1e5)),
        noise="gaussian",
        random_state=0,
    )
    gp2.fit(X, y, n_burnin=1, progress=False)
    assert gp2.kernel_.n_theta == base.n_theta + 1

    # noise=None: no White, noise_ stays None
    gp3 = BayesGPR(kernel=base, noise=None, random_state=0)
    gp3.fit(X, y, n_burnin=1, progress=False)
    assert gp3.kernel_.n_theta == base.n_theta
    assert gp3.white_index_ is None
    # noise-free context is a no-op but must not crash
    with gp3.noise_set_to_zero():
        gp3.predict(np.array([[0.5]]), return_std=True)
