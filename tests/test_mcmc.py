"""Ensemble MCMC correctness: moments of known targets, rejection
semantics, and sharding across a virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from bask_tpu.parallel import mcmc


def _gauss_lp(mean, cov_inv):
    def lp(x):
        d = x - mean
        return -0.5 * d @ cov_inv @ d

    return jax.vmap(lp)


def test_recovers_gaussian_moments():
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[1.0, 0.6], [0.6, 2.0]])
    lp = _gauss_lp(mean, jnp.linalg.inv(cov))
    key = jax.random.PRNGKey(0)
    pos0 = mean + 0.1 * jax.random.normal(key, (64, 2))
    chain, final = mcmc.run_ensemble(lp, pos0, jax.random.PRNGKey(1), 600)
    flat = np.asarray(mcmc.flatten_chain(chain, discard=200, thin=2))
    np.testing.assert_allclose(flat.mean(axis=0), np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=0.35)
    # healthy acceptance rate for a well-scaled Gaussian
    rate = float(final.accepted) / (600 * 64)
    assert 0.2 < rate < 0.9


def test_neg_inf_proposals_rejected():
    # Target: standard normal restricted to x0 > 0 (hard constraint via -inf)
    def lp_one(x):
        base = -0.5 * jnp.sum(x * x)
        return jnp.where(x[0] > 0, base, -jnp.inf)

    lp = jax.vmap(lp_one)

    pos0 = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (32, 2))) + 0.1
    chain, final = mcmc.run_ensemble(lp, pos0, jax.random.PRNGKey(3), 300)
    flat = np.asarray(mcmc.flatten_chain(chain, discard=100))
    assert np.all(flat[:, 0] > 0)
    assert np.all(np.isfinite(np.asarray(final.log_prob)))


def test_walker_sharding_runs():
    # The walker axis shards across the virtual 8-device CPU mesh; the
    # cross-half gather becomes a collective inserted by GSPMD.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ("walkers",))
    lp = _gauss_lp(jnp.zeros(3), jnp.eye(3))
    pos0 = jax.random.normal(jax.random.PRNGKey(4), (128, 3))
    pos0 = jax.device_put(pos0, NamedSharding(mesh, P("walkers", None)))
    chain, final = mcmc.run_ensemble(lp, pos0, jax.random.PRNGKey(5), 50)
    assert chain.shape == (50, 128, 3)
    assert np.isfinite(np.asarray(final.log_prob)).all()
