"""batched_lml dispatch equivalence: batched path (CPU fallback = vmap)
must equal per-theta masked_lml, for shared and per-walker inputs."""

import numpy as np
import jax.numpy as jnp

from bask_tpu.models import gp as gpc
from bask_tpu.ops import kernels as bk
from bask_tpu.ops.linalg import batched_lml, masked_lml


def _setup(d=3, n=90, n_pad=128):
    rng = np.random.RandomState(0)
    X = np.full((n_pad, d), 0.5)
    X[:n] = rng.uniform(size=(n, d))
    y = np.zeros(n_pad)
    y[:n] = rng.randn(n)
    mask = np.arange(n_pad) < n
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * d), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    thetas = kernel.theta0[None, :] + 0.2 * rng.randn(6, kernel.n_theta)
    return kernel, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(y), jnp.asarray(
        np.full(n_pad, 1e-8)
    ), jnp.asarray(mask)


def test_batched_matches_scalar_shared_X():
    kernel, thetas, X, y, alpha, mask = _setup()
    batch = np.asarray(batched_lml(kernel, thetas, X, y, alpha, mask))
    singles = [
        float(masked_lml(kernel, t, X, y, alpha, mask)) for t in thetas
    ]
    np.testing.assert_allclose(batch, singles, rtol=1e-9)


def test_batched_matches_scalar_per_walker_X():
    kernel, thetas, X, y, alpha, mask = _setup()
    rng = np.random.RandomState(1)
    Xb = jnp.asarray(
        np.clip(
            np.asarray(X)[None] + 0.01 * rng.randn(6, *X.shape), 0, 1
        )
    )
    batch = np.asarray(batched_lml(kernel, thetas, Xb, y, alpha, mask))
    singles = [
        float(masked_lml(kernel, t, Xi, y, alpha, mask))
        for t, Xi in zip(thetas, Xb)
    ]
    np.testing.assert_allclose(batch, singles, rtol=1e-9)
