"""Matmul-only blocked Cholesky: exactness vs XLA/LAPACK, NaN
propagation for non-PD inputs, and LML-term equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bask_tpu.ops import fast_cholesky as fc


def _spd(rng, b, n, jitter=1e-3):
    A = rng.randn(b, n, n)
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) / n + jitter * np.eye(n))


@pytest.mark.parametrize("n", [32, 64, 128, 256, 384, 512])
def test_block_cholesky_matches_xla(n):
    rng = np.random.RandomState(0)
    A = _spd(rng, 3, n)
    L_ref = np.asarray(jnp.linalg.cholesky(A))
    L, _ = fc.block_cholesky(A)
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=5e-5, atol=1e-8)


def test_tri_newton_inv_exact():
    rng = np.random.RandomState(1)
    L = np.tril(rng.randn(2, 96, 96)) + 3.0 * np.eye(96)
    X = np.asarray(fc.tri_newton_inv(jnp.asarray(L)))
    np.testing.assert_allclose(
        X @ L, np.broadcast_to(np.eye(96), (2, 96, 96)), atol=1e-8
    )


def test_block_forward_solve():
    rng = np.random.RandomState(2)
    A = _spd(rng, 2, 256)
    y = jnp.asarray(rng.randn(2, 256))
    L, invs = fc.block_cholesky(A)
    w = fc.block_forward_solve(L, invs, y)
    w_ref = jax.vmap(
        lambda Li, yi: jax.scipy.linalg.solve_triangular(Li, yi, lower=True)
    )(L, y)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(w_ref), rtol=5e-5, atol=1e-8
    )


def test_non_pd_produces_nan():
    n = 128
    A = jnp.asarray(-np.eye(n))[None]
    L, _ = fc.block_cholesky(A)
    assert np.isnan(np.asarray(L)).any()


def test_fast_lml_matches_slow_path():
    from bask_tpu.ops import linalg
    from bask_tpu.models import gp as gpc
    from bask_tpu.ops import kernels as bk

    rng = np.random.RandomState(3)
    n, n_pad, d = 100, 128, 3
    X = np.full((n_pad, d), 0.5)
    X[:n] = rng.uniform(size=(n, d))
    y = np.zeros(n_pad)
    y[:n] = rng.randn(n)
    mask = np.arange(n_pad) < n
    data = gpc.make_data(X, y, np.full(n_pad, 1e-6), mask)
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        (0.3, 0.3, 0.3), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    theta = jnp.asarray(kernel.theta0)

    old = linalg.FAST_CHOLESKY
    try:
        linalg.FAST_CHOLESKY = "off"
        slow = float(gpc.log_marginal_likelihood(kernel, theta, data))
        linalg.FAST_CHOLESKY = "on"
        fast = float(gpc.log_marginal_likelihood(kernel, theta, data))
    finally:
        linalg.FAST_CHOLESKY = old
    np.testing.assert_allclose(fast, slow, rtol=1e-8)
