"""Pallas fused-gram kernel parity (interpret mode on CPU) and the
structure matcher."""

import functools
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from bask_tpu.ops import kernels as bk
from bask_tpu.ops import linalg


@pytest.fixture
def interpret_pallas(monkeypatch):
    import bask_tpu.ops.pallas_gram as pg

    monkeypatch.setattr(
        pg.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    return pg


CASES = [
    bk.ConstantKernel(1.0, (0.1, 2.0))
    * bk.Matern((0.3, 0.3, 0.3), (0.05, 2.0), nu=2.5)
    + bk.WhiteKernel(0.05, (1e-5, 1e5)),
    bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.RBF((0.4, 0.2, 0.6), (0.05, 2.0)),
    bk.Matern((0.3, 0.5, 0.2), (0.05, 2.0), nu=1.5),
    bk.Matern(0.4, (0.05, 2.0), nu=0.5) + bk.WhiteKernel(0.1, (1e-5, 1e5)),
]


def test_match_fusable():
    from bask_tpu.ops.pallas_gram import match_fusable

    for k in CASES:
        assert match_fusable(k) is not None
    # non-fusable structures
    assert match_fusable(bk.RBF(1.0, "fixed")) is None
    assert (
        match_fusable(bk.RBF(1.0, (0.1, 1.0)) * bk.Matern(1.0, (0.1, 1.0)))
        is None
    )
    assert (
        match_fusable(
            bk.Exponentiation(bk.RBF(1.0, (0.1, 1.0)), 2.0)
        )
        is None
    )


@pytest.mark.parametrize("kernel", CASES)
def test_fused_gram_matches_generic(kernel, interpret_pallas):
    pg = interpret_pallas
    spec = pg.match_fusable(kernel)
    rng = np.random.RandomState(0)
    n, n_pad, d, B = 90, 128, 3, 3
    X = np.full((n_pad, d), 0.5, np.float32)
    X[:n] = rng.uniform(size=(n, d))
    alpha = np.full(n_pad, 1e-6, np.float32)
    mask = np.arange(n_pad) < n
    thetas = (
        kernel.theta0[None, :] + 0.2 * rng.randn(B, kernel.n_theta)
    ).astype(np.float32)

    K_fused = np.asarray(
        pg.fused_masked_gram_batch(
            spec, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(alpha), n
        )
    )
    for b in range(B):
        K_ref = np.asarray(
            linalg.masked_gram(
                kernel,
                jnp.asarray(thetas[b]),
                jnp.asarray(X),
                jnp.asarray(alpha),
                jnp.asarray(mask),
            )
        )
        # atol 2e-3: for nu=0.5 the kernel slope is unbounded at r=0, so
        # f32 distance cancellation (inherent to both paths) shows up there
        np.testing.assert_allclose(K_fused[b], K_ref, rtol=2e-5, atol=2e-3)


def test_fused_gram_per_walker_X(interpret_pallas):
    """Warped case: per-walker inputs (B, n_pad, d)."""
    pg = interpret_pallas
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        (0.3, 0.3), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    spec = pg.match_fusable(kernel)
    rng = np.random.RandomState(1)
    n, n_pad, d, B = 60, 128, 2, 2
    Xb = np.full((B, n_pad, d), 0.5, np.float32)
    Xb[:, :n] = rng.uniform(size=(B, n, d))
    alpha = np.full(n_pad, 1e-6, np.float32)
    mask = np.arange(n_pad) < n
    thetas = np.tile(kernel.theta0.astype(np.float32), (B, 1))

    K = np.asarray(
        pg.fused_masked_gram_batch(
            spec, jnp.asarray(thetas), jnp.asarray(Xb), jnp.asarray(alpha), n
        )
    )
    for b in range(B):
        K_ref = np.asarray(
            linalg.masked_gram(
                kernel,
                jnp.asarray(thetas[b]),
                jnp.asarray(Xb[b]),
                jnp.asarray(alpha),
                jnp.asarray(mask),
            )
        )
        np.testing.assert_allclose(K[b], K_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kernel", CASES)
def test_lower_gram_matches_full_lower_triangle(kernel, interpret_pallas):
    """Symmetric-half kernel (VERDICT r2 #5): lower triangle bit-equal
    to the full kernel, strictly-upper 128-tiles exactly zero."""
    pg = interpret_pallas
    spec = pg.match_fusable(kernel)
    rng = np.random.RandomState(2)
    n, n_pad, d, B = 200, 256, 3, 2
    X = np.full((n_pad, d), 0.5, np.float32)
    X[:n] = rng.uniform(size=(n, d))
    alpha = np.full(n_pad, 1e-6, np.float32)
    thetas = (
        kernel.theta0[None, :] + 0.2 * rng.randn(B, kernel.n_theta)
    ).astype(np.float32)

    K_full = np.asarray(
        pg.fused_masked_gram_batch(
            spec, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(alpha), n
        )
    )
    K_low = np.asarray(
        pg.fused_masked_gram_lower_batch(
            spec, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(alpha), n
        )
    )
    t = pg._SQ_TILE
    tile_r = np.arange(n_pad) // t
    upper_tile = tile_r[:, None] < tile_r[None, :]
    for b in range(B):
        assert np.array_equal(
            K_low[b][~upper_tile], K_full[b][~upper_tile]
        )
        assert (K_low[b][upper_tile] == 0).all()


def test_lower_gram_lml_identical(interpret_pallas, monkeypatch):
    """The Cholesky reads only the lower triangle, so LMLs from the
    lower-only gram must be IDENTICAL to the full-gram path."""
    pg = interpret_pallas
    kernel = CASES[0]
    spec = pg.match_fusable(kernel)
    rng = np.random.RandomState(3)
    n, n_pad, B = 100, 128, 4
    d = 3
    X = np.full((n_pad, d), 0.5, np.float32)
    X[:n] = rng.uniform(size=(n, d))
    alpha = np.full(n_pad, 1e-6, np.float32)
    mask = jnp.asarray(np.arange(n_pad) < n)
    y = np.zeros(n_pad, np.float32)
    y[:n] = rng.randn(n).astype(np.float32)
    thetas = (
        kernel.theta0[None, :] + 0.1 * rng.randn(B, kernel.n_theta)
    ).astype(np.float32)

    Kf = pg.fused_masked_gram_batch(
        spec, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(alpha), n
    )
    Kl = pg.fused_masked_gram_lower_batch(
        spec, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(alpha), n
    )
    lml_f = np.asarray(linalg.batched_lml_from_gram(Kf, jnp.asarray(y), mask))
    lml_l = np.asarray(linalg.batched_lml_from_gram(Kl, jnp.asarray(y), mask))
    assert np.isfinite(lml_f).all()
    assert np.array_equal(lml_f, lml_l)


class TestFusedMarginalGrams:
    """gp.fused_marginal_grams — the batched gram precompute behind the
    marginalized acquisition / sample_y paths — must equal the per-draw
    vmapped masked_gram exactly where it engages, and stay off wherever
    the fast path cannot apply."""

    def _setup(self, n_warp=0):
        from bask_tpu.models import gp as gpc

        rng = np.random.RandomState(0)
        n_pad, n_real, d, S = 64, 50, 3, 6
        kernel = (
            bk.ConstantKernel(1.0, (0.1, 2.0))
            * bk.Matern((0.3,) * d, (0.05, 2.0), nu=2.5)
            + bk.WhiteKernel(0.05, (1e-5, 1e5))
        )
        X = np.zeros((n_pad, d), np.float32)
        X[:n_real] = rng.uniform(size=(n_real, d))
        y = np.zeros(n_pad, np.float32)
        y[:n_real] = rng.randn(n_real)
        data = gpc.make_data(
            jnp.asarray(X, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.full(n_pad, 1e-6, jnp.float32),
            jnp.arange(n_pad) < n_real,
        )
        rows = jnp.asarray(
            np.log(0.3) + 0.05 * rng.randn(S, kernel.n_theta + 2 * d * n_warp),
            jnp.float32,
        )
        return gpc, kernel, data, rows

    def test_matches_per_draw_masked_gram(self, interpret_pallas, monkeypatch):
        from bask_tpu.ops import fast_cholesky as fc

        gpc, kernel, data, rows = self._setup()
        monkeypatch.setattr(fc, "is_tpu_like_backend", lambda: True)
        grams = gpc.fused_marginal_grams(kernel, rows, data, 0)
        assert grams is not None
        ref = jax.vmap(
            lambda t: linalg.masked_gram(
                kernel, t, data.X, data.alpha_diag, data.mask
            )
        )(rows)
        np.testing.assert_allclose(
            np.asarray(grams), np.asarray(ref), atol=5e-6
        )

    def test_matches_per_draw_warped(self, interpret_pallas, monkeypatch):
        from bask_tpu.ops import fast_cholesky as fc
        from bask_tpu.models import warping as wp

        n_warp = 3
        gpc, kernel, data, rows = self._setup(n_warp=n_warp)
        monkeypatch.setattr(fc, "is_tpu_like_backend", lambda: True)
        grams = gpc.fused_marginal_grams(kernel, rows, data, n_warp)
        assert grams is not None

        def one(x):
            theta_gp, la, lb = wp.split_warp_params(x, n_warp)
            Xw = wp.warp(data.X, la, lb)
            return linalg.masked_gram(
                kernel, theta_gp, Xw, data.alpha_diag, data.mask
            )

        ref = jax.vmap(one)(rows)
        np.testing.assert_allclose(
            np.asarray(grams), np.asarray(ref), atol=5e-6
        )

    def test_off_on_cpu_f64_and_nonfusable(self, interpret_pallas, monkeypatch):
        from bask_tpu.ops import fast_cholesky as fc

        gpc, kernel, data, rows = self._setup()
        # default backend (cpu) -> off
        assert gpc.fused_marginal_grams(kernel, rows, data, 0) is None
        monkeypatch.setattr(fc, "is_tpu_like_backend", lambda: True)
        # f64 data -> off
        data64 = data._replace(X=data.X.astype(jnp.float64))
        assert gpc.fused_marginal_grams(kernel, rows, data64, 0) is None
        # non-fusable kernel -> off
        expk = bk.Exponentiation(
            bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.RBF(0.3, (0.05, 2.0)), 2.0
        )
        rows2 = rows[:, : expk.n_theta]
        assert gpc.fused_marginal_grams(expk, rows2, data, 0) is None

    def test_posterior_and_invs_accepts_precomputed_gram(self):
        from bask_tpu.ops import linalg as _lin

        gpc, kernel, data, rows = self._setup()
        theta = rows[0]
        Kp = _lin.masked_gram(
            kernel, theta, data.X, data.alpha_diag, data.mask
        )
        p0, i0 = gpc.posterior_and_invs(kernel, theta, data)
        p1, i1 = gpc.posterior_and_invs(kernel, theta, data, Kp=Kp)
        np.testing.assert_array_equal(np.asarray(p0.L), np.asarray(p1.L))
        np.testing.assert_array_equal(
            np.asarray(p0.alpha_dual), np.asarray(p1.alpha_dual)
        )

    def test_per_draw_predictions_end_to_end(
        self, interpret_pallas, monkeypatch
    ):
        """The vmapped Kp plumbing (grams[i] -> posterior_and_invs) must
        reproduce the gate-off per-draw predictions."""
        import jax.random as jrandom

        from bask_tpu import acquisition as acq
        from bask_tpu.ops import fast_cholesky as fc

        gpc, kernel, data, rows = self._setup()
        key = jrandom.PRNGKey(0)

        # gate off (CPU default): per-draw masked_gram
        mu0, std0, _ = acq._per_draw_body(
            rows, data, jnp.asarray(data.X[:7], jnp.float32), key,
            kernel, 0, kernel.n_theta - 1, False,
        )
        monkeypatch.setattr(fc, "is_tpu_like_backend", lambda: True)
        mu1, std1, _ = acq._per_draw_body(
            rows, data, jnp.asarray(data.X[:7], jnp.float32), key,
            kernel, 0, kernel.n_theta - 1, False,
        )
        np.testing.assert_allclose(
            np.asarray(mu0), np.asarray(mu1), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(std0), np.asarray(std1), atol=2e-5
        )
