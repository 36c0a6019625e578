"""Pallas whole-panel Cholesky+inverse (ops/pallas_chol_panel.py).

One program factorizes an entire <=256-wide panel batch (32-wide block
right-looking sweep with in-kernel MXU updates) instead of chaining
per-32-base programs. These tests pin the kernel's numerics on CPU via
the Pallas interpreter and the routing gates.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bask_tpu.ops import fast_cholesky as fc
from bask_tpu.ops import pallas_chol_panel as pcp


def _spd_batch(rng, B, m):
    Xp = rng.uniform(size=(m, 5))
    K0 = np.exp(
        -0.5 * ((Xp[:, None] - Xp[None]) ** 2).sum(-1) / 0.3**2
    ) + 1e-2 * np.eye(m)
    A = np.broadcast_to(K0, (B, m, m)).copy() * (
        1.0 + 0.1 * rng.rand(B)
    )[:, None, None]
    return jnp.asarray(A, jnp.float32)


@pytest.mark.parametrize(
    "B,m",
    [
        (50, 128),  # the pick_nb panel at the MCMC hot shape
        (5, 64),  # bucket-64 whole-matrix case (production_loop)
        (3, 96),  # ragged 32-multiple
        (1, 256),  # nb=256 large-n panel, single matrix
        (19, 64),  # identity-padded grid (wb=16 blocks)
    ],
)
def test_chol_inv_panel_matches_oracle(B, m):
    rng = np.random.RandomState(0)
    A = _spd_batch(rng, B, m)
    L, X = pcp.chol_inv_panel(A, interpret=True)
    Lr = np.linalg.cholesky(np.asarray(A, np.float64))
    scale = np.abs(Lr).max()
    assert np.abs(np.asarray(L, np.float64) - Lr).max() / scale < 5e-6
    assert (
        np.abs(np.asarray(X, np.float64) @ Lr - np.eye(m)).max() < 1e-4
    )
    assert np.array_equal(np.asarray(jnp.tril(L)), np.asarray(L))
    assert np.array_equal(np.asarray(jnp.tril(X)), np.asarray(X))


def test_non_pd_propagates_nan():
    """A negative pivot anywhere in the panel must poison the factor's
    tail AND the inverse (branchless -inf LML contract)."""
    A = np.eye(128, dtype=np.float32)[None].repeat(3, 0)
    A[1, 70, 70] = -1.0  # inside the 3rd 32-block
    L, X = pcp.chol_inv_panel(jnp.asarray(A), interpret=True)
    L, X = np.asarray(L), np.asarray(X)
    assert np.isfinite(L[0]).all() and np.isfinite(L[2]).all()
    assert np.isnan(L[1, -1, -1]) and np.isnan(X[1, -1, -1])


def test_vmap_matches_direct():
    rng = np.random.RandomState(2)
    A = _spd_batch(rng, 6, 64).reshape(2, 3, 64, 64)
    Lv, Xv = jax.vmap(lambda a: pcp.chol_inv_panel(a, interpret=True))(A)
    Ld, Xd = pcp.chol_inv_panel(A, interpret=True)
    assert np.array_equal(np.asarray(Lv), np.asarray(Ld))
    assert np.array_equal(np.asarray(Xv), np.asarray(Xd))


def test_block_cholesky_panel_parity(monkeypatch):
    """block_cholesky routed through the panel kernel (interpreted)
    matches the XLA-base factorization at the hot shape, including the
    LML terms and the cached diagonal-block inverses."""
    rng = np.random.RandomState(3)
    A = _spd_batch(rng, 5, 512)
    y = jnp.asarray(rng.standard_normal((5, 512)), jnp.float32)

    monkeypatch.setattr(fc, "PALLAS_BASE", "off")
    monkeypatch.setattr(fc, "PALLAS_PANEL", "off")
    Lx, ldx, qx = fc.fast_lml_terms(A, y)

    monkeypatch.setattr(fc, "PALLAS_PANEL", "on")
    monkeypatch.setattr(
        pcp, "chol_inv_panel", partial(pcp.chol_inv_panel, interpret=True)
    )
    Lp, ldp, qp = fc.fast_lml_terms(A, y)

    assert np.allclose(np.asarray(Lp), np.asarray(Lx), atol=2e-5)
    assert np.allclose(np.asarray(ldp), np.asarray(ldx), rtol=1e-5)
    assert np.allclose(np.asarray(qp), np.asarray(qx), rtol=1e-4)

    # the solves consume the panel kernel's inverses identically
    monkeypatch.setattr(fc, "PALLAS_PANEL", "off")
    L0, invs0 = fc.block_cholesky(A, nb=128)
    monkeypatch.setattr(fc, "PALLAS_PANEL", "on")
    L1, invs1 = fc.block_cholesky(A, nb=128)
    w0 = np.asarray(fc.block_forward_solve(L0, invs0, y), np.float64)
    w1 = np.asarray(fc.block_forward_solve(L1, invs1, y), np.float64)
    # both paths' inverses are exact up to f32 rounding; compare
    # relative to the solve's scale
    assert np.abs(w0 - w1).max() / np.abs(w0).max() < 5e-5


def test_gates():
    A32 = jnp.eye(128, dtype=jnp.float32)[None]
    A64 = jnp.eye(128, dtype=jnp.float64)[None]
    Abig = jnp.eye(512, dtype=jnp.float32)[None]
    Aragged = jnp.eye(40, dtype=jnp.float32)[None]
    # default OFF until the queued hardware A/B validates the Mosaic
    # lowering (see fast_cholesky.PALLAS_PANEL comment)
    assert fc.PALLAS_PANEL == "off"
    assert not fc._use_pallas_panel(A32)
    try:
        fc.PALLAS_PANEL = "auto"  # auto on CPU -> off
        assert not fc._use_pallas_panel(A32)
        fc.PALLAS_PANEL = "on"
        assert fc._use_pallas_panel(A32)
        assert not fc._use_pallas_panel(A64)  # f64 stays XLA
        assert not fc._use_pallas_panel(Abig)  # > PANEL_MAX
        assert not fc._use_pallas_panel(Aragged)  # not a 32-multiple
    finally:
        fc.PALLAS_PANEL = "off"


def test_custom_vmap_rule(monkeypatch):
    """The custom batching rule must fold vmap axes into the kernel's
    leading-dim flattening (and broadcast the in_axes=None case). The
    interpret= entry short-circuits the rule, so redirect the impl to
    the interpreter and drive the NON-interpret entry under vmap."""
    orig = pcp._panel_impl
    monkeypatch.setattr(pcp, "_panel_impl", lambda a, interp: orig(a, True))
    try:
        rng = np.random.RandomState(5)
        A = _spd_batch(rng, 6, 64).reshape(2, 3, 64, 64)
        Lv, Xv = jax.vmap(pcp.chol_inv_panel)(A)
        Ld, Xd = orig(A, True)
        assert Lv.shape == (2, 3, 64, 64)
        assert np.array_equal(np.asarray(Lv), np.asarray(Ld))
        assert np.array_equal(np.asarray(Xv), np.asarray(Xd))

        # in_axes=None: ONE factorization, broadcast outputs
        A1 = A[0]
        Lb, Xb = jax.vmap(
            lambda _, a: pcp.chol_inv_panel(a), in_axes=(0, None)
        )(jnp.arange(4), A1)
        assert Lb.shape == (4, 3, 64, 64)
        assert np.array_equal(np.asarray(Lb[0]), np.asarray(Lb[3]))
        assert np.array_equal(np.asarray(Lb[0]), np.asarray(Ld[0]))
    finally:
        jax.clear_caches()  # drop entries traced with the patched impl
