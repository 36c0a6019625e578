"""Pallas fused base-case Cholesky+inverse (ops/pallas_chol_base.py).

On TPU the blocked factorization's (batch, 32, 32) base cases run as ONE
Pallas program per base (measured on v5e-1: the XLA base cholesky +
Newton inverse were the critical path — 3.35 -> 0.89 ms for the
(50,512,512) hot factorization, north-star chain 2.36 -> 0.80 s). These
tests pin the kernel's numerics on CPU via the Pallas interpreter.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bask_tpu.ops import fast_cholesky as fc
from bask_tpu.ops import pallas_chol_base as pcb


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
        (50, 32),  # the MCMC half-ensemble base shape
        (1, 32),  # consensus factorization
        (7, 24),  # ragged bucket base (e.g. 192-panel recursion)
        (3, 16),
        (200, 32),  # multi-block grid path (wb=32 blocks + identity pad)
    ],
)
def test_chol_inv_base_matches_oracle(B, m):
    rng = np.random.RandomState(0)
    A = _spd_batch(rng, B, m)
    L, X = pcb.chol_inv_base(A, interpret=True)
    Lr = np.linalg.cholesky(np.asarray(A, np.float64))
    assert np.abs(np.asarray(L, np.float64) - Lr).max() < 5e-6
    # X is the exact triangular inverse of L (forward substitution)
    assert (
        np.abs(np.asarray(X, np.float64) @ Lr - np.eye(m)).max() < 5e-5
    )
    assert np.array_equal(np.asarray(jnp.tril(L)), np.asarray(L))
    assert np.array_equal(np.asarray(jnp.tril(X)), np.asarray(X))


def test_non_pd_propagates_nan():
    """rsqrt(negative pivot) -> NaN must reach the factor's tail (the
    branchless failed-factorization -> -inf LML contract, reference
    bask/bayesgpr.py:373-379)."""
    A = jnp.asarray(
        np.broadcast_to(-np.eye(32), (4, 32, 32)).copy(), jnp.float32
    )
    L, X = pcb.chol_inv_base(A, interpret=True)
    assert bool(jnp.isnan(L[:, -1, -1]).all())
    assert bool(jnp.isnan(X[:, -1, -1]).all())
    # a PD batch stays NaN-free
    Lg, _ = pcb.chol_inv_base(
        _spd_batch(np.random.RandomState(1), 4, 32), interpret=True
    )
    assert bool(jnp.isfinite(Lg).all())


def test_vmap_matches_direct():
    rng = np.random.RandomState(2)
    A = _spd_batch(rng, 6, 32)
    Lv, Xv = jax.vmap(lambda a: pcb.chol_inv_base(a, interpret=True))(A)
    Ld, Xd = pcb.chol_inv_base(A, interpret=True)
    assert np.allclose(np.asarray(Lv), np.asarray(Ld), atol=1e-6)
    assert np.allclose(np.asarray(Xv), np.asarray(Xd), atol=1e-6)


def test_block_cholesky_pallas_base_parity(monkeypatch):
    """block_cholesky with the Pallas base (interpreted) matches the XLA
    base to f32 tolerance at the hot shape, including LML terms."""
    rng = np.random.RandomState(3)
    A = _spd_batch(rng, 5, 256)
    y = jnp.asarray(rng.standard_normal((5, 256)), jnp.float32)

    monkeypatch.setattr(fc, "PALLAS_BASE", "off")
    Lx, ldx, qx = fc.fast_lml_terms(A, y)

    monkeypatch.setattr(fc, "PALLAS_BASE", "on")
    monkeypatch.setattr(
        pcb, "chol_inv_base", partial(pcb.chol_inv_base, interpret=True)
    )
    Lp, ldp, qp = fc.fast_lml_terms(A, y)

    assert np.allclose(np.asarray(Lp), np.asarray(Lx), atol=2e-5)
    assert np.allclose(np.asarray(ldp), np.asarray(ldx), rtol=1e-5)
    assert np.allclose(np.asarray(qp), np.asarray(qx), rtol=1e-4)


def test_cpu_backend_keeps_xla_base():
    """On the CPU backend the auto gate must NOT pick Pallas (golden
    chain values depend on the XLA base there)."""
    A = _spd_batch(np.random.RandomState(4), 2, 32)
    assert fc.PALLAS_BASE == "auto"
    assert not fc._use_pallas_base(A)


def test_custom_vmap_rule(monkeypatch):
    """Same contract as the panel kernel's rule test: vmap axes fold
    into the grid flattening; in_axes=None broadcasts one result."""
    orig = pcb._chol_inv_impl
    monkeypatch.setattr(pcb, "_chol_inv_impl", lambda a, interp: orig(a, True))
    try:
        rng = np.random.RandomState(6)
        A = _spd_batch(rng, 6, 32).reshape(2, 3, 32, 32)
        Lv, Xv = jax.vmap(pcb.chol_inv_base)(A)
        Ld, Xd = orig(A, True)
        assert np.array_equal(np.asarray(Lv), np.asarray(Ld))
        assert np.array_equal(np.asarray(Xv), np.asarray(Xd))

        A1 = A[0]
        Lb, _ = jax.vmap(
            lambda _, a: pcb.chol_inv_base(a), in_axes=(0, None)
        )(jnp.arange(4), A1)
        assert Lb.shape == (4, 3, 32, 32)
        assert np.array_equal(np.asarray(Lb[0]), np.asarray(Ld[0]))
    finally:
        jax.clear_caches()
