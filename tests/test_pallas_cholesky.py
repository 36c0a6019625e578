"""Experimental VMEM-resident Pallas Cholesky: interpret-mode parity,
batch padding, NaN propagation."""

import functools
from unittest import mock

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

import bask_tpu.ops.pallas_cholesky as pc


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setattr(
        pc, "pl", mock.MagicMock(wraps=pc.pl)
    )
    pc.pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    return pc


def test_matches_xla(interpret):
    rng = np.random.RandomState(0)
    B, N = 6, 256  # B not a multiple of WPB: exercises padding
    A = rng.randn(B, N, N).astype(np.float32)
    K = jnp.asarray(
        A @ np.swapaxes(A, -1, -2) / N + 0.1 * np.eye(N, dtype=np.float32)
    )
    L = np.asarray(interpret.cholesky_vmem(K))
    L_ref = np.asarray(jnp.linalg.cholesky(K))
    np.testing.assert_allclose(L, L_ref, atol=2e-5)


def test_non_pd_nan(interpret):
    K = jnp.asarray(-np.eye(128, dtype=np.float32))[None]
    L = np.asarray(interpret.cholesky_vmem(K))
    assert np.isnan(L).any()
