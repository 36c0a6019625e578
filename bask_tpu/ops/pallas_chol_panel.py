"""Pallas TPU kernel: batched PANEL Cholesky + triangular inverse.

Second-generation follow-up to :mod:`pallas_chol_base`. With the fused
32-wide base case in place, the (50, 512, 512) factorization's critical
path became the base-call *launches*: a 128-wide panel still chains
four sequential (wb, 32, 32) Pallas programs plus the XLA-level glue
matmuls between them (the per-base compute is microseconds — VMEM
in/out of ~0.6 MB — so each call is mostly fixed program overhead).

This kernel factorizes a whole (batch, P, P) panel in ONE program,
P ≤ 256 a multiple of 32: a block right-looking sweep over 32-wide
diagonal blocks, each factored by the same fully-unrolled masked-iota
step chain the base kernel uses, with the panel solve
``P_k = B_k · X_d^T`` and the trailing Schur update running on the MXU
*inside* the kernel (static slices only — Python-level loop indices).
The exact triangular inverse is assembled in the same program by block
forward substitution:

    X_kk = inv(L_kk)                      (from the 32-step chain)
    X_kj = -X_kk · Σ_{j<=i<k} L_ki X_ij   (k > j, all (wb, 32, 32) MXU)

Non-PD inputs produce ``rsqrt(negative) = NaN`` in a diagonal step,
which propagates through every later matmul — the branchless "failed
factorization -> -inf log-probability" contract the MCMC relies on
(reference behavior: ``bask/bayesgpr.py:373-379``).

All factorization matmuls run at HIGHEST precision (CLAUDE.md rule 5:
TPU default bf16 passes destroy LML accuracy).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chol_inv_panel", "PANEL_MAX"]

_BLK = 32
# Largest panel the single-program kernel accepts. 256 covers every
# pick_nb panel width (128/256) and all ragged tails (64-multiples).
PANEL_MAX = 256

# Walkers per grid program, by panel width. VMEM per program is roughly
# (in + L + X + trailing temps) ≈ 5 · wb · P² · 4 B plus double-buffered
# in/out blocks on multi-program grids — conservative defaults, tuned on
# hardware via these module switches. Widths past 256 (reachable only by
# raising PANEL_MAX — an experiment knob, not the default route) get the
# 1-walker fallback.
_WB_BY_P = {32: 32, 64: 16, 96: 16, 128: 8, 160: 4, 192: 4, 224: 4, 256: 4}
_WB_FALLBACK = 1


def _mm(a, b):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _mmT(a, b):
    """a @ b^T for (wb, r, k) x (wb, c, k) -> (wb, r, c)."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# the 32-step diagonal-block factorization is SHARED with the base
# kernel (single implementation of the numerics; see its docstring)
from .pallas_chol_base import chol_inv_steps as _chol_inv_block32  # noqa: E402
from .pallas_chol_base import pad_to_blocks as _pad_to_blocks  # noqa: E402


def _panel_kernel(a_ref, l_ref, x_ref):
    A = a_ref[...]  # (wb, P, P)
    wb, P, _ = A.shape
    nb = P // _BLK

    # --- factorization: block right-looking with a shrinking trailing T
    T = A
    lcols = []  # lcols[k]: (wb, P - 32k, 32) block column below+incl diag
    xdiag = []  # xdiag[k]: (wb, 32, 32) inverse of the diagonal block
    for k in range(nb):
        D = T[:, :_BLK, :_BLK]
        Ld, Xd = _chol_inv_block32(D)
        xdiag.append(Xd)
        if k + 1 < nb:
            Bk = T[:, _BLK:, :_BLK]  # (wb, rest, 32)
            Pk = _mmT(Bk, Xd)  # B · Xd^T  (Xd is L_kk^-1, lower)
            T = T[:, _BLK:, _BLK:] - _mmT(Pk, Pk)
            lcols.append(jnp.concatenate([Ld, Pk], axis=1))
        else:
            lcols.append(Ld)

    zcol = lambda r: jnp.zeros((wb, r, _BLK), A.dtype)  # noqa: E731
    L = jnp.concatenate(
        [
            c if k == 0 else jnp.concatenate([zcol(_BLK * k), c], axis=1)
            for k, c in enumerate(lcols)
        ],
        axis=2,
    )
    l_ref[...] = L

    # --- inverse by block forward substitution (row-block at a time)
    # lblk(k, i): L_{k,i} block for i <= k
    def lblk(k, i):
        return lcols[i][:, _BLK * (k - i) : _BLK * (k - i + 1), :]

    xrows = []  # xrows[k]: list over j<=k of (wb, 32, 32)
    for k in range(nb):
        row = []
        for j in range(k):
            S = None
            for i in range(j, k):
                t = _mm(lblk(k, i), xrows[i][j])
                S = t if S is None else S + t
            row.append(-_mm(xdiag[k], S))
        row.append(xdiag[k])
        xrows.append(row)

    def xrow_full(row):
        pad_cols = P - _BLK * len(row)
        if pad_cols:
            row = row + [jnp.zeros((wb, _BLK, pad_cols), A.dtype)]
        return jnp.concatenate(row, axis=2)

    x_ref[...] = jnp.concatenate([xrow_full(r) for r in xrows], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def chol_inv_panel(A, interpret: bool = False):
    """(L, L^-1) of a batch of (P, P) SPD panels in ONE Pallas program.

    ``A``: (..., P, P) float32, P a static multiple of 32, P <= 256.
    Any leading batch shape (flattened into walker-block grid programs,
    same contract as :func:`pallas_chol_base.chol_inv_base`). Under
    ``vmap`` the batch axis folds into the same flattening.

    ``interpret=True`` runs the Pallas interpreter (CPU parity tests).
    """
    if interpret:
        return _panel_impl(A, True)
    return _panel_batched(A)


@jax.custom_batching.custom_vmap
def _panel_batched(A):
    return _panel_impl(A, False)


@_panel_batched.def_vmap
def _panel_batched_rule(axis_size, in_batched, A):
    if not in_batched[0]:
        L, X = _panel_batched(A)
        bshape = (axis_size,) + L.shape
        return (
            jnp.broadcast_to(L[None], bshape),
            jnp.broadcast_to(X[None], bshape),
        ), (True, True)
    out = _panel_batched(A)
    return out, (True, True)


def _panel_impl(A, interpret: bool):
    batch = A.shape[:-2]
    P = A.shape[-1]
    assert P % _BLK == 0, P
    B = math.prod(batch) if batch else 1
    A2 = A.reshape(B, P, P)
    wb = min(_WB_BY_P.get(P, _WB_FALLBACK), B) or 1
    A2, nblk = _pad_to_blocks(A2, wb)
    spec = pl.BlockSpec(
        (wb, P, P), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    L2, X2 = pl.pallas_call(
        _panel_kernel,
        grid=(nblk,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(A2.shape, A.dtype)] * 2,
        interpret=interpret,
    )(A2)
    out_shape = batch + (P, P)
    return L2[:B].reshape(out_shape), X2[:B].reshape(out_shape)
