"""Pallas TPU kernel: batched base-case Cholesky + triangular inverse.

The blocked matmul Cholesky (:mod:`bask_tpu.ops.fast_cholesky`) reduces
every factorization to MXU matmuls plus (batch, <=32, <=32) base cases.
Measured on v5e-1 (``benchmarks/bench_chol_breakdown.py``), those bases
ARE the critical path of the MCMC hot loop: XLA's batched ``cholesky``
at (50, 32, 32) costs ~256 us (a 32-iteration While loop with dynamic
slices) and the Newton-Schulz inverse another ~99 us — and a
(50, 512, 512) factorization chains 16 such bases serially. This kernel
computes the factor AND its inverse for the whole base batch in ONE
Pallas program: ``m`` fully-unrolled right-looking steps of full-tile
VPU ops, extracting the pivot column/row by masked iota reductions
(no dynamic lane slicing, which Mosaic lowers poorly), with the
forward-substitution inverse interleaved into the same steps.

Per step ``j`` (all arrays (wb, m, m), batch leading):

    d_j   = M[:, j, j]                       (two masked reductions)
    col   = M[:, :, j] * rsqrt(d_j), rows < j zeroed
    L[:, :, j] = col;   M -= col col^T       (trailing Schur update)
    x_row = R[:, j, :] * rsqrt(d_j)          (R starts as I)
    X[:, j, :] = x_row; R -= tril(col, -1) x_row

Non-PD inputs produce ``rsqrt(negative) = NaN`` which propagates through
every subsequent update — preserving the branchless "failed
factorization -> -inf log-probability" contract the MCMC relies on
(reference behavior: ``bask/bayesgpr.py:373-379``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chol_inv_base", "chol_inv_steps", "pad_to_blocks"]

# Walkers per grid program. Scoped-VMEM bound (measured v5e): the
# unrolled step chain keeps ~15 live (wb, m, 128-lane) f32 arrays, and
# multi-block grids double-buffer the in/out blocks on top — wb=64
# single-block fits, wb=64 with a >=2 grid exceeded the 16 MB scoped
# limit by 0.8 MB, wb=32 grids fit comfortably.
_WB_SINGLE = 64
_WB_GRID = 32


def chol_inv_steps(M):
    """(wb, m, m) -> (L, X=L^-1): the fully-unrolled right-looking step
    chain (masked-iota pivot extraction, no dynamic lane slices).

    Pure value-in/value-out (trivially reusable by other kernels; a
    round-3 whole-panel kernel consumed it before being measured out —
    see fast_cholesky's panel note).
    """
    m = M.shape[1]
    dt = M.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    L = jnp.zeros(M.shape, dt)
    X = jnp.zeros(M.shape, dt)
    R = jnp.broadcast_to((lane == sub).astype(dt), M.shape)  # identity
    for j in range(m):
        cm = lane == j
        rm = sub == j
        # pivot column / diagonal element via masked reductions
        dcol = jnp.sum(jnp.where(cm, M, 0.0), axis=2, keepdims=True)
        dj = jnp.sum(jnp.where(rm, dcol, 0.0), axis=1, keepdims=True)
        inv_s = jax.lax.rsqrt(dj)  # NaN on non-PD, by design
        col = jnp.where(sub >= j, dcol * inv_s, 0.0)  # (wb, m, 1)
        L = L + jnp.where(cm, col, 0.0)
        # inverse row: forward substitution against the running residual
        rrow = jnp.sum(jnp.where(rm, R, 0.0), axis=1, keepdims=True)
        xrow = rrow * inv_s  # (wb, 1, m)
        X = X + jnp.where(rm, xrow, 0.0)
        if j + 1 < m:
            M = M - col * jnp.swapaxes(col, 1, 2)
            R = R - jnp.where(sub > j, col, 0.0) * xrow
    return L, X


def pad_to_blocks(A2, wb: int):
    """Pad a flattened (B, m, m) batch to a wb multiple with identity
    blocks (PD, so no spurious NaNs). Returns (padded, n_blocks)."""
    B, m, _ = A2.shape
    nblk = -(-B // wb)
    pad = nblk * wb - B
    if pad:
        A2 = jnp.concatenate(
            [A2, jnp.broadcast_to(jnp.eye(m, dtype=A2.dtype), (pad, m, m))]
        )
    return A2, nblk


def _chol_inv_kernel(a_ref, l_ref, x_ref):
    L, X = chol_inv_steps(a_ref[...])
    l_ref[...] = L
    x_ref[...] = X


@partial(jax.jit, static_argnames=("interpret",))
def chol_inv_base(A, interpret: bool = False):
    """(L, L^-1) of a batch of small SPD matrices in one Pallas program.

    ``A``: (..., m, m) float32, m static (the blocked factorization's
    base size, <= 64ish). Any leading batch shape; flattened internally
    and processed in grid blocks. Returns lower ``L`` and its exact
    triangular inverse, both (..., m, m).

    Under ``vmap`` the batch axis folds into the SAME leading-dim
    flattening (``custom_vmap`` below) — without it, JAX's generic
    pallas batching rule turns a vmapped per-draw posterior into
    hundreds of single-matrix programs (measured 13.1 vs 4.5 ms for the
    100-draw acquisition pass).

    ``interpret=True`` runs the Pallas interpreter (CPU parity tests).
    """
    if interpret:
        return _chol_inv_impl(A, True)
    return _chol_inv_batched(A)


@jax.custom_batching.custom_vmap
def _chol_inv_batched(A):
    return _chol_inv_impl(A, False)


@_chol_inv_batched.def_vmap
def _chol_inv_batched_rule(axis_size, in_batched, A):
    # the impl natively flattens any leading batch dims into the grid —
    # recurse so nested vmaps collapse the same way
    if not in_batched[0]:
        # vmap(in_axes=None): one unique factorization, broadcast after
        L, X = _chol_inv_batched(A)
        bshape = (axis_size,) + L.shape
        return (
            jnp.broadcast_to(L[None], bshape),
            jnp.broadcast_to(X[None], bshape),
        ), (True, True)
    out = _chol_inv_batched(A)
    return out, (True, True)


def _chol_inv_impl(A, interpret: bool):
    batch = A.shape[:-2]
    m = A.shape[-1]
    B = math.prod(batch) if batch else 1
    A2 = A.reshape(B, m, m)
    if B <= _WB_SINGLE:
        wb, nblk = B, 1
    else:
        wb = _WB_GRID
        A2, nblk = pad_to_blocks(A2, wb)
    spec = pl.BlockSpec((wb, m, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    L2, X2 = pl.pallas_call(
        _chol_inv_kernel,
        grid=(nblk,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(A2.shape, A.dtype)] * 2,
        interpret=interpret,
    )(A2)
    out_shape = batch + (m, m)
    return L2[:B].reshape(out_shape), X2[:B].reshape(out_shape)
