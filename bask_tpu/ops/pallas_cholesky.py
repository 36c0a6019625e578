"""Pallas TPU kernel: VMEM-resident batched Cholesky factorization.

The walker-batched factorization is the dominant cost of the MCMC step.
XLA's batched Cholesky streams every blocked update through HBM; this
kernel keeps a *group* of walkers' full matrices resident in VMEM for
the entire factorization, so the O(n^3) panel/Schur updates never touch
HBM — total HBM traffic is one read of K and one write of L.

Layout: grid over walker groups of ``WPB`` matrices; inside a program a
right-looking blocked factorization (NB=128 panels) runs with:

* the diagonal block factored by a sequential 128-column loop whose
  per-column work is vectorized over the walker group and the 128x128
  tile (VPU),
* the panel solve via an exact Newton-Schulz triangular inverse
  (matmuls on the MXU; the residual is nilpotent, so ceil(log2(128))
  iterations are exact),
* the trailing Schur update as one batched MXU matmul per step.

Non-PD inputs produce NaNs in the diagonal loop and propagate,
preserving the -inf log-probability semantics.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cholesky_vmem", "WPB"]

_NB = 128
WPB = 8  # walkers per program: WPB * n^2 * 4B must fit VMEM with headroom
# (in/out are aliased, so one (WPB, n, n) buffer + temporaries)


def _factor_diag_block(D):
    """In-register Cholesky of (W, NB, NB), sequential over columns."""
    W, nb, _ = D.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)

    eye_mask = rows == cols

    # Masked formulation: iterate k = 0..nb-1 with static shapes
    def body(k, D):
        # pivot d = sqrt(D[:, k, k]) — 3-D diagonal via mask (Mosaic has
        # no >2-D gather)
        diag = jnp.sum(jnp.where(eye_mask[None], D, 0.0), axis=2)  # (W, nb)
        onehot_k = (jax.lax.broadcasted_iota(jnp.int32, (nb,), 0) == k)
        d = jnp.sqrt(jnp.sum(jnp.where(onehot_k[None, :], diag, 0.0), axis=1))
        # column k, scaled below the pivot
        colmask = cols == k  # (nb, nb)
        col = jnp.sum(jnp.where(colmask[None], D, 0.0), axis=2)  # (W, nb)
        below = jax.lax.broadcasted_iota(jnp.int32, (nb,), 0) > k
        l = jnp.where(below[None, :], col / d[:, None], 0.0)  # (W, nb)
        # write scaled column + pivot back
        newcol = l + jnp.where(onehot_k[None, :], d[:, None], 0.0)
        D = jnp.where(colmask[None], newcol[:, :, None], D)
        # zero the upper part of this row? handled at the end with tril
        # Schur rank-1 update on the strictly-lower-right submatrix
        upd = l[:, :, None] * l[:, None, :]  # (W, nb, nb)
        sub = (rows > k) & (cols > k)
        D = D - jnp.where(sub[None], upd, 0.0)
        return D

    D = jax.lax.fori_loop(0, nb, body, D)
    tril = rows >= cols
    return jnp.where(tril[None], D, 0.0)


def _tri_inv_newton(L):
    """Exact inverse of (W, NB, NB) lower-triangular tiles (MXU)."""
    W, nb, _ = L.shape
    eye = jnp.eye(nb, dtype=L.dtype)
    d = 1.0 / jnp.sum(jnp.where((eye > 0)[None], L, 0.0), axis=2)
    X = eye[None] * d[:, :, None]
    iters = max(1, math.ceil(math.log2(nb)))
    for _ in range(iters):
        LX = jax.lax.dot_general(
            L,
            X,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        X = jax.lax.dot_general(
            X,
            2.0 * eye[None] - LX,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    return jnp.where((rows >= cols)[None], X, 0.0)


def _bmm(a, b, transpose_b=False):
    dims = (
        (((2,), (2,)), ((0,), (0,)))
        if transpose_b
        else (((2,), (1,)), ((0,), (0,)))
    )
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=dims,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _chol_kernel(k_ref, out_ref, n: int):
    T = n // _NB
    out_ref[:, :, :] = k_ref[:, :, :]
    for j in range(T):
        lo, hi = j * _NB, (j + 1) * _NB
        D = _factor_diag_block(out_ref[:, lo:hi, lo:hi])
        out_ref[:, lo:hi, lo:hi] = D
        if j + 1 < T:
            Dinv = _tri_inv_newton(D)
            A_panel = out_ref[:, hi:, lo:hi]  # (W, m, NB)
            P = _bmm(A_panel, Dinv, transpose_b=True)
            out_ref[:, hi:, lo:hi] = P
            tail = out_ref[:, hi:, hi:]
            out_ref[:, hi:, hi:] = tail - _bmm(P, P, transpose_b=True)
        # zero the strictly-upper blocks of this block-column
        if j > 0:
            out_ref[:, : j * _NB, lo:hi] = jnp.zeros_like(
                out_ref[:, : j * _NB, lo:hi]
            )


@partial(jax.jit, static_argnames=())
def cholesky_vmem(K):
    """Lower Cholesky of (B, n, n) with VMEM-resident factorization.

    ``n`` must be a multiple of 128 and ``WPB * n * n * 4B`` must fit
    VMEM; the batch is padded up to a multiple of ``WPB`` internally.
    """
    B, n, _ = K.shape
    assert n % _NB == 0, f"n={n} must be a multiple of {_NB}"
    pad = (-B) % WPB
    if pad:
        K = jnp.concatenate(
            [K, jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (pad, n, n))]
        )
    Bp = K.shape[0]

    out = pl.pallas_call(
        partial(_chol_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
        grid=(Bp // WPB,),
        in_specs=[
            pl.BlockSpec(
                (WPB, n, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (WPB, n, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        input_output_aliases={0: 0},  # factor in place: halves VMEM
    )(K)
    return out[:B]
