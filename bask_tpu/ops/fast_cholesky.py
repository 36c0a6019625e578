"""Matmul-only blocked Cholesky — the MCMC hot-path factorization.

XLA's stock ``cholesky`` on TPU runs a column-sequential loop whose
latency dominates the walker-batched LML (measured ~7ms for a (50, 512,
512) batch — <1% MXU utilization). This module reformulates the batched
factorization as *pure batched matmuls* plus a tiny base case:

* recursive 2x2 block Cholesky:  A = [[A11, .], [A21, A22]] ->
  L11 = chol(A11), L21 = A21 L11^-T, L22 = chol(A22 - L21 L21^T),
* the factor's inverse is assembled IN the same recursion — the
  sub-inverses the off-diagonal panel already needs give the parent via
  inv([[L11,0],[L21,L22]]) = [[inv11,0],[-inv22 (L21 inv11), inv22]],
  two matmuls per level (a separate whole-block Newton–Schulz inverse
  was the serial-op-count bottleneck),
* only the small base case (<= 32) uses a Newton–Schulz inverse
  (X <- X (2I - L X): the residual is nilpotent, so it is EXACT after
  ceil(log2(m)) iterations) on top of XLA's cholesky, whose loop is
  short at that size.

Non-PD inputs surface as NaNs in a base-case factor and propagate
through every downstream matmul, preserving the branchless
"failed factorization -> -inf log-probability" semantics the MCMC
relies on (reference behavior: ``bask/bayesgpr.py:373-379``).

``block_forward_solve`` reuses the diagonal-block inverses to apply
L^-1 to a vector with a handful of batched small matmuls instead of a
latency-bound length-n triangular solve.
"""

from __future__ import annotations

import math


import jax.numpy as jnp
from jax import lax


def _mm(a, b):
    """Matmul at full f32 precision (TPU default is bf16 passes, which
    destroys LML accuracy)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

__all__ = [
    "tri_newton_inv",
    "block_cholesky",
    "block_forward_solve",
    "block_solve_lower_mat",
    "block_solve_upper_mat",
    "fast_lml_terms",
]

_BASE = 32
# Base-case implementation: "unrolled" emits _BASE fully unrolled rank-1
# update steps that XLA schedules without While-loop/dynamic-slice
# latency; "xla" uses jnp.linalg.cholesky's generic loop kernel.
# Module-level so benchmarks can switch variants per process.
BASE_IMPL = "xla"

# There is deliberately NO triangle-split trailing update: splitting
# the symmetric Schur update tail -= P P^T into T11/T21/T22 with the
# upper half mirrored (25% fewer matmul flops per level, bit-identical
# result) was built and MEASURED AND REJECTED on v5e-1 (2026-08-19,
# bench_roofline chol-split1/chol-split2 vs chol at n=8192, one per
# process, in-scan): 126.9 / 128.5 ms vs **63.4 ms** for the plain
# full-rectangle form — the explicit transpose-mirror and the
# concatenate materialization cost ~2x more than the flop saving;
# XLA executes the single fat GEMM at 97% of the f32 matmul ceiling
# (roofline, BASELINE.md) and anything that breaks that fusion loses.
# Together with the TRAILING_PRECISION measurement below, this CLOSES
# the single-chip factorization question at f32: full-rectangle
# HIGHEST-precision trailing updates are the optimum.

# Trailing-update matmul precision override (None = HIGHEST, full f32).
# At n>=4096 the factorization is dominated by the trailing Schur
# products P @ P^T; lax.Precision.HIGH (bf16_3x) halves their MXU
# passes. MEASURED on v5e-1 (2026-08-19, bench_roofline chol-trailhigh)
# and kept OFF: 63.4 -> 54.3 ms at n=8192 (1.17x — the bandwidth share
# grows as compute shrinks) for a 16x worse reconstruction error
# (1.79e-6 -> 2.91e-5), a bad trade next to the LML. The knob stays as
# the measured escape hatch for workloads that can tolerate it.
TRAILING_PRECISION = None

# Pallas fused base (chol + inverse in ONE program, pallas_chol_base.py):
# "auto" = on for f32 on a TPU-like backend (measured 3.35 -> 0.89 ms
# for the (50,512,512) factorization on v5e-1 — the XLA base cholesky's
# While-loop latency and the per-base Newton inverses were the critical
# path); "off" / "on" override. CPU keeps the XLA base (bit-stable
# goldens; Mosaic unavailable).
PALLAS_BASE = "auto"

# Backends where the Mosaic/TPU Pallas kernels lower: real TPU PJRT and
# the axon remote tunnel. Explicitly NOT cpu/gpu — a gpu backend would
# crash at lowering if auto-gated in (the kernels use pltpu memory
# spaces), so unknown backends fall back to the XLA paths.
_NON_TPU_BACKENDS = ("cpu", "gpu", "cuda", "rocm", "metal")


def is_tpu_like_backend() -> bool:
    import jax

    return jax.default_backend() not in _NON_TPU_BACKENDS


def _use_pallas_base(A) -> bool:
    if PALLAS_BASE == "off" or A.dtype != jnp.float32:
        return False
    if PALLAS_BASE == "on":
        return True
    return is_tpu_like_backend()


# There is deliberately NO whole-panel Pallas kernel: a kernel
# factorizing an entire <=256-wide panel (chol + inverse) in one program
# was built in round 3 and MEASURED AND REJECTED on v5e-1 (two
# independent A/Bs, 2026-08-19, one variant per process, in-scan
# timing): the (50,512,512) factorization was 898-921 us with the
# base-32 chain vs 2861-2874 us with the panel kernel, and a single
# (50,128,128) panel program cost 706-730 us on its own — the
# in-kernel sequential 32-step sweep plus block forward substitution
# serializes on the VPU where the chained form lets XLA overlap the
# glue matmuls between the fused 32-wide base programs. Numbers in
# BASELINE.md ("panel kernel A/B"); the kernel was deleted rather than
# kept default-off (an unused kernel on the critical path is risk, not
# value — VERDICT r3).


def _unrolled_chol(A):
    """Right-looking Cholesky with every step unrolled at trace time.

    For small static m this lowers to m dependent-but-fusable VPU ops —
    no While loop, no dynamic slices. Non-PD inputs produce a NaN in
    sqrt that propagates (the branchless -inf LML contract).
    """
    m = A.shape[-1]
    rows = jnp.arange(m)
    cols = []
    M = A
    for j in range(m):
        d = jnp.sqrt(M[..., j, j])
        col = M[..., :, j] / d[..., None]
        col = jnp.where(rows >= j, col, 0.0)
        cols.append(col)
        if j + 1 < m:
            M = M - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def _base_chol(A):
    if BASE_IMPL == "unrolled":
        return _unrolled_chol(A)
    return jnp.linalg.cholesky(A)


def tri_newton_inv(L, m: int | None = None):
    """Exact inverse of a lower-triangular (..., m, m) matrix.

    Newton–Schulz ``X <- X (2I - L X)`` from the diagonal seed; exact in
    ceil(log2(m)) iterations because the residual is nilpotent.
    """
    if m is None:
        m = L.shape[-1]
    iters = max(1, math.ceil(math.log2(m)))
    eye = jnp.eye(m, dtype=L.dtype)
    d = 1.0 / jnp.diagonal(L, axis1=-2, axis2=-1)
    X = eye * d[..., :, None]
    # Newton-Schulz is self-correcting: run the early contraction steps
    # at fast (bf16-pass) matmul precision and only the final two at full
    # f32 precision — the last exact iterations square away the bf16
    # residual (|E| ~ 1e-2 -> 1e-4 -> 1e-8).
    for it in range(iters):
        mm = _mm if it >= iters - 2 else jnp.matmul
        X = mm(X, 2.0 * eye - mm(L, X))
    # the iteration preserves lower-triangularity up to rounding; clamp it
    return jnp.tril(X)


def _chol_inv_recursive(A):
    """(L, L^-1) built together: the sub-inverses the recursion already
    needs for the off-diagonal panel assemble the parent inverse with
    TWO extra matmuls via  inv([[L11,0],[L21,L22]]) =
    [[inv11, 0], [-inv22 (L21 inv11), inv22]]  — replacing the separate
    ceil(log2 n)-iteration Newton inverse of the full block (the
    factorization's serial-op-count bottleneck on TPU)."""
    n = A.shape[-1]
    if n <= _BASE:
        if _use_pallas_base(A):
            from .pallas_chol_base import chol_inv_base

            return chol_inv_base(A)
        L = _base_chol(A)
        return L, tri_newton_inv(L, n)
    h = n // 2
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11, inv11 = _chol_inv_recursive(A11)
    L21 = _mm(A21, jnp.swapaxes(inv11, -1, -2))
    S = A22 - _mm(L21, jnp.swapaxes(L21, -1, -2))
    L22, inv22 = _chol_inv_recursive(S)
    zeros = jnp.zeros_like(A[..., :h, h:])
    L = jnp.concatenate(
        [
            jnp.concatenate([L11, zeros], axis=-1),
            jnp.concatenate([L21, L22], axis=-1),
        ],
        axis=-2,
    )
    inv21 = -_mm(inv22, _mm(L21, inv11))
    inv = jnp.concatenate(
        [
            jnp.concatenate([inv11, zeros], axis=-1),
            jnp.concatenate([inv21, inv22], axis=-1),
        ],
        axis=-2,
    )
    return L, inv


def pick_nb(n: int) -> int:
    """Panel width: 128 up to n=512, 256 beyond (measured v5e optima).

    At n=512, nb=256 measures ~9% faster standalone but ~12% slower
    inside the full MCMC step (it competes with the fused gram kernel
    for VMEM/scheduling), so 128 is the small-n default. At large n
    the fat-panel matmuls dominate: nb=256 wins 30% at (50,2048,2048)
    (27.9 ms, 5.1 TFLOP/s vs 39.9 ms for nb=128; nb=512 is 28.7 ms —
    see benchmarks/bench_scaling.py). ``n`` need not divide evenly:
    the last panel is ragged (the recursive kernel handles any size),
    so every 64-multiple padding bucket gets fat panels.
    """
    return 256 if n > 512 else 128


def _panel_sizes(n: int, nb: int):
    sizes = []
    while n > 0:
        sizes.append(min(nb, n))
        n -= sizes[-1]
    return sizes


def _offsets(sizes):
    out, lo = [], 0
    for s in sizes:
        out.append((lo, lo + s))
        lo += s
    return out


def block_cholesky(A, nb: int | None = None):
    """Lower Cholesky of (..., n, n) via matmul-rich blocking.

    Returns ``(L, diag_invs)`` where ``diag_invs`` is the list of
    inverted diagonal blocks (the last may be ragged when ``nb`` does
    not divide ``n``), reusable by :func:`block_forward_solve` and the
    matrix-RHS solves, which re-derive the panel layout from the
    inverse shapes.
    """
    n = A.shape[-1]
    if nb is None:
        nb = pick_nb(n)
    if n <= nb:
        # whole matrix in one recursion
        L, L_inv = _chol_inv_recursive(A)
        return L, [L_inv]
    M = A
    cols = []
    invs = []
    for lo, hi in _offsets(_panel_sizes(n, nb)):
        D = M[..., lo:hi, lo:hi]
        Ld, Ld_inv = _chol_inv_recursive(D)
        invs.append(Ld_inv)
        below = M[..., hi:, lo:hi]
        P = _mm(below, jnp.swapaxes(Ld_inv, -1, -2))
        col = jnp.concatenate(
            [
                jnp.zeros_like(M[..., :lo, lo:hi]),
                Ld,
                P,
            ],
            axis=-2,
        )
        cols.append(col)
        if hi < n:
            mm_t = _mm if TRAILING_PRECISION is None else (
                lambda a, b: jnp.matmul(a, b, precision=TRAILING_PRECISION)
            )
            tail = M[..., hi:, hi:] - mm_t(P, jnp.swapaxes(P, -1, -2))
            # rebuild M with the updated trailing block only (slices of
            # the old M elsewhere are never read again)
            M = M.at[..., hi:, hi:].set(tail)
    return jnp.concatenate(cols, axis=-1), invs


def _layout_from_invs(invs):
    return _offsets([iv.shape[-1] for iv in invs])


# Vector forward-solve sweep policy: left-looking at <= this many
# panels (chain-LML shapes; measured win, see block_forward_solve),
# right-looking beyond (latency argument + the n=8192 matrix A/B).
_FWD_LEFT_MAX_PANELS = 8


def block_forward_solve(L, invs, y, nb: int | None = None):
    """w = L^-1 y using the cached diagonal-block inverses.

    ``y``: (..., n). A handful of batched (nb x nb) matmuls instead of a
    sequential length-n substitution. The panel layout is derived from
    the inverse shapes (``nb`` is accepted for API compatibility).
    """
    n = L.shape[-1]
    if len(invs) == 1 and invs[0].shape[-1] == n:
        return (_mm(invs[0], y[..., None]))[..., 0]
    spans = _layout_from_invs(invs)
    if len(spans) <= _FWD_LEFT_MAX_PANELS:
        # LEFT-looking at few panels: measured 2.6% faster inside the
        # north-star chain (v5e-1 A/B, bench_chain BENCH_FWD=left:
        # 0.887 vs 0.910-0.912 s warm at n=512, T=4 panels) — the
        # handful of tiny matvecs beats the right-looking form's
        # trailing-slice bookkeeping at this size. Right-looking keeps
        # the many-panel regime (T(T-1)/2 tiny matvecs are latency-
        # bound there; the n=8192 matrix-solve A/B, BASELINE round 4).
        ws = []
        for j, (lo, hi) in enumerate(spans):
            rhs = y[..., lo:hi]
            for k, wk in enumerate(ws):
                klo, khi = spans[k]
                rhs = rhs - (_mm(L[..., lo:hi, klo:khi], wk[..., None]))[
                    ..., 0
                ]
            ws.append((_mm(invs[j], rhs[..., None]))[..., 0])
        return jnp.concatenate(ws, axis=-1)
    r = y
    ws = []
    for j, (lo, hi) in enumerate(spans):
        wj = (_mm(invs[j], r[..., : hi - lo, None]))[..., 0]
        ws.append(wj)
        if hi < n:
            r = r[..., hi - lo :] - (
                _mm(L[..., hi:, lo:hi], wj[..., None])
            )[..., 0]
    return jnp.concatenate(ws, axis=-1)


# NOTE (measured on v5e, r2): a matrix-RHS forward solve that computed
# its own Newton block inverses per call was tried for the prediction
# path and REVERTED — it measured 436k vs 601k acquisition evals/s
# against XLA's substitution. The *cached-inverse* variants below avoid
# that trap: they only apply inverses block_cholesky already produced.

# All solves sweep RIGHT-LOOKING: each panel's solution updates the
# whole remaining right-hand side in one large trailing matmul (T big
# MXU-friendly matmuls) instead of subtracting every previous panel's
# contribution per step (T(T-1)/2 small latency-bound matmuls). The
# historical left-looking form was CUT after the hardware A/B
# (bench_solve_sweep.py, v5e-1: 65.4 vs 68.4 ms chol+solve+solveT at
# n=8192, tie at n=4096 — BASELINE.md round-4 section).


def block_solve_lower_mat(L, invs, Y, nb: int | None = None, precision=None):
    """W = L^-1 Y with cached diagonal-block inverses; Y is (..., n, m).

    ``precision``: optional matmul precision override for this solve
    (default full-f32 HIGHEST; see the std-solve experiment notes in
    BASELINE.md before relaxing it).
    """
    mm = _mm if precision is None else (
        lambda a, b: jnp.matmul(a, b, precision=precision)
    )
    n = L.shape[-1]
    if len(invs) == 1 and invs[0].shape[-1] == n:
        return mm(invs[0], Y)
    spans = _layout_from_invs(invs)
    # right-looking: one trailing update per panel on a shrinking
    # tail — the trapezoid's flops in T large matmuls
    R = Y
    ws = []
    for j, (lo, hi) in enumerate(spans):
        wj = mm(invs[j], R[..., : hi - lo, :])
        ws.append(wj)
        if hi < n:
            R = R[..., hi - lo :, :] - mm(L[..., hi:, lo:hi], wj)
    return jnp.concatenate(ws, axis=-2)


def block_solve_upper_mat(L, invs, Y, nb: int | None = None):
    """X = L^-T Y with cached diagonal-block inverses; Y is (..., n, m)."""
    n = L.shape[-1]
    if len(invs) == 1 and invs[0].shape[-1] == n:
        return _mm(jnp.swapaxes(invs[0], -1, -2), Y)
    spans = _layout_from_invs(invs)
    T = len(spans)
    # bottom-up right-looking: each solved panel updates the whole
    # remaining head in one (lo, nb)@(nb, m) matmul
    R = Y
    xs = [None] * T
    for j in range(T - 1, -1, -1):
        lo, hi = spans[j]
        xj = _mm(jnp.swapaxes(invs[j], -1, -2), R[..., lo:hi, :])
        xs[j] = xj
        if lo > 0:
            R = R[..., :lo, :] - _mm(
                jnp.swapaxes(L[..., lo:hi, :lo], -1, -2), xj
            )
    return jnp.concatenate(xs, axis=-2)


def fast_lml_terms(Kp, y, nb: int | None = None):
    """(log|K|/2 as sum log diag L, |L^-1 y|^2) via the fast factorization."""
    if nb is None:
        nb = pick_nb(Kp.shape[-1])
    L, invs = block_cholesky(Kp, nb=nb)
    w = block_forward_solve(L, invs, y, nb=nb)
    logdiag = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    quad = jnp.sum(w * w, axis=-1)
    return L, logdiag, quad
