"""Masked/batched GP linear algebra (GPML Algorithm 2.1, TPU-first).

The reference computes one Cholesky + two triangular solves per
log-marginal-likelihood call, serially per MCMC walker (reference
``bask/bayesgpr.py:374``, sklearn GPR internals). Here every primitive is
written over a *padded* training set with a boolean mask so that

* shapes stay static while the BO loop grows the data (no recompiles —
  the data is padded to a bucket size), and
* a whole walker ensemble evaluates its LMLs in one batched call
  (``vmap`` over theta), which XLA maps onto batched Cholesky kernels.

Masking scheme: rows/columns of padded points are replaced by identity
rows, and the padded entries of ``y`` are zero. The Cholesky factor is then
block-diagonal with an identity block, contributing 0 to both the
log-determinant and the quadratic form, so the masked LML equals the LML of
the unpadded problem exactly.

A failed factorization (non-PD K) produces NaNs in the factor; those are
detected branchlessly and turned into ``-inf`` LML, matching the
reference's try/except ValueError -> -inf semantics
(``bask/bayesgpr.py:373-379``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "masked_gram",
    "masked_cholesky",
    "masked_lml",
    "cho_solve_masked",
    "augmented_quadform",
]

_LOG2PI = math.log(2.0 * math.pi)

# The matmul-only blocked Cholesky (see fast_cholesky.py) is the default
# float32 hot path for large padded grams: in the full MCMC program it
# runs the north-star bench at 2.61s vs 4.54s with XLA's native
# cholesky+triangular-solve (the matmul-only forward solve avoids the
# latency-bound batched substitution). float64 / small problems stay on
# the (bit-accurate vs LAPACK) XLA factorization.
# Override: "on" / "off" / "auto" (auto = on for f32 when shapes allow).
FAST_CHOLESKY = "auto"


def _use_fast_path(Kp) -> bool:
    if FAST_CHOLESKY == "off":
        return False
    n = Kp.shape[-1]
    # any 64-multiple (the padding-bucket granularity): block_cholesky
    # handles a ragged last panel, so 576/832/... qualify too
    shape_ok = n >= 128 and n % 64 == 0
    if FAST_CHOLESKY == "on":
        return shape_ok
    return shape_ok and Kp.dtype == jnp.float32


def masked_gram(kernel, theta, X, alpha_diag, mask):
    """Build K + diag(alpha) with identity rows for padded entries.

    Parameters
    ----------
    kernel : Kernel spec
    theta : (n_theta,) log-space hyperparameters
    X : (n_pad, d) padded training inputs
    alpha_diag : (n_pad,) per-point jitter/noise variance
    mask : (n_pad,) bool, True for real points
    """
    K = kernel.eval(theta, X)
    m2 = jnp.outer(mask, mask)
    Kp = jnp.where(m2, K, 0.0)
    diag = jnp.where(mask, jnp.diagonal(K) + alpha_diag, 1.0)
    return Kp - jnp.diag(jnp.diagonal(Kp)) + jnp.diag(diag)


def masked_cholesky(Kp):
    """Lower Cholesky of the masked gram. NaNs signal non-PD."""
    return jnp.linalg.cholesky(Kp)


def cho_solve_masked(L, B):
    """Solve K x = B given the (masked) lower factor L."""
    w = solve_triangular(L, B, lower=True)
    return solve_triangular(L.T, w, lower=False)


def masked_lml(kernel, theta, X, y, alpha_diag, mask):
    """Log marginal likelihood of the masked problem; -inf on failure.

    ``y`` must be zero at padded entries. Returns a scalar. Uses the
    single-forward-solve form  y^T K^-1 y = |L^-1 y|^2  (one triangular
    solve instead of the two a cho_solve would need — triangular solves
    are latency-bound on TPU).
    """
    Kp = masked_gram(kernel, theta, X, alpha_diag, mask)
    n = jnp.sum(mask)
    if _use_fast_path(Kp):
        from .fast_cholesky import fast_lml_terms

        _, logdiag, quad = fast_lml_terms(Kp, y)
        lml = -0.5 * quad - logdiag - 0.5 * n * _LOG2PI
        return jnp.where(jnp.isfinite(lml), lml, -jnp.inf)
    L = masked_cholesky(Kp)
    w = solve_triangular(L, y, lower=True)
    lml = (
        -0.5 * jnp.sum(w * w)  # elementwise, not a bf16-pass dot
        - jnp.sum(jnp.where(mask, jnp.log(jnp.diagonal(L)), 0.0))
        - 0.5 * n * _LOG2PI
    )
    return jnp.where(jnp.isfinite(lml), lml, -jnp.inf)


# HBM budget for one walker-batch of (chunk, n_pad, n_pad) grams: the
# factorization holds roughly gram + factor + block inverses + panel
# temps alive at once (~4x the gram bytes), so 2 GB of gram batch keeps
# the working set near 8 GB — comfortable on a 16 GB v5e chip. Large-n
# full ensembles (e.g. n=4096, W=100: 6.7 GB of grams alone) exceed it
# and are split into equal walker chunks inside a lax.map — identical
# per-walker results (each walker's gram/factorization/reductions are
# independent), graceful memory instead of an OOM. The north-star shape
# (100, 512, 512) is ~100 MB and never chunks.
LML_MAX_BATCH_BYTES = 2_000_000_000


def _lml_chunk_walkers(n_pad: int, itemsize: int, W: int) -> int:
    per_walker = n_pad * n_pad * itemsize
    return max(1, min(W, int(LML_MAX_BATCH_BYTES // per_walker)))


def _lml_batch_direct(kernel, spec, thetas, X, y, alpha_diag, mask):
    """One unchunked walker batch (fused Pallas gram or vmap fallback)."""
    if spec is not None:
        from . import pallas_gram as pg

        n_real = jnp.sum(mask)
        # LOWER_GRAM: the factorization reads only the lower triangle,
        # so the symmetric-half kernel can skip the upper tiles (see
        # pallas_gram.LOWER_GRAM; default picked by measurement)
        if pg.LOWER_GRAM == "on" and X.shape[-2] % pg._SQ_TILE == 0:
            Kp = pg.fused_masked_gram_lower_batch(
                spec, thetas, X, alpha_diag, n_real
            )
        else:
            Kp = pg.fused_masked_gram_batch(
                spec, thetas, X, alpha_diag, n_real
            )
        return batched_lml_from_gram(Kp, y, mask)
    if X.ndim == 3:
        return jax.vmap(
            lambda t, Xi: masked_lml(kernel, t, Xi, y, alpha_diag, mask)
        )(thetas, X)
    return jax.vmap(lambda t: masked_lml(kernel, t, X, y, alpha_diag, mask))(
        thetas
    )


def batched_lml(kernel, thetas, X, y, alpha_diag, mask, mesh=None):
    """LML for a batch of thetas: (W, n_theta) -> (W,).

    Fast path: when the kernel matches the fusable
    ``Constant*(Matern|RBF)[+White]`` structure and shapes/dtype allow,
    the whole batch's masked grams come from one Pallas kernel
    (:mod:`bask_tpu.ops.pallas_gram`) and the factorizations from one
    batched Cholesky. ``X`` may be (n_pad, d) or per-walker
    (W, n_pad, d) (input warping). Falls back to a vmapped scalar path.

    When the (W, n_pad, n_pad) gram batch would blow the HBM budget
    (``LML_MAX_BATCH_BYTES``), the walker axis is processed in equal
    chunks inside a ``lax.map`` — bit-identical results, bounded memory.

    ``mesh``: optional single-axis ``jax.sharding.Mesh``. The whole
    per-walker pipeline (gram -> factorization -> LML reduction) is then
    wrapped in ``shard_map`` over the walker axis: each device runs the
    Pallas gram kernel on its LOCAL walker shard. This is load-bearing
    on multi-chip hardware — a ``pallas_call`` is a custom call that
    GSPMD cannot partition, so under automatic sharding it would be
    computed from gathered (replicated) operands instead of scaling
    with the mesh. The per-walker results are identical either way (no
    cross-walker reductions exist), and the HBM chunk budget naturally
    applies to the per-device shard. The mesh size should divide the
    walker count for even shards (``BayesGPR.sample(mesh=)`` rounds the
    ensemble to multiples of 2x the device count; shard_map tolerates
    uneven shards by padding, but even shards keep every device busy).
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        xspec = P(ax, None, None) if X.ndim == 3 else P(None, None)
        # check_vma=False: the local body contains a pallas_call, whose
        # outputs carry no varying-mesh-axes annotation — the default
        # replication check rejects it (measured on v5e-1; the CPU mesh
        # tests never see it because the Pallas path is TPU-gated).
        # The body has no collectives, so the check adds nothing here.
        fn = jax.shard_map(
            partial(_batched_lml_impl, kernel),
            mesh=mesh,
            in_specs=(P(ax, None), xspec, P(None), P(None), P(None)),
            out_specs=P(ax),
            check_vma=False,
        )
        return fn(thetas, X, y, alpha_diag, mask)
    return _batched_lml_impl(kernel, thetas, X, y, alpha_diag, mask)


def _batched_lml_impl(kernel, thetas, X, y, alpha_diag, mask):
    n_pad = X.shape[-2]
    # any 64-multiple bucket: the Pallas gram picks the largest divisor
    # tile (256 preferred, benchmarks/bench_gram_tile.py)
    from .fast_cholesky import is_tpu_like_backend

    fusable = (
        X.dtype == jnp.float32
        and n_pad % 64 == 0
        and is_tpu_like_backend()
    )
    spec = None
    if fusable:
        from .pallas_gram import match_fusable

        spec = match_fusable(kernel)

    W, D = thetas.shape
    chunk = _lml_chunk_walkers(n_pad, X.dtype.itemsize, W)
    if chunk >= W:
        return _lml_batch_direct(kernel, spec, thetas, X, y, alpha_diag, mask)

    k = -(-W // chunk)
    pad = k * chunk - W
    if pad:
        thetas = jnp.concatenate(
            [thetas, jnp.broadcast_to(thetas[:1], (pad, D))]
        )
    thetas_c = thetas.reshape(k, chunk, D)
    if X.ndim == 3:
        Xw = X
        if pad:
            Xw = jnp.concatenate(
                [Xw, jnp.broadcast_to(Xw[:1], (pad,) + Xw.shape[1:])]
            )
        Xc = Xw.reshape((k, chunk) + Xw.shape[1:])

        out = jax.lax.map(
            lambda args: _lml_batch_direct(
                kernel, spec, args[0], args[1], y, alpha_diag, mask
            ),
            (thetas_c, Xc),
        )
    else:
        out = jax.lax.map(
            lambda t: _lml_batch_direct(
                kernel, spec, t, X, y, alpha_diag, mask
            ),
            thetas_c,
        )
    return out.reshape(-1)[:W]


def batched_lml_from_gram(Kp, y, mask):
    """(B, n, n) masked grams -> (B,) LMLs; one batched factorization."""
    n = jnp.sum(mask)
    if _use_fast_path(Kp):
        from .fast_cholesky import fast_lml_terms

        _, logdiag, quad = fast_lml_terms(Kp, jnp.broadcast_to(y, Kp.shape[:1] + y.shape))
        lml = -0.5 * quad - logdiag - 0.5 * n * _LOG2PI
        return jnp.where(jnp.isfinite(lml), lml, -jnp.inf)
    L = jnp.linalg.cholesky(Kp)
    w = solve_triangular(
        L, jnp.broadcast_to(y, Kp.shape[:1] + y.shape)[..., None], lower=True
    )[..., 0]
    lml = (
        -0.5 * jnp.sum(w * w, axis=-1)
        - jnp.sum(
            jnp.where(
                mask[None, :],
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                0.0,
            ),
            axis=-1,
        )
        - 0.5 * n * _LOG2PI
    )
    return jnp.where(jnp.isfinite(lml), lml, -jnp.inf)


def augmented_quadform(L, l_cand, d_cand, A_sol, b):
    """Batched quadratic forms against rank-1-augmented Cholesky factors.

    For each candidate ``c`` the (n+1)x(n+1) augmented kernel matrix

        K_aug(c) = [[K, k_c], [k_c^T, k_cc]]

    has lower factor [[L, 0], [l_c^T, d_c]] with ``l_c = L^{-1} k_c`` and
    ``d_c = sqrt(k_cc - |l_c|^2)``. The predictive-variance-reduction
    acquisitions (reference ``bask/acquisition.py:277-339``) need, for m
    probe points with cross-kernel rows ``[A_p, b_cp]``,

        q_cp = [A_p, b_cp] K_aug(c)^{-1} [A_p, b_cp]^T
             = |L^{-1} A_p^T|^2 + ((b_cp - l_c . (L^{-1}A^T)_p) / d_c)^2.

    The reference loops a fresh O(n^3) Cholesky per candidate; this closed
    form needs only the shared factor ``L`` and matmuls, so all candidates
    evaluate in one fused pass.

    Parameters
    ----------
    L : (n, n) lower factor of the base K
    l_cand : (n, C) = L^{-1} k(X_train, X_cand)
    d_cand : (C,) augmented pivots
    A_sol : (n, m) = L^{-1} k(X_train, P)^T for the m probe points
    b : (m, C) cross kernel k(P, X_cand)

    Returns
    -------
    (C,) summed quadratic forms  sum_p q_cp  per candidate.
    """
    base = jnp.sum(A_sol * A_sol)  # sum_p |L^{-1} A_p^T|^2
    # (m, C): b_cp - (A_sol^T l_cand)_pc — near-cancelling difference
    # then divided by d_cand: full f32 precision required (CLAUDE.md 5)
    resid = b - jnp.matmul(
        A_sol.T, l_cand, precision=jax.lax.Precision.HIGHEST
    )
    extra = jnp.sum((resid / d_cand[None, :]) ** 2, axis=0)
    return base + extra
