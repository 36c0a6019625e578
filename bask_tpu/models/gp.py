"""Functional Gaussian-process core (GPML Algorithm 2.1) on padded data.

This is the TPU-native replacement for the sklearn/skopt
``GaussianProcessRegressor`` machinery the reference inherits
(``bask/bayesgpr.py:18`` subclasses skopt's GPR). Instead of a mutable
estimator, the model is a pair of immutable structs:

* :class:`GPData` — padded training data (static shapes; the BO loop grows
  ``n`` without recompiling by bumping the mask inside a padding bucket),
* :class:`GPPosterior` — per-theta derived state (Cholesky factor, dual
  coefficients), the analogue of sklearn's ``L_``/``alpha_``/``K_inv_``
  attributes that the reference mutates in its ``theta`` setter
  (``bask/bayesgpr.py:200-217``).

All functions are pure and jit/vmap-friendly; gradients of the predictive
mean/std (needed by ``expected_minimum``, reference
``bask/optimizer.py:490-504``) come from autodiff instead of the skopt
fork's hand-written formulas.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.linalg import cho_solve_masked, masked_cholesky, masked_gram

__all__ = [
    "GPData",
    "GPPosterior",
    "make_data",
    "posterior",
    "posterior_and_invs",
    "fused_marginal_grams",
    "log_marginal_likelihood",
    "predict",
    "predict_mean",
    "sample_y",
    "noise_free_theta",
]


class GPData(NamedTuple):
    """Padded, normalized training data."""

    X: jnp.ndarray  # (n_pad, d) inputs (warped space if warping is on)
    y: jnp.ndarray  # (n_pad,) normalized targets, 0 at padded entries
    alpha_diag: jnp.ndarray  # (n_pad,) jitter + noise variance per point
    mask: jnp.ndarray  # (n_pad,) bool
    y_mean: jnp.ndarray  # scalar
    y_std: jnp.ndarray  # scalar


class GPPosterior(NamedTuple):
    """Derived per-theta state."""

    theta: jnp.ndarray  # (n_theta,)
    L: jnp.ndarray  # (n_pad, n_pad) lower Cholesky of masked K
    alpha_dual: jnp.ndarray  # (n_pad,)


def make_data(X, y, alpha_diag, mask, y_mean=0.0, y_std=1.0) -> GPData:
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    mask = jnp.asarray(mask, dtype=bool)
    y = jnp.where(mask, y, 0.0)
    return GPData(
        X=X,
        y=y,
        alpha_diag=jnp.asarray(alpha_diag),
        mask=mask,
        y_mean=jnp.asarray(y_mean, dtype=X.dtype),
        y_std=jnp.asarray(y_std, dtype=X.dtype),
    )


def posterior(kernel, theta, data: GPData) -> GPPosterior:
    """Factorize the training gram for one theta."""
    Kp = masked_gram(kernel, theta, data.X, data.alpha_diag, data.mask)
    L = masked_cholesky(Kp)
    alpha_dual = cho_solve_masked(L, data.y)
    return GPPosterior(theta=theta, L=L, alpha_dual=alpha_dual)


def fused_marginal_grams(kernel, rows, data: GPData, n_warp: int):
    """(S, n_pad, n_pad) masked grams for a batch of hyperposterior rows
    via ONE fused Pallas program — or ``None`` when the fast path does
    not apply (non-f32 data, non-64-multiple bucket, CPU/GPU backend, or
    a kernel outside the fused ``Const*(Matern|RBF)[+White]`` family).

    The marginalized paths (acquisition per-draw predictions, marginal
    ``sample_y``) vmap a per-row ``masked_gram``, which XLA lowers to a
    generic batched gram with several HBM-materialized intermediates;
    this precompute routes them through the same fused kernel the MCMC
    chain uses. Assumes the library-wide prefix-mask padding convention
    (real points first), exactly like the chain's batched LML.

    With warping (``n_warp > 0``) the rows carry per-draw warp
    parameters: the per-draw warped ``X`` feeds the kernel's per-walker
    X mode. Callers still re-warp inside their per-draw body for the
    cross-gram — that VPU recompute is negligible next to the gram.

    Sharded-candidate note: under ``shard_candidates`` GSPMD partitions
    the downstream cross-gram/predict over the candidate axis, while
    this precompute's operands (rows, training X) are replicated — the
    pallas custom call therefore stays replicated per device, the same
    redundancy the vmapped per-draw gram had (no sharded operand feeds
    the kernel, unlike the walker-sharded chain, which needs the
    explicit shard_map in ``batched_lml``).
    """
    from ..ops import pallas_gram as _pg
    from ..ops.fast_cholesky import is_tpu_like_backend

    n_pad = data.X.shape[-2]
    if not (
        data.X.dtype == jnp.float32
        and n_pad % 64 == 0
        and is_tpu_like_backend()
    ):
        return None
    spec = _pg.match_fusable(kernel)
    if spec is None:
        return None
    n_real = jnp.sum(data.mask)
    if n_warp:
        from . import warping as wp

        def _one(x):
            theta_gp, la, lb = wp.split_warp_params(x, n_warp)
            return theta_gp, wp.warp(data.X, la, lb)

        th_gp, Xw = jax.vmap(_one)(rows)
        return _pg.fused_masked_gram_batch(
            spec, th_gp, Xw, data.alpha_diag, n_real
        )
    return _pg.fused_masked_gram_batch(
        spec, rows, data.X, data.alpha_diag, n_real
    )


def posterior_and_invs(kernel, theta, data: GPData, Kp=None):
    """Like :func:`posterior`, additionally returning the cached
    diagonal-block inverses of the factor when the f32 blocked fast path
    applies (else ``None``).

    The inverses come free from ``block_cholesky`` and let
    :func:`predict` replace XLA's latency-bound triangular substitution
    with pure MXU matmuls — the marginalized-acquisition hot path, where
    each hyperposterior draw solves against hundreds of candidates.

    ``Kp``: optional precomputed masked gram for this theta (one row of
    :func:`fused_marginal_grams`); built here when ``None``.
    """
    from ..ops import linalg as _lin

    if Kp is None:
        Kp = masked_gram(kernel, theta, data.X, data.alpha_diag, data.mask)
    if not _lin._use_fast_path(Kp):
        L = masked_cholesky(Kp)
        return GPPosterior(theta=theta, L=L, alpha_dual=cho_solve_masked(L, data.y)), None
    from ..ops.fast_cholesky import (
        block_cholesky,
        block_solve_lower_mat,
        block_solve_upper_mat,
    )

    L, invs = block_cholesky(Kp)
    invs = tuple(invs)
    w = block_solve_lower_mat(L, invs, data.y[..., :, None])
    alpha_dual = block_solve_upper_mat(L, invs, w)[..., 0]
    return GPPosterior(theta=theta, L=L, alpha_dual=alpha_dual), invs


def log_marginal_likelihood(kernel, theta, data: GPData):
    """Scalar LML; -inf when the gram is not positive definite."""
    from ..ops.linalg import masked_lml

    return masked_lml(
        kernel, theta, data.X, data.y, data.alpha_diag, data.mask
    )


def noise_free_theta(kernel, theta, white_index: Optional[int]):
    """theta variant with the WhiteKernel noise set to zero.

    Functional analogue of the reference's ``noise_set_to_zero`` context
    manager (``bask/bayesgpr.py:318-336``): the Cholesky/dual state is NOT
    recomputed — only the prior-variance diagonal used by predict/sample
    changes.
    """
    if white_index is None:
        return theta
    return theta.at[white_index].set(-jnp.inf)


def _cross(kernel, theta, Xq, data: GPData):
    """k(Xq, X_train) with padded columns zeroed: (m, n_pad)."""
    Ks = kernel.eval(theta, Xq, data.X)
    return Ks * data.mask[None, :]


def predict_mean(kernel, theta, post: GPPosterior, data: GPData, Xq):
    """Predictive mean in original y units; (m,)."""
    return predict(kernel, theta, post, data, Xq)


def predict(
    kernel,
    theta_diag,
    post: GPPosterior,
    data: GPData,
    Xq,
    return_std=False,
    return_cov=False,
    invs=None,
):
    """Predictive mean and uncertainty.

    ``theta_diag`` is the theta used for the *prior-variance* diagonal /
    query-query gram — pass ``noise_free_theta(...)`` to predict epistemic
    uncertainty only (the factorized state in ``post`` keeps the noisy
    theta, matching reference semantics where ``noise_set_to_zero`` does
    not recompute ``alpha_``/``K_inv_``).

    ``invs``: optional cached diagonal-block inverses from
    :func:`posterior_and_invs` — routes the cross-gram solve through
    MXU matmuls instead of XLA's substitution. (Computing fresh inverses
    just for this solve measured slower — only pass cached ones.)
    """
    Ks = _cross(kernel, theta_diag, Xq, data)
    # full-f32 matvec: alpha_dual = K^-1 y is oscillatory, bf16 passes
    # lose digits to cancellation (CLAUDE.md rule 5)
    mean = data.y_mean + data.y_std * jnp.matmul(
        Ks, post.alpha_dual, precision=jax.lax.Precision.HIGHEST
    )
    if not (return_std or return_cov):
        return mean
    if invs is not None:
        from ..ops.fast_cholesky import block_solve_lower_mat

        v = block_solve_lower_mat(post.L, invs, Ks.T)  # (n_pad, m)
    else:
        v = solve_triangular(post.L, Ks.T, lower=True)  # (n_pad, m)
    if return_cov:
        Kqq = kernel.eval(theta_diag, Xq, None)
        # Kqq - v^T v is a near-cancelling difference near training
        # points: full precision, like every other solve-adjacent matmul
        cov = (
            Kqq
            - jnp.matmul(v.T, v, precision=jax.lax.Precision.HIGHEST)
        ) * data.y_std**2
        return mean, cov
    var = kernel.diag(theta_diag, Xq) - jnp.sum(v * v, axis=0)
    var = jnp.maximum(var, 0.0)
    return mean, jnp.sqrt(var) * data.y_std


def sample_y(
    kernel,
    theta_diag,
    post: GPPosterior,
    data: GPData,
    Xq,
    key,
    n_samples: int = 1,
    invs=None,
):
    """Draw joint samples from the predictive distribution: (m, n_samples).

    Uses an eigendecomposition factor: posterior covariances over dense
    query grids are rank-deficient (rank <= n_train), where a Cholesky
    needs jitter large enough (especially in float32) to visibly inflate
    the draws. ``sqrt(max(eigvals, 0))`` is exact for PSD matrices with
    no added noise; NaN inputs still propagate to NaN draws.
    """
    mean, cov = predict(
        kernel, theta_diag, post, data, Xq, return_cov=True, invs=invs
    )
    return eigh_draws(mean, cov, key, n_samples)


def eigh_draws(mean, cov, key, n_samples):
    """Joint normal draws from (mean, cov) via the eigen-factor.

    Shared by :func:`sample_y` and the row-sharded distributed path
    (:func:`bask_tpu.ops.dist_chol.row_sharded_sample_y`) so both
    construct draws identically (their bit-comparable-draws parity test
    depends on it)."""
    evals, evecs = jnp.linalg.eigh(cov)
    factor = evecs * jnp.sqrt(jnp.maximum(evals, 0.0))[None, :]
    z = jax.random.normal(key, (mean.shape[0], n_samples), dtype=cov.dtype)
    return mean[:, None] + factor @ z
