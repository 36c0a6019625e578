"""Pathwise (decoupled) GP posterior sampling with random Fourier features.

Exact joint posterior draws need an O(m^3) Cholesky of the query-query
covariance, which caps Thompson sampling at a few thousand candidates
(the reference's `sample_y` path, `bask/bayesgpr.py:637-718`). Pathwise
sampling (Wilson et al., "Efficiently Sampling Functions from Gaussian
Process Posteriors", ICML 2020) decouples the draw:

    f~(x) = f0(x) + k(x, X) K^-1 (y - f0(X) - eps),   f0 ~ GP prior (RFF)

where f0 is a weight-space prior sample over M random Fourier features
and eps ~ N(0, noise). Every term is a matmul, so evaluating S samples at
65k+ candidates is MXU work with no large factorization — the scalable
batch-ask path (BASELINE config: 256-point Thompson batch over 65k
candidates).

Spectral sampling: a Matern-nu kernel's spectral measure is a
multivariate Student-t with 2*nu degrees of freedom (Cauchy for nu=1/2,
Gaussian in the RBF limit): omega_d = (z_d / ls_d) * sqrt(2 nu / u),
z ~ N(0,1), u ~ chi^2_{2 nu}.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.pallas_gram import FusedSpec

__all__ = ["sample_frequencies", "pathwise_samples"]


def sample_frequencies(key, spec: FusedSpec, inv_ls, n_features: int):
    """Draw (M, d) spectral frequencies for the fused kernel family."""
    d = inv_ls.shape[0]
    kz, ku = jax.random.split(key)
    z = jax.random.normal(kz, (n_features, d), dtype=inv_ls.dtype)
    if math.isinf(spec.nu):
        scale = jnp.ones((n_features, 1), dtype=inv_ls.dtype)
    else:
        dof = 2.0 * spec.nu
        u = 2.0 * jax.random.gamma(
            ku, dof / 2.0, (n_features, 1), dtype=inv_ls.dtype
        )
        scale = jnp.sqrt(dof / u)
    return z * scale * inv_ls[None, :]


@partial(jax.jit, static_argnames=("spec", "n_features", "n_samples"))
def pathwise_samples(
    spec: FusedSpec,
    theta,
    data,
    L,
    Xq,
    key,
    n_samples: int,
    n_features: int = 1024,
):
    """S pathwise posterior draws at Xq: returns (n_q, n_samples).

    ``theta`` is the consensus log-parameter vector in the fused layout;
    ``data`` a GPData (padded); ``L`` the masked train Cholesky factor
    of the *noisy* kernel. Draws are from the noise-free latent f.
    """
    dt = Xq.dtype
    off = 1 if spec.has_const else 0
    amp = jnp.exp(theta[0]) if spec.has_const else jnp.asarray(1.0, dt)
    inv_ls = jnp.exp(-theta[off : off + spec.n_ls])
    if spec.n_ls == 1:
        inv_ls = jnp.broadcast_to(inv_ls, (data.X.shape[1],))
    noise = (
        jnp.exp(theta[off + spec.n_ls])
        if spec.has_white
        else jnp.asarray(0.0, dt)
    )

    k_freq, k_phase, k_w, k_eps = jax.random.split(key, 4)
    omega = sample_frequencies(k_freq, spec, inv_ls, n_features)  # (M, d)
    phase = jax.random.uniform(
        k_phase, (n_features,), dtype=dt, maxval=2.0 * math.pi
    )
    coef = jnp.sqrt(2.0 * amp / n_features)

    def features(X):  # (n, d) -> (n, M)
        return coef * jnp.cos(
            jnp.matmul(X, omega.T, precision=jax.lax.Precision.HIGHEST)
            + phase[None, :]
        )

    w = jax.random.normal(k_w, (n_features, n_samples), dtype=dt)
    f0_train = features(data.X) @ w  # (n_pad, S)
    f0_query = features(Xq) @ w  # (n_q, S)

    eps = jnp.sqrt(noise + data.alpha_diag)[:, None] * jax.random.normal(
        k_eps, (data.X.shape[0], n_samples), dtype=dt
    )
    resid = jnp.where(
        data.mask[:, None], data.y[:, None] - f0_train - eps, 0.0
    )
    # v = K^-1 resid via the existing masked factor
    v = solve_triangular(
        L.T, solve_triangular(L, resid, lower=True), lower=False
    )

    # noise-free cross-covariance k(Xq, X): White contributes nothing
    from ..ops import kernels as bk  # local import to avoid cycle

    if math.isinf(spec.nu):
        base = bk.RBF(1.0, (1e-5, 1e5))
    else:
        base = bk.Matern(1.0, (1e-5, 1e5), nu=spec.nu)
    ls_theta = theta[off : off + spec.n_ls]
    if spec.n_ls == 1:
        Kq = amp * base.eval(ls_theta, Xq, data.X)
    else:
        base = (
            bk.Matern(tuple([1.0] * spec.n_ls), (1e-5, 1e5), nu=spec.nu)
            if not math.isinf(spec.nu)
            else bk.RBF(tuple([1.0] * spec.n_ls), (1e-5, 1e5))
        )
        Kq = amp * base.eval(ls_theta, Xq, data.X)
    Kq = Kq * data.mask[None, :]

    return f0_query + Kq @ v
