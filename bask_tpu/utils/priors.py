"""Hyperparameter priors (jit-compatible) and the prior-guessing logic.

Capability parity with the reference's ``bask/priors.py`` (round-flat
prior) and ``bask/utils.py:68-179`` (``guess_priors`` over a composite
kernel). All returned priors are functions of the *log-space* theta entry
and are traceable, so the whole MCMC log-probability stays on device.

The round-flat normalization constant is computed once at construction
time with a fixed Gauss-Legendre quadrature (no scipy dependency inside
jit; matches scipy.integrate.quad to ~1e-10 for these smooth integrands).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops import kernels as bk
from .stats import halfnorm_logpdf

__all__ = [
    "make_roundflat",
    "guess_priors",
    "construct_default_kernel",
    "signal_variance_prior",
    "lengthscale_prior",
]


def make_roundflat(
    lower_bound: float = 0.1,
    upper_bound: float = 0.6,
    lower_steepness: float = 2.0,
    upper_steepness: float = 8.0,
    integration_bounds=(0.0, 10.0),
):
    """Log-density that is ~flat on (lower_bound, upper_bound) and drops
    steeply (polynomially in log-density) outside.

    Same density family as the reference (``bask/priors.py:42-46``),
    normalized so exp(prior) integrates to 1 over ``integration_bounds``.
    """

    def _log_unnorm(x):
        return -2.0 * (
            (x / lower_bound) ** (-2.0 * lower_steepness)
            + (x / upper_bound) ** (2.0 * upper_steepness)
        )

    # Gauss-Legendre normalization on the host at construction time.
    lo, hi = integration_bounds
    nodes, weights = np.polynomial.legendre.leggauss(512)
    xs = 0.5 * (hi - lo) * nodes + 0.5 * (hi + lo)
    with np.errstate(divide="ignore", over="ignore"):
        vals = np.exp(
            -2.0
            * (
                (xs / lower_bound) ** (-2.0 * lower_steepness)
                + (xs / upper_bound) ** (2.0 * upper_steepness)
            )
        )
    log_norm = math.log(float(np.sum(weights * vals) * 0.5 * (hi - lo)))

    def prior(x):
        return _log_unnorm(x) - log_norm

    return prior


def signal_variance_prior(x):
    """Half-normal(scale=2) prior on the *amplitude* with log-space
    change of variables; applied to Constant/White kernel log-params
    (same model as reference ``bask/utils.py:95-99``)."""
    return halfnorm_logpdf(jnp.sqrt(jnp.exp(x)), scale=2.0) + x / 2.0 - math.log(2.0)


_DEFAULT_ROUNDFLAT = make_roundflat(
    lower_bound=0.1,
    upper_bound=0.6,
    lower_steepness=2.0,
    upper_steepness=8.0,
)


def lengthscale_prior(x):
    """Round-flat prior on a lengthscale given in log space (reference
    ``bask/utils.py:100-120``)."""
    return _DEFAULT_ROUNDFLAT(jnp.exp(x)) + x


def guess_priors(kernel: bk.Kernel):
    """One log-prior callable per free theta entry of ``kernel``.

    Traverses the kernel spec tree in theta order (same convention the
    reference documents for sklearn kernels): half-normal amplitude
    priors for Constant/White, round-flat for every RBF/Matern
    lengthscale. Raises for kernels without a known prior model.
    """
    priors = []
    for leaf in bk.iter_leaves(kernel):
        if leaf.n_theta == 0:
            continue
        if isinstance(leaf, (bk.ConstantKernel, bk.WhiteKernel)):
            priors.append(signal_variance_prior)
        elif isinstance(leaf, bk.RBF):  # Matern subclasses RBF
            priors.extend([lengthscale_prior] * leaf.n_theta)
        else:
            raise NotImplementedError(
                f"No default prior for kernel leaf {type(leaf).__name__}"
            )
    return priors


def construct_default_kernel(dimensions) -> bk.Kernel:
    """Default BO kernel: scaled anisotropic Matern-5/2 (capability parity
    with reference ``bask/utils.py:127-151``)."""
    n = len(dimensions)
    return bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * n), (0.2, 0.5), nu=2.5
    )
