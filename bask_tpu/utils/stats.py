"""JAX-traceable distribution helpers.

The reference leans on scipy.stats (halfnorm/invgamma/norm logpdfs as
priors, reference ``bask/utils.py:96``, ``tests/test_acquisition.py``) and
on arviz's HDI estimator (``bask/optimizer.py:685``). Those must be
jit-compatible here because priors are evaluated inside the on-device MCMC
log-probability.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, ndtr

__all__ = [
    "norm_logpdf",
    "norm_pdf",
    "norm_cdf",
    "norm_logcdf",
    "halfnorm_logpdf",
    "invgamma_logpdf",
    "hdi",
]

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def norm_logpdf(x, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return -0.5 * z * z - _LOG_SQRT_2PI - jnp.log(scale)


def norm_pdf(x):
    return jnp.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def norm_cdf(x):
    return ndtr(x)


def norm_logcdf(x):
    # log(ndtr) is numerically fine for x > -10; for the far left tail use
    # the asymptotic expansion log(phi(x)/-x).
    safe = ndtr(jnp.maximum(x, -10.0))
    left = -0.5 * x * x - _LOG_SQRT_2PI - jnp.log(-jnp.minimum(x, -10.0))
    return jnp.where(x > -10.0, jnp.log(safe), left)


def halfnorm_logpdf(x, scale=1.0):
    """log pdf of |N(0, scale^2)| at x >= 0."""
    z = x / scale
    return (
        0.5 * math.log(2.0 / math.pi)
        - jnp.log(scale)
        - 0.5 * z * z
        + jnp.where(x >= 0, 0.0, -jnp.inf)
    )


def invgamma_logpdf(x, a, scale=1.0):
    """log pdf of the inverse-gamma distribution."""
    return (
        a * jnp.log(scale)
        - gammaln(a)
        - (a + 1.0) * jnp.log(x)
        - scale / x
        + jnp.where(x > 0, 0.0, -jnp.inf)
    )


# ---------------------------------------------------------------------------
# Highest-density intervals (host-side diagnostic; replaces arviz.hdi)
# ---------------------------------------------------------------------------


def _hdi_unimodal(samples: np.ndarray, hdi_prob: float) -> np.ndarray:
    x = np.sort(samples)
    n = len(x)
    k = max(int(np.floor(hdi_prob * n)), 1)
    if k >= n:
        return np.array([x[0], x[-1]])
    widths = x[k:] - np.asarray(x[: n - k])
    i = int(np.argmin(widths))
    return np.array([x[i], x[i + k]])


def _silverman_bw(x: np.ndarray) -> float:
    n = len(x)
    s = np.std(x)
    iqr = np.subtract(*np.percentile(x, [75, 25])) / 1.34
    a = min(s, iqr) if iqr > 0 else s
    # Floor the bandwidth: optimum samples often sit on a finite candidate
    # grid, where many coincident values would otherwise collapse the KDE.
    span = np.ptp(x)
    floor = max(span * 1e-3, 1e-9)
    return max(0.9 * a * n ** (-0.2), floor)


def _hdi_multimodal(
    samples: np.ndarray, hdi_prob: float, n_grid: int = 1024
) -> np.ndarray:
    """KDE-based multimodal HDI: the density super-level set covering
    ``hdi_prob`` of the mass, reported as a list of intervals."""
    x = np.asarray(samples, dtype=float)
    bw = _silverman_bw(x)
    lo, hi = x.min() - 3 * bw, x.max() + 3 * bw
    grid = np.linspace(lo, hi, n_grid)
    dens = np.exp(
        -0.5 * ((grid[:, None] - x[None, :]) / bw) ** 2
    ).sum(axis=1) / (len(x) * bw * math.sqrt(2 * math.pi))
    dens_n = dens / dens.sum()
    order = np.argsort(dens_n)[::-1]
    csum = np.cumsum(dens_n[order])
    cutoff_idx = np.searchsorted(csum, hdi_prob)
    level = dens_n[order[min(cutoff_idx, n_grid - 1)]]
    above = dens_n >= level
    intervals = []
    start = None
    for i, flag in enumerate(above):
        if flag and start is None:
            start = i
        elif not flag and start is not None:
            intervals.append([grid[start], grid[i - 1]])
            start = None
    if start is not None:
        intervals.append([grid[start], grid[-1]])
    return np.array(intervals)


def hdi(samples, hdi_prob: float = 0.95, multimodal: bool = True):
    """Highest-density interval(s) of 1-D samples.

    Replacement for ``arviz.hdi`` as used by the reference's
    ``optimum_intervals`` (``bask/optimizer.py:685``). Returns shape
    (n_modes, 2) when ``multimodal`` else (2,).
    """
    samples = np.asarray(samples, dtype=float).ravel()
    if multimodal:
        return _hdi_multimodal(samples, hdi_prob)
    return _hdi_unimodal(samples, hdi_prob)
