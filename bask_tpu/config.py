"""Global configuration for bask-tpu.

The library computes in ``float64`` when JAX x64 mode is enabled (CPU parity
testing against the NumPy/SciPy reference) and in ``float32`` otherwise (the
TPU fast path; TPU float64 is emulated and slow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_dtype", "JITTERS"]

# Jitter ladder used when a Cholesky factorization fails for the consensus
# model (mirrors the "increase alpha" advice in the reference,
# bask/bayesgpr.py:209-216, but done automatically and branchlessly).
JITTERS = (0.0, 1e-10, 1e-8, 1e-6, 1e-4)


def default_dtype() -> jnp.dtype:
    """Floating dtype used for all GP math."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
