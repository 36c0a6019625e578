"""Global configuration helpers for bask-tpu.

The library computes in ``float64`` when JAX x64 mode is enabled (CPU
parity testing against the NumPy/SciPy reference) and in ``float32``
otherwise (the TPU fast path; TPU float64 is emulated and slow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_dtype"]


def default_dtype() -> jnp.dtype:
    """Floating dtype used for all GP math."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
