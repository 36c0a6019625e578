"""On-device affine-invariant ensemble MCMC (stretch move).

The reference drives emcee's ``EnsembleSampler`` with a Python
log-probability that does one Cholesky per walker per step, serially
(reference ``bask/bayesgpr.py:510-524``; the hot loop flagged in
SURVEY.md §3.1). Here the whole ensemble advances inside one
``lax.scan``:

* each step does the two complementary-half stretch-move updates
  (Goodman & Weare 2010, the same algorithm family emcee implements),
* the log-probability is evaluated for all active walkers at once via
  ``vmap`` — one *batched* Cholesky instead of W serial ones,
* the walker axis is shardable: under a ``jax.sharding.Mesh`` the
  batched log-prob is pure data parallelism, and the only cross-walker
  communication is the complementary-half gather (an all-gather of a
  (W/2, D) matrix — bytes, not megabytes — riding ICI).

Detailed-balance notes: the stretch factor is z = ((a-1)u + 1)^2 / a
with density g(z) ∝ 1/sqrt(z) on [1/a, a]; the acceptance factor is
z^(D-1) * exp(lp(prop) - lp(curr)). Proposals with -inf log-prob are
rejected branchlessly (NaN-safe comparison).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EnsembleState", "init_ensemble", "run_ensemble", "stretch_step"]


class EnsembleState(NamedTuple):
    pos: jnp.ndarray  # (W, D) walker positions
    log_prob: jnp.ndarray  # (W,)
    accepted: jnp.ndarray  # scalar int: total accepted moves


def init_ensemble(log_prob_fn: Callable, pos: jnp.ndarray) -> EnsembleState:
    """``log_prob_fn`` maps a walker batch (W, D) -> (W,).

    Batched (not per-walker) so implementations can use one fused gram +
    batched factorization for the whole half-ensemble; wrap a scalar
    function with ``jax.vmap`` if needed.
    """
    lp = log_prob_fn(pos)
    return EnsembleState(
        pos=pos,
        log_prob=lp,
        accepted=jnp.zeros((), dtype=jnp.int32),
    )


def _half_update(log_prob_fn, active, lp_active, other, key, a, ndim):
    """Stretch-move update of ``active`` walkers against ``other``."""
    h = active.shape[0]
    k_partner, k_z, k_accept = jax.random.split(key, 3)
    partners = jax.random.randint(k_partner, (h,), 0, other.shape[0])
    u = jax.random.uniform(k_z, (h,), dtype=active.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    anchor = other[partners]  # cross-half gather (all-gather when sharded)
    prop = anchor + z[:, None] * (active - anchor)
    lp_prop = log_prob_fn(prop)
    log_ratio = (ndim - 1.0) * jnp.log(z) + lp_prop - lp_active
    accept = jnp.log(jax.random.uniform(k_accept, (h,), dtype=active.dtype)) < log_ratio
    new_active = jnp.where(accept[:, None], prop, active)
    new_lp = jnp.where(accept, lp_prop, lp_active)
    return new_active, new_lp, jnp.sum(accept).astype(jnp.int32)


def stretch_step(
    log_prob_fn: Callable, state: EnsembleState, key, a: float = 2.0
) -> EnsembleState:
    """One full ensemble step (both complementary halves)."""
    W, D = state.pos.shape
    half = W // 2
    k0, k1 = jax.random.split(key)

    first, second = state.pos[:half], state.pos[half:]
    lp_first, lp_second = state.log_prob[:half], state.log_prob[half:]

    first, lp_first, acc0 = _half_update(
        log_prob_fn, first, lp_first, second, k0, a, D
    )
    second, lp_second, acc1 = _half_update(
        log_prob_fn, second, lp_second, first, k1, a, D
    )
    return EnsembleState(
        pos=jnp.concatenate([first, second]),
        log_prob=jnp.concatenate([lp_first, lp_second]),
        accepted=state.accepted + acc0 + acc1,
    )


@partial(jax.jit, static_argnames=("log_prob_fn", "n_steps", "a"))
def run_ensemble(
    log_prob_fn: Callable,
    pos0: jnp.ndarray,
    key,
    n_steps: int,
    a: float = 2.0,
):
    """Run ``n_steps`` full ensemble steps from ``pos0``.

    ``log_prob_fn`` must be *batched*: (W, D) -> (W,).

    Returns ``(chain, final_state)`` with ``chain`` of shape
    (n_steps, W, D) — one sample per walker per step, matching emcee's
    ``get_chain`` layout so downstream discard/thin/flatten semantics
    carry over (reference ``bask/bayesgpr.py:528-534``).
    """
    state0 = init_ensemble(log_prob_fn, pos0)
    keys = jax.random.split(key, n_steps)

    def step(state, k):
        new = stretch_step(log_prob_fn, state, k, a=a)
        return new, new.pos

    final, chain = jax.lax.scan(step, state0, keys)
    return chain, final


def flatten_chain(chain, discard: int = 0, thin: int = 1):
    """(n_steps, W, D) -> (n_kept * W, D), step-major like emcee flat=True.

    Matches emcee's ``get_chain(discard=, thin=)`` sample selection
    exactly: the kept steps are ``discard + thin - 1, discard +
    2*thin - 1, ...`` (emcee ``backends/backend.py`` slices
    ``[discard + thin - 1 :: thin]``).
    """
    kept = chain[discard + thin - 1 :: thin]
    return kept.reshape(-1, chain.shape[-1])
