"""Low-discrepancy initial designs: R2 and Steinerberger sequences.

Capability parity with reference ``bask/init.py``: the R2 /
generalized-golden-ratio sequence and the greedy Steinerberger
energy-minimization sequence (Steinerberger 2019) with ``existing_points``
infill. The reference runs 20 scipy L-BFGS restarts per new point
(``bask/init.py:73-88``); here all restarts descend **in parallel** as one
vmapped projected-Adam loop inside jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["r2_sequence", "sb_sequence", "phi"]


def phi(d: int, n_iter: int = 10) -> float:
    """Generalized golden ratio: unique positive root of x^(d+1) = x + 1."""
    if d == 1:
        return 1.61803398874989484820458683436563
    if d == 2:
        return 1.32471795724474602596090885447809
    x = 2.0
    for _ in range(n_iter):
        x = (1 + x) ** (1.0 / (d + 1))
    return x


def r2_sequence(n: int, d: int, seed: float = 0.5) -> np.ndarray:
    """First ``n`` points of the R_d quasi-random sequence in [0,1]^d."""
    g = phi(d)
    alpha = np.array([(1.0 / g) ** (j + 1) % 1.0 for j in range(d)])
    i = np.arange(1, n + 1)[:, None]
    return (seed + alpha[None, :] * i) % 1.0


def _sb_energy(x, X, mask):
    """Steinerberger interaction energy of candidate x against masked X.

    E(x) = sum_i prod_d (1 - log(2 sin(pi |x_d - X_id|))).
    """
    diff = jnp.abs(x[None, :] - X)  # (n, d)
    s = 2.0 * jnp.sin(jnp.pi * diff)
    s = jnp.maximum(s, 1e-12)
    terms = jnp.prod(1.0 - jnp.log(s), axis=-1)
    return jnp.sum(jnp.where(mask, terms, 0.0))


@partial(jax.jit, static_argnames=("n_steps",))
def _sb_next_point(X, mask, starts, n_steps: int = 150, lr: float = 0.02):
    """Vmapped multi-start projected Adam descent of the SB energy."""

    def descend(x0):
        def step(carry, _):
            x, m, v, t = carry
            g = jax.grad(_sb_energy)(x, X, mask)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1.0 - 0.9**t)
            vhat = v / (1.0 - 0.999**t)
            x = x - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
            x = jnp.clip(x, 1e-4, 1.0 - 1e-4)
            return (x, m, v, t + 1.0), None

        (x, _, _, _), _ = jax.lax.scan(
            step,
            (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), 1.0),
            None,
            length=n_steps,
        )
        return x, _sb_energy(x, X, mask)

    xs, es = jax.vmap(descend)(starts)
    best = jnp.argmin(es)
    return xs[best]


def sb_sequence(
    n: int,
    d: int,
    existing_points=None,
    random_state=None,
    restarts: int = 20,
) -> np.ndarray:
    """Greedy Steinerberger low-discrepancy sequence in [0,1]^d.

    With ``existing_points`` given, fills up the space until ``n`` total
    points. Raises ValueError when there is nothing left to generate
    (reference contract, ``bask/init.py:66-71``).
    """
    if not isinstance(random_state, np.random.RandomState):
        random_state = np.random.RandomState(random_state)
    if existing_points is None:
        pts = [np.asarray(random_state.uniform(size=d))]
    else:
        pts = [np.asarray(p, dtype=float) for p in existing_points]
        if len(pts) >= n:
            raise ValueError("No more points left to generate.")

    n_new = n - len(pts)
    # Padded buffer keeps the jitted energy shape static across the greedy
    # loop AND across successive calls with growing n (the BO init phase
    # calls this once per ask) — bucket the capacity so the jit cache hits.
    cap = max(16, ((n + 15) // 16) * 16)
    X = np.zeros((cap, d))
    X[: len(pts)] = np.asarray(pts)
    mask = np.zeros(cap, dtype=bool)
    mask[: len(pts)] = True

    for _ in range(n_new):
        starts = random_state.uniform(size=(restarts, d))
        x = np.asarray(
            _sb_next_point(
                jnp.asarray(X), jnp.asarray(mask), jnp.asarray(starts)
            )
        )
        k = int(mask.sum())
        X[k] = x
        mask[k] = True
    return X[:n].copy()
