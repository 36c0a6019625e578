"""Optimization result container and expected-minimum search.

Replaces the skopt helpers the reference imports (``create_result``,
``expected_minimum``; reference ``bask/optimizer.py:7-13,490-504``). The
expected-minimum search is a multistart refinement of the GP posterior
mean using the autodiff gradients the GP core provides.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import OptimizeResult

__all__ = ["create_result", "expected_minimum"]


def create_result(Xi, yi, space, rng, models=None) -> OptimizeResult:
    """Bundle observations + model into a scipy OptimizeResult."""
    yi = np.asarray(yi, dtype=float)
    res = OptimizeResult()
    if len(yi):
        best = int(np.argmin(yi))
        res.x = Xi[best]
        res.fun = yi[best]
    else:
        res.x, res.fun = None, None
    res.func_vals = yi
    res.x_iters = list(Xi)
    res.models = list(models) if models else []
    res.space = space
    res.random_state = rng
    res.specs = {}
    return res


def expected_minimum(
    res: OptimizeResult, n_random_starts: int = 20, random_state=None
):
    """Minimize the GP posterior mean over the space.

    Multistart strategy: sample candidate starts (always including the
    best observed point), refine the non-categorical case with L-BFGS-B
    on the transformed [0,1]^d cube using the GP's autodiff mean
    gradients; categorical spaces fall back to dense random sampling.

    Returns ``(x_best, fun_best)`` in the original space.
    """
    from scipy.optimize import minimize

    space = res.space
    gp = res.models[-1]
    if not isinstance(random_state, np.random.RandomState):
        random_state = np.random.RandomState(random_state)

    if space.is_partly_categorical:
        cand = space.rvs(
            n_samples=max(10 * n_random_starts, 1000),
            random_state=random_state,
        )
        mu = gp.predict(space.transform(cand))
        i = int(np.argmin(mu))
        return cand[i], float(mu[i])

    d = space.transformed_n_dims
    starts = [space.transform([res.x])[0]] if res.x is not None else []
    starts.extend(random_state.uniform(size=(n_random_starts, d)))

    def f(u):
        mu, grad = gp.predict(
            u[None, :], return_mean_grad=True
        )
        return float(mu[0]), np.asarray(grad[0], dtype=float)

    best_u, best_v = None, np.inf
    for u0 in starts:
        r = minimize(
            f, u0, jac=True, method="L-BFGS-B", bounds=[(0.0, 1.0)] * d
        )
        if r.fun < best_v:
            best_u, best_v = r.x, r.fun
    x = space.inverse_transform(best_u[None, :])[0]
    return x, float(best_v)
