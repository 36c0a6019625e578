"""Optimize a noisy 1-D function with the ask/tell loop.

Runnable equivalent of the reference's ``examples/Optimize-1D-function.ipynb``:
PVRS acquisition, 50 candidate points, stopping-rule diagnostics at the
end. The true optimum of the objective is near x=0.9554 (y=-1.4734).

Run:  python examples/optimize_1d.py  (add --cpu to force the CPU backend)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from bask_tpu import Optimizer


def objective(x, rng=np.random.RandomState(42)):
    return float(-(1.4 - 3.0 * x[0]) * np.sin(18.0 * x[0]) + rng.randn() * 0.05)


def main():
    opt = Optimizer(
        dimensions=[(0.0, 1.2)],
        n_points=50,
        n_initial_points=5,
        acq_func="pvrs",
        random_state=0,
    )
    t0 = time.time()
    result = opt.run(
        objective, n_iter=32, n_samples=0, gp_samples=200, gp_burnin=5
    )
    print(f"32 ask/tell iterations: {time.time() - t0:.1f}s")
    print(f"best observed: x={result.x[0]:.4f}  y={result.fun:.4f}")

    from bask_tpu import expected_minimum

    x_exp, y_exp = expected_minimum(result, n_random_starts=50, random_state=0)
    print(f"expected minimum of GP mean: x={x_exp[0]:.4f}  y={y_exp:.4f}")

    prob = opt.probability_of_optimality(
        threshold=0.1, n_space_samples=200, n_gp_samples=100,
        n_random_starts=20, random_state=0,
    )
    print(f"P(current optimum within 0.1 of true): {prob:.2f}")
    intervals = opt.optimum_intervals(random_state=0, space_samples=200)
    print(f"95% HDI for the optimum location: {np.round(intervals[0], 3)}")


if __name__ == "__main__":
    main()
