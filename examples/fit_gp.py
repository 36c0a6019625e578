"""Fit a fully-Bayesian GP to noisy 1-D data.

Runnable equivalent of the reference's ``examples/Fit-GP.ipynb``: n=100
noisy observations of a 1-D function, 100 stretch-move walkers, burn-in,
hyperposterior collection, then mean/uncertainty readout.

Run:  python examples/fit_gp.py  (add --cpu to force the CPU backend)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from bask_tpu import BayesGPR
from bask_tpu.ops.kernels import ConstantKernel, Matern


def f(x):
    return np.sin(2 * np.pi * x) + 0.5 * np.cos(6 * np.pi * x)


def main():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(100, 1))
    y = f(X[:, 0]) + 0.2 * rng.randn(100)

    kernel = ConstantKernel(1.0, (0.1, 2.0)) * Matern(
        0.3, (0.05, 0.8), nu=2.5
    )
    gp = BayesGPR(kernel=kernel, random_state=1)

    t0 = time.time()
    gp.fit(X, y, n_burnin=100, n_desired_samples=100)
    print(f"fit wall-clock: {time.time() - t0:.1f}s")
    print(f"chain: {gp.chain_.shape}, acceptance "
          f"{gp.n_accepted_ / gp.n_proposals_:.2f}")
    print(f"consensus theta (log): {np.round(gp.theta, 3)}")
    print(f"noise estimate: {gp.noise_:.4f} (true 0.04)")

    Xq = np.linspace(0, 1, 11)[:, None]
    mean, std = gp.predict(Xq, return_std=True)
    for xq, m, s, t in zip(Xq[:, 0], mean, std, f(Xq[:, 0])):
        print(f"  x={xq:.1f}  pred={m:+.3f} ± {s:.3f}  true={t:+.3f}")


if __name__ == "__main__":
    main()
