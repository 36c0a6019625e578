"""Secondary benchmark (BASELINE.json config 3): MES + PVRS acquisition
on Hartmann-6, marginalized over 100 hyperposterior GP samples.

Measures the wall-clock of one full marginalized `evaluate_acquisitions`
pass over a 512-point candidate grid after fitting the GP on 64
Hartmann-6 observations, plus the per-iteration acquisition throughput.

Run:  python benchmarks/bench_acq.py [--cpu]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

ALPHA_H = np.array([1.0, 1.2, 3.0, 3.2])
A_H = np.array(
    [
        [10, 3, 17, 3.5, 1.7, 8],
        [0.05, 10, 17, 0.1, 8, 14],
        [3, 3.5, 1.7, 10, 17, 8],
        [17, 8, 0.05, 10, 0.1, 14],
    ]
)
P_H = 1e-4 * np.array(
    [
        [1312, 1696, 5569, 124, 8283, 5886],
        [2329, 4135, 8307, 3736, 1004, 9991],
        [2348, 1451, 3522, 2883, 3047, 6650],
        [4047, 8828, 8732, 5743, 1091, 381],
    ]
)


def hartmann6(x):
    inner = np.sum(A_H * (x[None, :] - P_H) ** 2, axis=1)
    return -float(np.sum(ALPHA_H * np.exp(-inner)))


def main():
    from bask_tpu import MaxValueSearch, PVRS, evaluate_acquisitions
    from bask_tpu.models.bayesgpr import BayesGPR
    from bask_tpu.utils.priors import construct_default_kernel

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(64, 6))
    y = np.array([hartmann6(x) for x in X])

    gp = BayesGPR(
        kernel=construct_default_kernel(list(range(6))), random_state=0
    )
    t0 = time.perf_counter()
    gp.fit(X, y, n_burnin=10, n_desired_samples=100, progress=False)
    fit_s = time.perf_counter() - t0

    Xc = rng.uniform(size=(512, 6))
    acqs = [MaxValueSearch(), PVRS()]

    # warm-up/compile, then timed passes
    evaluate_acquisitions(Xc, gp, acqs, n_samples=100, random_state=1)
    t0 = time.perf_counter()
    reps = 5
    for r in range(reps):
        out = evaluate_acquisitions(
            Xc, gp, acqs, n_samples=100, random_state=2 + r
        )
    per_pass = (time.perf_counter() - t0) / reps
    assert np.isfinite(out).all()

    print(
        json.dumps(
            {
                "metric": "mes_pvrs_hartmann6_100samples_512cands",
                "value": round(per_pass, 4),
                "unit": "s/pass",
                "detail": {
                    "fit_s": round(fit_s, 2),
                    "acq_evals_per_s": round(2 * 512 * 100 / per_pass),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
