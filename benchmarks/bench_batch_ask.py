"""Secondary benchmark (BASELINE.json config 5): 15-D, n=1000
observations, 256 walkers, Thompson-sampled batch ask over 65,536
candidates.

Two timed phases:
1. hyperposterior fit: 256 walkers x (burnin+collect) on n=1000 padded
   to 1024 — one batched factorization of (128, 1024, 1024) per
   half-step,
2. batch ask: 256 pathwise Thompson draws evaluated on 65,536 candidates
   (pure matmuls; an exact joint draw would need a 65k x 65k Cholesky).

Run:  python benchmarks/bench_batch_ask.py [--cpu] [--small]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np

    from bask_tpu.models.bayesgpr import BayesGPR
    from bask_tpu.ops import kernels as bk, linalg

    linalg.FAST_CHOLESKY = "auto"

    small = "--small" in sys.argv
    n_obs = 128 if small else 1000
    n_cand = 4096 if small else 65536
    n_walkers = 64 if small else 256
    n_batch = 32 if small else 256
    d = 15

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(n_obs, d))
    y = np.sum((X - 0.5) ** 2, axis=1) + 0.05 * rng.randn(n_obs)

    gp = BayesGPR(
        kernel=bk.ConstantKernel(1.0, (0.1, 2.0))
        * bk.Matern(tuple([0.3] * d), (0.05, 2.0), nu=2.5),
        random_state=0,
        normalize_y=True,
    )
    t0 = time.perf_counter()
    gp.fit(
        X,
        y,
        n_burnin=10,
        n_desired_samples=n_walkers,
        n_walkers_per_thread=n_walkers,
        progress=False,
    )
    fit_s = time.perf_counter() - t0  # includes one-off compiles
    # warm re-sample: the steady-state chain cost (what a BO loop pays)
    t0 = time.perf_counter()
    gp.sample(
        n_burnin=10,
        n_desired_samples=n_walkers,
        n_walkers_per_thread=n_walkers,
    )
    warm_sample_s = time.perf_counter() - t0

    Xc = rng.uniform(size=(n_cand, d))
    # warm-up then timed; selection stays on device (only the
    # (n_batch, top_k) index table crosses to the host)
    gp.thompson_argmin_pathwise(Xc, n_samples=n_batch, random_state=1)
    t0 = time.perf_counter()
    idx = gp.thompson_argmin_pathwise(Xc, n_samples=n_batch, random_state=2)
    ask_s = time.perf_counter() - t0
    batch_idx = idx[:, 0]
    assert (batch_idx >= 0).all() and (batch_idx < n_cand).all()

    print(
        json.dumps(
            {
                "metric": f"thompson_batch_ask_{n_batch}x{n_cand}cands_n{n_obs}_d15",
                "value": round(ask_s, 4),
                "unit": "s",
                "detail": {
                    "fit_s_{}walkers_incl_compile".format(n_walkers): round(fit_s, 2),
                    "warm_sample_s": round(warm_sample_s, 2),
                    "unique_batch_points": int(len(set(batch_idx.tolist()))),
                    "candidates_per_s": round(n_cand * n_batch / ask_s),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
