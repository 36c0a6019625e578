"""Chain-length-to-convergence on the north-star problem (measured).

BASELINE.md's round-3 entry reported "R-hat < 1.1 needs roughly 8-15k
steps" as a BOUND because a single 9600-step `lax.scan` crashed the
remote tunnel worker (CLAUDE.md rule 9). This harness measures it
properly by extending the chain in 2400-step chunks (a length known to
run) with position warm-starts between chunks — the same continuation
semantics as `BayesGPR.sample(add=True)` — and computing the split
R-hat trajectory over the cumulative chain (first third discarded,
bench.py's rule).

    python benchmarks/bench_convergence.py [n_chunks]

One chunk program compiles once (static n_steps=2400); every chunk
reuses it, so the measurement is compile-free after the first.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHUNK = 2400


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 7

    import jax
    import jax.numpy as jnp

    import bench as B
    from bask_tpu.parallel.mcmc import run_ensemble
    from bask_tpu.models import gp as gpc
    from bask_tpu.ops import kernels as bk, linalg
    from bask_tpu.utils.priors import guess_priors
    from bask_tpu.utils.diagnostics import effective_sample_size, split_rhat

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X, y = B._dataset()
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * B.N_DIM), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    n_pad = 512
    Xp = np.full((n_pad, B.N_DIM), 0.5)
    Xp[: B.N_OBS] = X
    yp = np.zeros(n_pad)
    yp[: B.N_OBS] = y
    data = gpc.make_data(
        jnp.asarray(Xp, dtype=dtype),
        jnp.asarray(yp, dtype=dtype),
        jnp.asarray(np.full(n_pad, 1e-6), dtype=dtype),
        jnp.asarray(np.arange(n_pad) < B.N_OBS),
    )
    priors = tuple(guess_priors(kernel))

    def _prior_one(theta):
        lp = 0.0
        for i, p in enumerate(priors):
            lp = lp + p(theta[i])
        return lp

    def log_prob(thetas):
        lp = jax.vmap(_prior_one)(thetas)
        lml = linalg.batched_lml(
            kernel, thetas, data.X, data.y, data.alpha_diag, data.mask
        )
        tot = lp + lml
        return jnp.where(jnp.isfinite(tot), tot, -jnp.inf)

    rng = np.random.RandomState(1)
    pos = jnp.asarray(B._init_positions(kernel.n_theta, rng), dtype=dtype)

    chunks = []
    total_warm = 0.0
    for c in range(n_chunks):
        t0 = time.perf_counter()
        chain, final = run_ensemble(
            log_prob, pos, jax.random.PRNGKey(100 + c), CHUNK
        )
        steps = np.asarray(chain)  # fetch = sync
        dt = time.perf_counter() - t0
        if c > 0:
            total_warm += dt
        chunks.append(steps)
        pos = final.pos
        acc = float(final.accepted) / (CHUNK * B.N_WALKERS)

        full = np.concatenate(chunks, axis=0)
        kept = full[full.shape[0] // 3 :]
        rhat = float(np.max(split_rhat(kept)))
        ess = float(np.min(effective_sample_size(kept)))
        print(
            f"steps={full.shape[0]:6d}  max split R-hat={rhat:.3f}  "
            f"min ESS={ess:7.1f}  chunk acc={acc:.3f}  "
            f"chunk wall={dt:.1f}s{' (incl. compile)' if c == 0 else ''}",
            flush=True,
        )
        if rhat < 1.1:
            print(
                f"R-hat < 1.1 REACHED at {full.shape[0]} steps; "
                f"warm chain time for these steps ~= "
                f"{total_warm + (dt if c == 0 else 0):.1f}s "
                f"(first-chunk compile excluded)",
                flush=True,
            )
            break
    else:
        print(f"R-hat < 1.1 NOT reached in {n_chunks * CHUNK} steps", flush=True)


if __name__ == "__main__":
    main()
