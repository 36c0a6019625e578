"""Batched-Cholesky variant shootout at the MCMC hot shape (50, 512, 512).

Run ONE variant per process (axon timing gotcha: whichever variant runs
first in a process reads ~0 ms):

    python benchmarks/bench_chol_variants.py xla
    python benchmarks/bench_chol_variants.py blocked          # XLA base case
    python benchmarks/bench_chol_variants.py blocked-unrolled # unrolled base
    python benchmarks/bench_chol_variants.py blocked-unrolled-nb64

Times K=100 factorizations inside one lax.scan (per-call dispatch is
~7 ms on the remote TPU and would swamp eager timing), syncing with a
scalar host fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, N, K = 50, 512, 100


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "blocked"

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bask_tpu.ops import fast_cholesky as fc

    nb = None
    if variant == "xla":
        fact = jnp.linalg.cholesky
    else:
        if "unrolled" in variant:
            fc.BASE_IMPL = "unrolled"
        if "nb64" in variant:
            nb = 64
        if "nb256" in variant:
            nb = 256
        if "nb512" in variant:
            nb = 512  # whole matrix through the recursion, no panels
        if "base16" in variant:
            fc._BASE = 16
        if "base64" in variant:
            fc._BASE = 64
        if "high" in variant:
            # 3-pass bf16 matmuls instead of the 6-pass HIGHEST
            fc._mm = lambda a, b: jnp.matmul(
                a, b, precision=lax.Precision.HIGH
            )

        def fact(A):
            return fc.block_cholesky(A, nb=nb)[0]

    rng = np.random.RandomState(0)
    Xp = rng.uniform(size=(N, 15))
    d2 = ((Xp[:, None, :] - Xp[None, :, :]) ** 2).sum(-1)
    K0 = np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(N)
    A = jnp.asarray(
        np.broadcast_to(K0, (W, N, N)).copy()
        * (1.0 + 0.01 * rng.rand(W))[:, None, None],
        dtype=jnp.float32,
    )
    eye = jnp.eye(N, dtype=jnp.float32)

    @jax.jit
    def bench(A):
        def body(c, i):
            L = fact(A + (1e-5 * (i + 1.0)) * eye)
            return c + L[0, 0, 0] + L[-1, -1, -1], None

        out, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))
        return out

    # correctness spot check (on the first matrix)
    L1 = fact(A)
    err = float(
        jnp.max(
            jnp.abs(
                jnp.matmul(
                    L1[0], L1[0].T, precision=jax.lax.Precision.HIGHEST
                )
                - A[0]
            )
        )
    )

    out = bench(A)
    float(out)  # compile + sync (host fetch; block_until_ready is unreliable)
    t0 = time.perf_counter()
    out = bench(A)
    float(out)
    dt = (time.perf_counter() - t0) / K
    print(
        f"{variant}: {dt*1e3:.3f} ms per ({W},{N},{N}) factorization; "
        f"recon err {err:.2e}"
    )


if __name__ == "__main__":
    main()
