"""Blocked factorization+solve composite at large n.

Originally the right- vs left-looking solve A/B (VERDICT r4 #5). The
A/B ran on v5e-1 (2026-08-19): right 65.4 ms (13.31 TFLOP/s) vs left
68.4 ms at n=8192, tie at n=4096 — the left-looking form was CUT from
``ops/fast_cholesky.py`` (BASELINE.md round-4 section). This bench now
times the surviving right-looking composite:

    python benchmarks/bench_solve_sweep.py 8192

In-scan, scalar-fetch synced; parity vs XLA substitution asserted at a
small shape before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, M = 4, 128  # walker batch, RHS count (acquisition-like)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    K = max(2, 8192 // N)

    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from _probe import probe_or_exit

    probe_or_exit()

    import jax.numpy as jnp
    from jax import lax
    from jax.scipy.linalg import solve_triangular

    from bask_tpu.ops import fast_cholesky as fc

    rng = np.random.RandomState(0)

    def spd(n, w):
        Xp = rng.uniform(size=(n, 8)).astype(np.float32)
        d2 = ((Xp[:, None, :] - Xp[None, :, :]) ** 2).sum(-1)
        K0 = np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(n)
        return np.broadcast_to(K0, (w, n, n)).astype(np.float32).copy()

    # parity vs XLA substitution at a small shape
    A_s = jnp.asarray(spd(512, 2))
    Y_s = jnp.asarray(rng.standard_normal((2, 512, 8)), jnp.float32)
    L_s, invs_s = jax.jit(fc.block_cholesky)(A_s)
    got = np.asarray(jax.jit(fc.block_solve_lower_mat)(L_s, invs_s, Y_s))
    ref = np.asarray(solve_triangular(L_s, Y_s, lower=True))
    assert np.allclose(got, ref, rtol=1e-3, atol=1e-4), np.abs(got - ref).max()
    got_u = np.asarray(jax.jit(fc.block_solve_upper_mat)(L_s, invs_s, Y_s))
    ref_u = np.asarray(
        solve_triangular(jnp.swapaxes(L_s, -1, -2), Y_s, lower=False)
    )
    assert np.allclose(got_u, ref_u, rtol=1e-3, atol=1e-4), (
        np.abs(got_u - ref_u).max()
    )

    A = jnp.asarray(spd(N, W))
    Y = jnp.asarray(rng.standard_normal((W, N, M)), jnp.float32)

    @jax.jit
    def bench(A, Y):
        def body(c, i):
            L, invs = fc.block_cholesky(A + i * 1e-6)
            Wm = fc.block_solve_lower_mat(L, invs, Y)
            Xm = fc.block_solve_upper_mat(L, invs, Wm)
            return c + L[0, 0, 0] + jnp.sum(Xm[:, -1, -1]), None

        out, _ = lax.scan(
            body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
        )
        return out

    out = bench(A, Y)
    float(out)
    t0 = time.perf_counter()
    out = bench(A, Y)
    float(out)
    dt = (time.perf_counter() - t0) / K
    flops = W * (N**3 / 3 + 2 * N * N * M * 2)
    print(
        f"right N={N} W={W} M={M}: {dt*1e3:.1f} ms per "
        f"chol+solve+solveT ({flops/dt/1e12:.2f} TFLOP/s)"
    )


if __name__ == "__main__":
    main()
