"""Right- vs left-looking blocked triangular solves at large n.

VERDICT r4 #5: the left-looking solves do T(T-1)/2 small latency-bound
matmuls; the right-looking form does T large trailing updates (same
flops). Times the factorization+solve composite at the large-n shapes:

    python benchmarks/bench_solve_sweep.py 8192 right
    python benchmarks/bench_solve_sweep.py 8192 left

One variant per process (axon timing rule); in-scan, scalar-fetch
synced; parity asserted at a small shape before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, M = 4, 128  # walker batch, RHS count (acquisition-like)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    sweep = sys.argv[2] if len(sys.argv) > 2 else "right"
    K = max(2, 8192 // N)

    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from bask_tpu.ops import fast_cholesky as fc

    rng = np.random.RandomState(0)

    def spd(n, w):
        Xp = rng.uniform(size=(n, 8)).astype(np.float32)
        d2 = ((Xp[:, None, :] - Xp[None, :, :]) ** 2).sum(-1)
        K0 = np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(n)
        return np.broadcast_to(K0, (w, n, n)).astype(np.float32).copy()

    # parity: right == left at a small shape
    A_s = jnp.asarray(spd(512, 2))
    Y_s = jnp.asarray(rng.standard_normal((2, 512, 8)), jnp.float32)
    outs = {}
    for mode in ("left", "right"):
        fc.SOLVE_SWEEP = mode
        L, invs = jax.jit(fc.block_cholesky)(A_s)
        outs[mode] = (
            np.asarray(jax.jit(fc.block_solve_lower_mat)(L, invs, Y_s)),
            np.asarray(jax.jit(fc.block_solve_upper_mat)(L, invs, Y_s)),
        )
    for a, b in zip(outs["left"], outs["right"]):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5), (
            np.abs(a - b).max()
        )

    fc.SOLVE_SWEEP = sweep
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
        f"{sweep} N={N} W={W} M={M}: {dt*1e3:.1f} ms per "
        f"chol+solve+solveT ({flops/dt/1e12:.2f} TFLOP/s)"
    )


if __name__ == "__main__":
    main()
