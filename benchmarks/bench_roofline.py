"""MXU roofline closure for the blocked factorization (VERDICT r3 weak #5).

Measures, one variant per process (axon timing rule, in-scan,
scalar-fetch synced):

    python benchmarks/bench_roofline.py matmul      # f32 HIGHEST ceiling
    python benchmarks/bench_roofline.py matmul-bf16 # default-precision ceiling
    python benchmarks/bench_roofline.py chol        # factorization at N
    python benchmarks/bench_roofline.py trailing    # trailing updates only

The question the numbers answer: is the n=8192 factorization's
~11.5-13.3 TFLOP/s "plateau" leaving MXU throughput on the table, or is
it at the structural limit? ``matmul`` gives the practical ceiling for
the precision class every precision-critical matmul in the repo uses
(CLAUDE.md rule 5: f32 HIGHEST = 6-pass bf16). ``trailing`` times ONLY
the factorization's trailing Schur updates (the embarrassingly-MXU
part, no sequential panel dependency): the delta between ``trailing``'s
rate and ``chol``'s rate is the cost of the sequential panel critical
path, which no scheduling inside one chip can remove (panel k+1's
factorization needs trailing update k's output).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W = 4


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    K = max(2, 8192 // N * 2)

    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from _probe import probe_or_exit

    probe_or_exit()

    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)

    if variant.startswith("matmul"):
        prec = (
            jax.lax.Precision.DEFAULT
            if variant == "matmul-bf16"
            else jax.lax.Precision.HIGHEST
        )
        A = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)

        @jax.jit
        def bench(A, B):
            def body(c, i):
                C = jnp.matmul(A + i * 1e-6, B, precision=prec)
                return c + C[0, 0] + C[-1, -1], None

            out, _ = lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
            )
            return out

        out = bench(A, B)
        float(out)
        t0 = time.perf_counter()
        float(bench(A, B))
        dt = (time.perf_counter() - t0) / K
        flops = 2.0 * N**3
        print(
            f"{variant} N={N}: {dt*1e3:.1f} ms per matmul "
            f"({flops/dt/1e12:.2f} TFLOP/s)"
        )
        return

    from bask_tpu.ops import fast_cholesky as fc

    def spd(n, w):
        Xp = rng.uniform(size=(n, 8)).astype(np.float32)
        d2 = ((Xp[:, None, :] - Xp[None, :, :]) ** 2).sum(-1)
        K0 = np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(n)
        return np.broadcast_to(K0, (w, n, n)).astype(np.float32).copy()

    A = jnp.asarray(spd(N, W))
    nb = fc.pick_nb(N)
    spans = fc._offsets([nb] * (N // nb))

    if variant in ("chol", "chol-trailhigh"):
        # (the chol-split1/chol-split2 variants were measured 2x SLOWER
        # here — 126.9/128.5 vs 63.4 ms at n=8192 — and the code was
        # cut; BASELINE.md round-4 section. Unknown chol-* names now
        # fall through to the unknown-variant error instead of silently
        # timing the plain path under a wrong label.)
        if variant == "chol-trailhigh":
            fc.TRAILING_PRECISION = jax.lax.Precision.HIGH

        @jax.jit
        def bench(A):
            def body(c, i):
                L, invs = fc.block_cholesky(A + i * 1e-6)
                return c + L[0, 0, 0] + L[0, -1, -1], None

            out, _ = lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
            )
            return out

        # accuracy alongside speed: worst-element reconstruction error
        @jax.jit
        def recon_err(A):
            L, _ = fc.block_cholesky(A)
            R = jnp.matmul(
                L, jnp.swapaxes(L, -1, -2),
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.max(jnp.abs(R - A))

        err = float(recon_err(A[:1]))
        print(f"{variant} recon_err {err:.2e}")

        flops = W * N**3 / 3.0
    elif variant == "trailing":
        # ONLY the trailing Schur updates of a right-looking sweep, with
        # the panel factorizations replaced by a no-op slice (the P
        # operand is taken straight from A): same matmul shapes and
        # memory traffic as the real factorization's trailing updates,
        # zero sequential panel dependency inside a step.
        @jax.jit
        def bench(A):
            def body(c, i):
                M = A + i * 1e-6
                acc = jnp.float32(0.0)
                for lo, hi in spans:
                    if hi >= N:
                        continue
                    P = M[:, hi:, lo:hi]
                    Tm = jnp.matmul(
                        P,
                        jnp.swapaxes(P, -1, -2),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    acc = acc + Tm[:, 0, 0].sum() + Tm[:, -1, -1].sum()
                return c + acc, None

            out, _ = lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
            )
            return out

        flops = W * sum(
            2.0 * (N - hi) ** 2 * (hi - lo) for lo, hi in spans if hi < N
        )
    else:
        raise SystemExit(f"unknown variant {variant}")

    out = bench(A)
    float(out)
    t0 = time.perf_counter()
    float(bench(A))
    dt = (time.perf_counter() - t0) / K
    print(
        f"{variant} N={N} W={W} nb={nb}: {dt*1e3:.1f} ms "
        f"({flops/dt/1e12:.2f} TFLOP/s)"
    )


if __name__ == "__main__":
    main()
