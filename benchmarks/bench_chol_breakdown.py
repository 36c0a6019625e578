"""Critical-path decomposition of the blocked factorization at the MCMC
hot shape (50, 512, 512), nb=128.

The blocked Cholesky's serial structure is: 4 diagonal panels, each a
recursive chol+inverse of (50, 128, 128) -> 4 bases of (50, 32, 32)
(XLA cholesky + 5-iteration Newton inverse) plus recursion matmuls, with
panel/trailing matmuls between panels. This script times each piece in
isolation so the redesign targets the real bottleneck.

Run ONE variant per process (axon gotcha: the first-timed variant in a
process reads ~0 ms):

    python benchmarks/bench_chol_breakdown.py full       # block_cholesky (L + invs)
    python benchmarks/bench_chol_breakdown.py panel128   # _chol_inv_recursive (50,128,128)
    python benchmarks/bench_chol_breakdown.py base-chol  # jnp.linalg.cholesky (50,32,32)
    python benchmarks/bench_chol_breakdown.py base-inv   # tri_newton_inv (50,32,32)
    python benchmarks/bench_chol_breakdown.py newton128  # tri_newton_inv (50,128,128)
    python benchmarks/bench_chol_breakdown.py panel-mm   # (50,384,128)@(50,128,128)

Each timed K times inside one lax.scan with a scalar host-fetch sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, N, K = 50, 512, 300


def _pd(rng, n, w=W):
    Xp = rng.uniform(size=(n, 15))
    d2 = ((Xp[:, None, :] - Xp[None, :, :]) ** 2).sum(-1)
    K0 = np.exp(-0.5 * d2 / 0.3**2) + 1e-2 * np.eye(n)
    return np.broadcast_to(K0, (w, n, n)).copy() * (
        1.0 + 0.01 * rng.rand(w)
    )[:, None, None]


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bask_tpu.ops import fast_cholesky as fc

    rng = np.random.RandomState(0)

    if variant.startswith("pbase"):
        # pallas fused base chol+inv at size m: "pbase32"
        from bask_tpu.ops.pallas_chol_base import chol_inv_base

        m = int(variant[len("pbase"):])
        A = jnp.asarray(_pd(rng, m), dtype=jnp.float32)

        def op(A):
            L, X = chol_inv_base(A)
            return L[0, 0, 0] + X[-1, -1, -1]

    elif variant == "panelp":
        # panel recursion with the pallas base
        fc.PALLAS_BASE = "on"
        A = jnp.asarray(_pd(rng, 128), dtype=jnp.float32)

        def op(A):
            L, inv = fc._chol_inv_recursive(A)
            return L[0, 0, 0] + inv[-1, -1, -1]

    elif variant == "full-nopanel":
        # the full (50,512,512) factorization (the name survives the
        # round-3 panel A/B that deleted the losing panel kernel)
        fc.PALLAS_BASE = "on"
        A = jnp.asarray(_pd(rng, N, w=50), dtype=jnp.float32)

        def op(A):
            L, invs = fc.block_cholesky(A, nb=128)
            return L[0, 0, 0] + invs[-1][-1, -1, -1]

    elif variant in ("w100-pallas", "w100-xla"):
        fc.PALLAS_BASE = "on" if variant == "w100-pallas" else "off"
        A = jnp.asarray(_pd(rng, N, w=100), dtype=jnp.float32)

        def op(A):
            L, invs = fc.block_cholesky(A, nb=128)
            return L[0, 0, 0] + invs[-1][-1, -1, -1]

    elif variant in ("b1-pallas", "b1-xla"):
        fc.PALLAS_BASE = "on" if variant == "b1-pallas" else "off"
        A = jnp.asarray(_pd(rng, N, w=1), dtype=jnp.float32)

        def op(A):
            L, invs = fc.block_cholesky(A, nb=128)
            return L[0, 0, 0] + invs[-1][-1, -1, -1]

    elif variant == "fullp64":
        fc.PALLAS_BASE = "on"
        fc._BASE = 64
        A = jnp.asarray(_pd(rng, N), dtype=jnp.float32)

        def op(A):
            L, invs = fc.block_cholesky(A, nb=128)
            return L[0, 0, 0] + invs[-1][-1, -1, -1]

    elif variant == "fullp":
        fc.PALLAS_BASE = "on"
        A = jnp.asarray(_pd(rng, N), dtype=jnp.float32)

        def op(A):
            L, invs = fc.block_cholesky(A, nb=128)
            return L[0, 0, 0] + invs[-1][-1, -1, -1]

    elif variant.startswith("unrolled"):
        # unrolled base cholesky at size m: "unrolled32", "unrolled64", ...
        m = int(variant[len("unrolled"):])
        A = jnp.asarray(_pd(rng, m), dtype=jnp.float32)

        def op(A):
            L = fc._unrolled_chol(A)
            return L[0, 0, 0] + L[-1, -1, -1]

    elif variant.startswith("panelu"):
        # panel recursion with unrolled bases at _BASE=m: "panelu32"
        fc.BASE_IMPL = "unrolled"
        fc._BASE = int(variant[len("panelu"):])
        A = jnp.asarray(_pd(rng, 128), dtype=jnp.float32)

        def op(A):
            L, inv = fc._chol_inv_recursive(A)
            return L[0, 0, 0] + inv[-1, -1, -1]

    elif variant == "full":
        A = jnp.asarray(_pd(rng, N), dtype=jnp.float32)

        def op(A):
            L, invs = fc.block_cholesky(A, nb=128)
            return L[0, 0, 0] + invs[-1][-1, -1, -1]

    elif variant == "panel128":
        A = jnp.asarray(_pd(rng, 128), dtype=jnp.float32)

        def op(A):
            L, inv = fc._chol_inv_recursive(A)
            return L[0, 0, 0] + inv[-1, -1, -1]

    elif variant == "base-chol":
        A = jnp.asarray(_pd(rng, 32), dtype=jnp.float32)

        def op(A):
            L = fc._base_chol(A)
            return L[0, 0, 0] + L[-1, -1, -1]

    elif variant == "base-inv":
        A = jnp.asarray(_pd(rng, 32), dtype=jnp.float32)
        L0 = jnp.linalg.cholesky(A)

        def op(L):
            X = fc.tri_newton_inv(L, 32)
            return X[0, 0, 0] + X[-1, -1, -1]

        A = L0
    elif variant == "newton128":
        A = jnp.asarray(_pd(rng, 128), dtype=jnp.float32)
        A = jnp.linalg.cholesky(A)

        def op(L):
            X = fc.tri_newton_inv(L, 128)
            return X[0, 0, 0] + X[-1, -1, -1]

    elif variant == "panel-mm":
        B = jnp.asarray(
            rng.standard_normal((W, 384, 128)), dtype=jnp.float32
        )
        C = jnp.asarray(
            rng.standard_normal((W, 128, 128)), dtype=jnp.float32
        )

        def op(s):
            P = jnp.matmul(
                B * s, C, precision=lax.Precision.HIGHEST
            )
            return P[0, 0, 0] + P[-1, -1, -1]

        A = jnp.float32(1.0)
    else:
        raise SystemExit(f"unknown variant {variant}")

    @jax.jit
    def bench(A):
        def body(c, i):
            x = op(A * (1.0 + 1e-6 * i) if variant != "panel-mm" else A + i * 1e-6)
            return c + x, None

        out, _ = lax.scan(
            body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
        )
        return out

    out = bench(A)
    float(out)  # compile + sync
    t0 = time.perf_counter()
    out = bench(A)
    float(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{variant}: {dt*1e6:.1f} us per op (K={K})")


if __name__ == "__main__":
    main()
