"""Fused Pallas gram: tile-size sweep at the MCMC hot shape.

    python benchmarks/bench_gram_tile.py 128
    python benchmarks/bench_gram_tile.py 256
    python benchmarks/bench_gram_tile.py xla     # generic kernel.eval path
    python benchmarks/bench_gram_tile.py lower   # symmetric-half kernel

One variant per process (axon timing gotchas); in-scan, scalar-fetch
synced, full-output sink.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, N, D, K = 50, 512, 15, 100


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "128"

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bask_tpu.ops import kernels as bk
    from bask_tpu.ops import pallas_gram as pg

    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * D), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    spec = pg.match_fusable(kernel)
    assert spec is not None

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(size=(N, D)), jnp.float32)
    alpha = jnp.full(N, 1e-6, jnp.float32)
    thetas = jnp.asarray(
        np.log(0.3) + 0.05 * rng.randn(W, kernel.n_theta), jnp.float32
    )

    if which == "xla":
        mask = jnp.ones(N, bool)

        def gram(th):
            from bask_tpu.ops.linalg import masked_gram

            return jax.vmap(
                lambda t: masked_gram(kernel, t, X, alpha, mask)
            )(th)
    elif which == "lower":

        def gram(th):
            return pg.fused_masked_gram_lower_batch(spec, th, X, alpha, N)
    else:
        pg._TILE = int(which)

        def gram(th):
            return pg.fused_masked_gram_batch(spec, th, X, alpha, N)

    @jax.jit
    def bench(th):
        def body(c, i):
            G = gram(th + 1e-5 * i)
            return c + jnp.sum(G), None

        out, _ = lax.scan(
            body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32)
        )
        return out

    out = bench(thetas)
    float(out)
    t0 = time.perf_counter()
    out = bench(thetas)
    float(out)
    dt = (time.perf_counter() - t0) / K
    print(f"tile={which}: {dt*1e3:.3f} ms per ({W},{N},{N}) gram batch")


if __name__ == "__main__":
    main()
