"""Fused Pallas gram: walker-batched grid programs (experiment).

The production kernel runs one grid program per (walker, row-strip) —
grid (50, 2) at the hot shape. Its 0.455 ms is ~3x the VPU-compute +
HBM-write bound, suggesting per-program overhead. This variant packs
``wb`` walkers into ONE grid program (an unrolled in-kernel loop over
the walker axis; the tile math itself is the shared
``pallas_gram._tile_values``), cutting the program count wb-fold:

    python benchmarks/bench_gram_wb.py 2
    python benchmarks/bench_gram_wb.py 5

One variant per process; in-scan, scalar-fetch synced, full-output sink.
Exactness vs the production kernel is asserted before timing.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, N, D, K = 50, 512, 15, 100


def main():
    wb = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bask_tpu.ops import kernels as bk
    from bask_tpu.ops import pallas_gram as pg

    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * D), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    spec = pg.match_fusable(kernel)
    assert spec is not None
    assert W % wb == 0 and N % tile == 0

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(size=(N, D)), jnp.float32)
    alpha = jnp.full(N, 1e-6, jnp.float32)
    thetas = jnp.asarray(
        np.log(0.3) + 0.05 * rng.randn(W, kernel.n_theta), jnp.float32
    )

    tiles = N // tile

    @partial(jax.jit, static_argnames=())
    def gram_wb(th):
        packed = pg._pack_params(spec, th, W, D)  # (W, 1, D+2)
        n_real_arr = jnp.asarray(N, dtype=jnp.int32).reshape(1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(W // wb, tiles),
            in_specs=[
                pl.BlockSpec(
                    (wb, 1, D + 2),
                    lambda g, i, n: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile, D), lambda g, i, n: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (N, D), lambda g, i, n: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile, 1), lambda g, i, n: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (wb, tile, N),
                lambda g, i, n: (g, i, 0),
                memory_space=pltpu.VMEM,
            ),
        )

        def body(n_ref, params_ref, x_ref, y_ref, alpha_ref, out_ref):
            i = pl.program_id(1)
            T, C = out_ref.shape[1], out_ref.shape[2]
            rows = i * T + jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
            for w in range(wb):
                out_ref[w, :, :] = pg._tile_values(
                    spec,
                    params_ref[w, 0, :],
                    x_ref[:, :],
                    y_ref[:, :],
                    alpha_ref[:, 0],
                    n_ref[0],
                    rows,
                    cols,
                )

        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((W, N, N), jnp.float32),
            grid_spec=grid_spec,
        )(n_real_arr, packed, X, X, alpha[:, None])

    # exactness vs production
    ref = pg.fused_masked_gram_batch(spec, thetas, X, alpha, N)
    got = gram_wb(thetas)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err == 0.0 or err < 1e-6, err

    @jax.jit
    def bench(th):
        def body(c, i):
            G = gram_wb(th + 1e-5 * i)
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
    print(
        f"wb={wb} tile={tile}: {dt*1e3:.3f} ms per ({W},{N},{N}) gram batch;"
        f" exact-err {err:.1e}"
    )


if __name__ == "__main__":
    main()
