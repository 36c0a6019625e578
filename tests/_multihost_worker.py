"""Worker process for the 2-process x 4-device multi-host parity test.

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id>

Runs the production MCMC chain twice — once process-locally (the
single-process reference) and once sharded over the process-spanning
global mesh — and asserts its addressable shards of the global chain are
bit-identical to the corresponding walker rows of the reference chain.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from bask_tpu.parallel.distributed import (
        global_walker_mesh,
        init_distributed,
        shard_global,
    )

    idx, cnt = init_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert cnt == nproc, (idx, cnt)
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nproc * n_local, (n_global, n_local)

    from bask_tpu.models import gp as gpc
    from bask_tpu.models.bayesgpr import _run_chain
    from bask_tpu.models.warping import default_warp_log_prior
    from bask_tpu.ops import kernels as bk
    from bask_tpu.utils.priors import guess_priors

    rng = np.random.RandomState(0)
    X = rng.uniform(size=(12, 2))
    y = np.sin(3 * X[:, 0]) + 0.1 * rng.randn(12)
    y = y - y.mean()
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        (0.3, 0.3), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.01, (1e-5, 1e5))
    data = gpc.make_data(
        jnp.asarray(X),
        jnp.asarray(y),
        jnp.full(12, 1e-10),
        jnp.ones(12, bool),
    )
    priors = tuple(guess_priors(kernel))
    n_walkers = 2 * n_global  # 2 walkers per device
    pos0 = 0.05 * np.random.RandomState(1).randn(n_walkers, kernel.n_theta)
    key = jax.random.PRNGKey(5)
    n_steps = 5

    # process-local reference (single-process semantics)
    ref_chain, ref_final = _run_chain(
        data,
        jnp.asarray(pos0),
        key,
        kernel=kernel,
        priors=priors,
        warp_prior=default_warp_log_prior,
        n_warp=0,
        n_steps=n_steps,
    )
    ref_chain = np.asarray(ref_chain)

    # global-mesh sharded run across all processes
    mesh = global_walker_mesh()
    pos_sharded = shard_global(pos0, mesh, "walkers", sharded_dim=0)
    chain, final = _run_chain(
        data,
        pos_sharded,
        key,
        kernel=kernel,
        priors=priors,
        warp_prior=default_warp_log_prior,
        n_warp=0,
        n_steps=n_steps,
    )

    checked = 0
    for shard in chain.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), ref_chain[shard.index]
        )
        checked += 1
    assert checked >= n_local, checked
    print(f"worker {idx}/{cnt}: multihost chain parity OK "
          f"({checked} shards, {n_walkers} walkers, {n_global} devices)")

    # ---- candidate-grid sharded acquisition across processes ----
    # (the DCN plan in parallel/distributed.py: candidate shards need
    # zero cross-shard communication until the final argmax)
    from bask_tpu.acquisition import _per_draw_predictions

    rows = np.asarray(ref_chain[-1])[: 2 * n_global]  # a few thetas
    n_cand = 8 * n_global
    Xc = np.random.RandomState(7).uniform(size=(n_cand, 2))
    key2 = jax.random.PRNGKey(9)

    mu_ref, std_ref, _ = _per_draw_predictions(
        jnp.asarray(rows), data, jnp.asarray(Xc), key2,
        kernel=kernel, n_warp=0, white_idx=kernel.n_theta - 1,
        need_sample=False,
    )
    mu_ref = np.asarray(mu_ref)

    Xc_sharded = shard_global(Xc, mesh, "walkers", sharded_dim=0)
    mu_s, std_s, _ = _per_draw_predictions(
        jnp.asarray(rows), data, Xc_sharded, key2,
        kernel=kernel, n_warp=0, white_idx=kernel.n_theta - 1,
        need_sample=False,
    )
    checked_c = 0
    for shard in mu_s.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), mu_ref[shard.index], rtol=1e-12
        )
        checked_c += 1
    assert checked_c >= n_local, checked_c
    print(f"worker {idx}/{cnt}: multihost candidate-shard acquisition "
          f"parity OK ({checked_c} shards, {n_cand} candidates)")

    # ---- row-sharded distributed factorization across processes ----
    # one gram sharded by block-row over the PROCESS-SPANNING mesh: the
    # per-panel psum/all_gather collectives cross the process boundary
    # (the DCN path on real multi-slice hardware)
    from bask_tpu.ops.dist_chol import row_sharded_lml
    from bask_tpu.ops.linalg import masked_lml

    n_pad = 4 * n_global
    n_real = n_pad - 3
    rng_r = np.random.RandomState(13)
    Xr = np.zeros((n_pad, 2))
    Xr[:n_real] = rng_r.uniform(size=(n_real, 2))
    yr = np.zeros(n_pad)
    yr[:n_real] = np.sin(3 * Xr[:n_real, 0]) + 0.1 * rng_r.randn(n_real)
    mask_r = jnp.asarray(np.arange(n_pad) < n_real)
    alpha_r = jnp.where(mask_r, 1e-6, 0.0)
    theta_r = jnp.asarray(np.asarray(ref_chain[-1])[0])

    want = float(
        masked_lml(
            kernel, theta_r, jnp.asarray(Xr), jnp.asarray(yr),
            alpha_r, mask_r,
        )
    )
    got = row_sharded_lml(
        kernel, theta_r, jnp.asarray(Xr), jnp.asarray(yr),
        alpha_r, mask_r, mesh=mesh, nb=4,
    )
    got = float(np.asarray(jax.device_get(got)))
    assert np.isfinite(want)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    print(f"worker {idx}/{cnt}: multihost row-sharded LML parity OK "
          f"(n_pad={n_pad} over {n_global} devices)")


if __name__ == "__main__":
    main()
