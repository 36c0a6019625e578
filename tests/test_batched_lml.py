"""batched_lml dispatch equivalence: batched path (CPU fallback = vmap)
must equal per-theta masked_lml, for shared and per-walker inputs."""

import numpy as np
import jax.numpy as jnp

from bask_tpu.models import gp as gpc
from bask_tpu.ops import kernels as bk
from bask_tpu.ops.linalg import batched_lml, masked_lml


def _setup(d=3, n=90, n_pad=128):
    rng = np.random.RandomState(0)
    X = np.full((n_pad, d), 0.5)
    X[:n] = rng.uniform(size=(n, d))
    y = np.zeros(n_pad)
    y[:n] = rng.randn(n)
    mask = np.arange(n_pad) < n
    kernel = bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        tuple([0.3] * d), (0.05, 2.0), nu=2.5
    ) + bk.WhiteKernel(0.05, (1e-5, 1e5))
    thetas = kernel.theta0[None, :] + 0.2 * rng.randn(6, kernel.n_theta)
    return kernel, jnp.asarray(thetas), jnp.asarray(X), jnp.asarray(y), jnp.asarray(
        np.full(n_pad, 1e-8)
    ), jnp.asarray(mask)


def test_batched_matches_scalar_shared_X():
    kernel, thetas, X, y, alpha, mask = _setup()
    batch = np.asarray(batched_lml(kernel, thetas, X, y, alpha, mask))
    singles = [
        float(masked_lml(kernel, t, X, y, alpha, mask)) for t in thetas
    ]
    np.testing.assert_allclose(batch, singles, rtol=1e-9)


def test_batched_matches_scalar_per_walker_X():
    kernel, thetas, X, y, alpha, mask = _setup()
    rng = np.random.RandomState(1)
    Xb = jnp.asarray(
        np.clip(
            np.asarray(X)[None] + 0.01 * rng.randn(6, *X.shape), 0, 1
        )
    )
    batch = np.asarray(batched_lml(kernel, thetas, Xb, y, alpha, mask))
    singles = [
        float(masked_lml(kernel, t, Xi, y, alpha, mask))
        for t, Xi in zip(thetas, Xb)
    ]
    np.testing.assert_allclose(batch, singles, rtol=1e-9)


def test_chunked_matches_unchunked_exactly(monkeypatch):
    """Walker-chunked large-n path (VERDICT r2 #2): chunking must
    reproduce the unchunked batch BIT-exactly under jit (each walker's
    gram/factorization/reductions are independent). The comparison runs
    under jit because that is the only way the chain ever calls it."""
    import jax as _jax

    from bask_tpu.ops import linalg

    kernel, thetas, X, y, alpha, mask = _setup()
    n_pad = X.shape[-2]
    full = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, X, y, alpha, mask))(thetas)
    )
    # non-divisor chunk: 4 walkers per chunk over 6 walkers (ragged tail)
    monkeypatch.setattr(
        linalg,
        "LML_MAX_BATCH_BYTES",
        4 * n_pad * n_pad * X.dtype.itemsize,
    )
    chunked = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, X, y, alpha, mask))(thetas)
    )
    assert np.array_equal(full, chunked)
    # degenerate chunk=1: XLA lowers a batch-1 factorization differently
    # (vmap simplification), costing ~1 ulp — pinned at 1e-12 relative
    monkeypatch.setattr(linalg, "LML_MAX_BATCH_BYTES", 1)
    chunk1 = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, X, y, alpha, mask))(thetas)
    )
    np.testing.assert_allclose(chunk1, full, rtol=1e-12)


def test_chunked_matches_unchunked_per_walker_X(monkeypatch):
    import jax as _jax

    from bask_tpu.ops import linalg

    kernel, thetas, X, y, alpha, mask = _setup()
    rng = np.random.RandomState(1)
    Xb = jnp.asarray(
        np.clip(np.asarray(X)[None] + 0.01 * rng.randn(6, *X.shape), 0, 1)
    )
    full = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, Xb, y, alpha, mask))(thetas)
    )
    monkeypatch.setattr(
        linalg,
        "LML_MAX_BATCH_BYTES",
        3 * X.shape[-2] ** 2 * X.dtype.itemsize,
    )
    chunked = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, Xb, y, alpha, mask))(thetas)
    )
    # per-walker X batches the distance matmul; XLA lowers different
    # batch sizes with different blocking (~1 ulp) — pinned at 1e-12
    # relative (the shared-X case above is bit-exact)
    np.testing.assert_allclose(chunked, full, rtol=1e-12)


def test_chunked_inside_jit_chain(monkeypatch):
    """The chunked LML must trace inside the jitted MCMC chain (static
    shapes, lax.map) and leave the chain semantics unchanged."""
    import jax as _jax

    from bask_tpu.ops import linalg
    from bask_tpu.parallel.mcmc import run_ensemble

    kernel, thetas, X, y, alpha, mask = _setup()

    def log_prob(ts):
        return batched_lml(kernel, ts, X, y, alpha, mask)

    key = _jax.random.PRNGKey(0)
    pos0 = thetas
    chain_full, final_full = run_ensemble(log_prob, pos0, key, 5)
    monkeypatch.setattr(linalg, "LML_MAX_BATCH_BYTES", 1)

    def log_prob_chunked(ts):  # fresh callable => fresh trace
        return batched_lml(kernel, ts, X, y, alpha, mask)

    chain_chunk, final_chunk = run_ensemble(log_prob_chunked, pos0, key, 5)
    assert np.array_equal(np.asarray(chain_full), np.asarray(chain_chunk))


def _mesh8():
    import jax as _jax
    from jax.sharding import Mesh

    return Mesh(np.array(_jax.devices()[:8]), ("walkers",))


def _setup_w(n_walkers):
    kernel, thetas, X, y, alpha, mask = _setup()
    rng = np.random.RandomState(7)
    thetas = jnp.asarray(
        np.asarray(thetas)[0][None, :]
        + 0.2 * rng.randn(n_walkers, thetas.shape[1])
    )
    return kernel, thetas, X, y, alpha, mask


def test_mesh_sharded_matches_unsharded():
    """batched_lml(mesh=) wraps the per-walker pipeline in shard_map
    over the walker axis (each device computes its LOCAL shard — the
    layout the Pallas gram needs on real multi-chip hardware). Per-
    walker results must match the unsharded batch (1e-12: XLA lowers
    different batch sizes with different blocking, same as chunking)."""
    import jax as _jax

    kernel, thetas, X, y, alpha, mask = _setup_w(16)
    mesh = _mesh8()
    full = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, X, y, alpha, mask))(thetas)
    )
    sharded = np.asarray(
        _jax.jit(
            lambda t: batched_lml(kernel, t, X, y, alpha, mask, mesh=mesh)
        )(thetas)
    )
    np.testing.assert_allclose(sharded, full, rtol=1e-12)


def test_mesh_sharded_per_walker_X_and_chunked(monkeypatch):
    """shard_map + per-walker X (warping layout) + HBM chunking INSIDE
    the local shard compose: results match the plain batch."""
    import jax as _jax

    from bask_tpu.ops import linalg

    kernel, thetas, X, y, alpha, mask = _setup_w(16)
    rng = np.random.RandomState(3)
    Xb = jnp.asarray(
        np.clip(np.asarray(X)[None] + 0.01 * rng.randn(16, *X.shape), 0, 1)
    )
    mesh = _mesh8()
    full = np.asarray(
        _jax.jit(lambda t: batched_lml(kernel, t, Xb, y, alpha, mask))(thetas)
    )
    # chunk inside each device's 2-walker shard (chunk=1 per step)
    monkeypatch.setattr(linalg, "LML_MAX_BATCH_BYTES", 1)
    sharded = np.asarray(
        _jax.jit(
            lambda t: batched_lml(kernel, t, Xb, y, alpha, mask, mesh=mesh)
        )(thetas)
    )
    np.testing.assert_allclose(sharded, full, rtol=1e-12)
