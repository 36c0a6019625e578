"""Row-sharded distributed Cholesky/LML (ops/dist_chol.py).

Validated on the 8-virtual-device CPU mesh: the sharded factorization
(strip grams + psum'd diagonal blocks + all-gathered panels) must
reproduce the single-device masked LML to float64 precision, across
panel widths, padding masks, walker batches, and the non-PD → -inf
contract. The reference has no distributed execution (SURVEY §2
absent-rows); the oracle is bask-tpu's own masked_lml, which is itself
pinned against the reference formulas elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bask_tpu.models import gp as gpc
from bask_tpu.ops.dist_chol import (
    pick_row_nb,
    row_sharded_lml,
    row_sharded_lml_batch,
    row_sharded_predict,
    row_sharded_sample_y,
    walker_row_sharded_lml,
)
from bask_tpu.ops.kernels import ConstantKernel, Matern, RBF, WhiteKernel
from bask_tpu.ops.linalg import masked_lml


def _mesh():
    devs = np.array(jax.devices("cpu")[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(devs, ("r",))


def _problem(n_pad=256, n_real=233, d=3, seed=0):
    rng = np.random.RandomState(seed)
    X = np.zeros((n_pad, d))
    X[:n_real] = rng.uniform(size=(n_real, d))
    y = np.zeros(n_pad)
    y[:n_real] = np.sin(3.0 * X[:n_real, 0]) + 0.1 * rng.randn(n_real)
    mask = np.arange(n_pad) < n_real
    alpha = np.where(mask, 1e-6 + 1e-7 * rng.uniform(size=n_pad), 0.0)
    return (
        jnp.asarray(X),
        jnp.asarray(y),
        jnp.asarray(alpha),
        jnp.asarray(mask),
    )


def _kernel():
    return ConstantKernel(1.0, (0.1, 10.0)) * Matern(
        (0.3, 0.4, 0.5), (0.05, 5.0), nu=2.5
    ) + WhiteKernel(0.05, (1e-5, 1e5))


def test_pick_row_nb():
    assert pick_row_nb(64, 256) == 64
    assert pick_row_nb(96, 64) == 48
    assert pick_row_nb(2048, 256) == 256
    assert pick_row_nb(32, 7) == 4


@pytest.mark.parametrize("nb", [16, 32, 64])
def test_matches_masked_lml(nb):
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem()
    theta = jnp.asarray(kernel.theta0 + 0.1)
    want = float(masked_lml(kernel, theta, X, y, alpha, mask))
    got = float(
        jax.jit(
            lambda t: row_sharded_lml(
                kernel, t, X, y, alpha, mask, mesh=mesh, nb=nb
            )
        )(theta)
    )
    assert np.isfinite(want)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_no_padding_and_other_kernels():
    mesh = _mesh()
    X, y, alpha, mask = _problem(n_pad=128, n_real=128, d=2, seed=3)
    alpha = jnp.full_like(alpha, 1e-5)
    for kernel in (
        ConstantKernel(2.0, (0.1, 10.0)) * RBF(0.5, (0.05, 5.0)),
        ConstantKernel(1.0, (0.1, 10.0))
        * Matern((0.3, 0.5), (0.05, 5.0), nu=1.5)
        + WhiteKernel(0.05, (1e-5, 1e5)),
    ):
        theta = jnp.asarray(kernel.theta0 - 0.2)
        want = float(masked_lml(kernel, theta, X, y, alpha, mask))
        got = float(
            row_sharded_lml(kernel, theta, X, y, alpha, mask, mesh=mesh)
        )
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_batch_matches_vmapped_masked_lml():
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=192, n_real=171, seed=5)
    rng = np.random.RandomState(7)
    thetas = jnp.asarray(
        kernel.theta0[None, :] + 0.15 * rng.randn(6, kernel.n_theta)
    )
    want = jax.vmap(
        lambda t: masked_lml(kernel, t, X, y, alpha, mask)
    )(thetas)
    got = row_sharded_lml_batch(
        kernel, thetas, X, y, alpha, mask, mesh=mesh, nb=24
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-10
    )


def test_predict_matches_gp_predict():
    """Row-sharded predictive mean/std/LML == the single-device GP
    readout (gp.posterior + gp.predict), including y renormalization
    and the noise-free theta_diag variant."""
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=256, n_real=229, seed=21)
    theta = jnp.asarray(kernel.theta0 + 0.07)
    y_mean, y_std = 0.31, 1.7
    rng = np.random.RandomState(3)
    Xq = jnp.asarray(rng.uniform(size=(17, 3)))

    data = gpc.make_data(X, y, alpha, mask, y_mean=y_mean, y_std=y_std)
    post = gpc.posterior(kernel, theta, data)
    mu_ref, std_ref = gpc.predict(
        kernel, theta, post, data, Xq, return_std=True
    )
    lml_ref = float(masked_lml(kernel, theta, X, y, alpha, mask))

    mu, std, lml = jax.jit(
        lambda t: row_sharded_predict(
            kernel, t, X, y, alpha, mask, Xq, mesh=mesh, nb=32,
            y_mean=y_mean, y_std=y_std, return_lml=True,
        )
    )(theta)
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(mu_ref), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(std), np.asarray(std_ref), rtol=1e-8, atol=1e-11
    )
    np.testing.assert_allclose(float(lml), lml_ref, rtol=1e-10)

    # noise-free prediction: the White variance leaves the query diag
    white_idx = kernel.n_theta - 1
    tq = gpc.noise_free_theta(kernel, theta, white_idx)
    mu0_ref, std0_ref = gpc.predict(
        kernel, tq, post, data, Xq, return_std=True
    )
    mu0, std0 = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=32,
        y_mean=y_mean, y_std=y_std, theta_diag=tq,
    )
    np.testing.assert_allclose(
        np.asarray(mu0), np.asarray(mu0_ref), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(std0), np.asarray(std0_ref), rtol=1e-8, atol=1e-11
    )
    assert (np.asarray(std0) <= np.asarray(std) + 1e-12).all()


def test_predict_cov_and_sample_y_match_gp():
    """return_cov and the distributed joint draws mirror gp.predict
    (return_cov=True) and gp.sample_y: same covariance to 1e-8 and,
    because both use the identical eigen-factor + standard-normal
    construction, bit-comparable draws given the same key."""
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=128, n_real=117, seed=31)
    theta = jnp.asarray(kernel.theta0 - 0.05)
    y_mean, y_std = -0.2, 0.9
    rng = np.random.RandomState(5)
    Xq = jnp.asarray(rng.uniform(size=(9, 3)))
    key = jax.random.PRNGKey(42)

    data = gpc.make_data(X, y, alpha, mask, y_mean=y_mean, y_std=y_std)
    post = gpc.posterior(kernel, theta, data)
    mu_ref, cov_ref = gpc.predict(
        kernel, theta, post, data, Xq, return_cov=True
    )
    mu, cov = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=16,
        y_mean=y_mean, y_std=y_std, return_cov=True,
    )
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(mu_ref), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(cov), np.asarray(cov_ref), rtol=1e-8, atol=1e-10
    )

    draws_ref = gpc.sample_y(
        kernel, theta, post, data, Xq, key, n_samples=4
    )
    draws = row_sharded_sample_y(
        kernel, theta, X, y, alpha, mask, Xq, key, mesh=mesh,
        n_samples=4, nb=16, y_mean=y_mean, y_std=y_std,
    )
    np.testing.assert_allclose(
        np.asarray(draws), np.asarray(draws_ref), rtol=1e-6, atol=1e-8
    )


def test_value_grad_adjoint_matches_jvp_and_dense():
    """The closed-form adjoint LML gradient (stored-factor + backward
    sweep + elementwise contractions) == the D-sweep jvp path == dense
    autodiff of masked_lml, incl. padding masks."""
    from bask_tpu.ops.dist_chol import row_sharded_lml_value_grad

    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=128, n_real=113, seed=51)
    theta = jnp.asarray(kernel.theta0 + 0.11)

    v_dense, g_dense = jax.value_and_grad(
        lambda t: masked_lml(kernel, t, X, y, alpha, mask)
    )(theta)
    v_adj, g_adj = row_sharded_lml_value_grad(
        kernel, theta, X, y, alpha, mask, mesh, nb=16, method="adjoint"
    )
    v_jvp, g_jvp = row_sharded_lml_value_grad(
        kernel, theta, X, y, alpha, mask, mesh, nb=16, method="jvp"
    )
    np.testing.assert_allclose(float(v_adj), float(v_dense), rtol=1e-10)
    np.testing.assert_allclose(float(v_jvp), float(v_dense), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_adj), np.asarray(g_dense), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g_jvp), np.asarray(g_dense), rtol=1e-8, atol=1e-10
    )

    with pytest.raises(ValueError, match="adjoint"):
        row_sharded_lml_value_grad(
            kernel, theta, X, y, alpha, mask, mesh, nb=16, method="bogus"
        )


def test_predict_gradients_match_autodiff():
    """return_grad's extra sweep columns == autodiff of the dense
    gp.predict mean/std wrt each query point, incl. masking, y scaling
    and the noise-free theta_diag variant."""
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=128, n_real=109, seed=41)
    theta = jnp.asarray(kernel.theta0 + 0.03)
    y_mean, y_std = 0.4, 1.3
    rng = np.random.RandomState(7)
    Xq = jnp.asarray(rng.uniform(size=(5, 3)))

    data = gpc.make_data(X, y, alpha, mask, y_mean=y_mean, y_std=y_std)
    post = gpc.posterior(kernel, theta, data)

    def mean_one(x):
        return gpc.predict(kernel, theta, post, data, x[None, :])[0]

    def std_one(x):
        return gpc.predict(
            kernel, theta, post, data, x[None, :], return_std=True
        )[1][0]

    mg_ref = np.asarray(jax.vmap(jax.grad(mean_one))(Xq))
    sg_ref = np.asarray(jax.vmap(jax.grad(std_one))(Xq))

    mu, std, mg, sg = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=16,
        y_mean=y_mean, y_std=y_std, return_grad=True,
    )
    np.testing.assert_allclose(np.asarray(mg), mg_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sg), sg_ref, rtol=1e-7, atol=1e-9)

    # return order with return_lml: grads precede the trailing lml
    out = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=16,
        y_mean=y_mean, y_std=y_std, return_grad=True, return_lml=True,
    )
    assert len(out) == 5
    np.testing.assert_allclose(
        float(out[4]), float(masked_lml(kernel, theta, X, y, alpha, mask)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(mg), rtol=1e-12)

    with pytest.raises(ValueError, match="return_cov"):
        row_sharded_predict(
            kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=16,
            return_grad=True, return_cov=True,
        )

    # noise-free theta_diag: gradients follow the query-side theta
    white_idx = kernel.n_theta - 1
    tq = gpc.noise_free_theta(kernel, theta, white_idx)

    def std0_one(x):
        return gpc.predict(
            kernel, tq, post, data, x[None, :], return_std=True
        )[1][0]

    sg0_ref = np.asarray(jax.vmap(jax.grad(std0_one))(Xq))
    _, _, _, sg0 = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=16,
        y_mean=y_mean, y_std=y_std, theta_diag=tq, return_grad=True,
    )
    np.testing.assert_allclose(np.asarray(sg0), sg0_ref, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_walker_row_2d_mesh(shape):
    devs = np.array(jax.devices("cpu")[:8]).reshape(shape)
    if devs.size < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = Mesh(devs, ("w", "r"))
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=192, n_real=180, seed=9)
    rng = np.random.RandomState(11)
    thetas = jnp.asarray(
        kernel.theta0[None, :] + 0.1 * rng.randn(8, kernel.n_theta)
    )
    want = jax.vmap(
        lambda t: masked_lml(kernel, t, X, y, alpha, mask)
    )(thetas)
    got = jax.jit(
        lambda th: walker_row_sharded_lml(
            kernel, th, X, y, alpha, mask, mesh=mesh, nb=32
        )
    )(thetas)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-10
    )


def test_walker_row_2d_mesh_rejects_bad_shapes():
    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("w", "r"))
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=192, n_real=180)
    thetas = jnp.asarray(kernel.theta0[None, :] + np.zeros((5, 1)))
    with pytest.raises(ValueError, match="divisible"):
        walker_row_sharded_lml(
            kernel, thetas, X, y, alpha, mask, mesh=mesh
        )
    X2, y2, alpha2, mask2 = _problem(n_pad=98, n_real=90)
    with pytest.raises(ValueError, match="divisible"):
        walker_row_sharded_lml(
            kernel, thetas[:4], X2, y2, alpha2, mask2, mesh=mesh
        )


def test_unrolled_sweep_matches_loop():
    """unroll=True (static-index trapezoid updates) reproduces the
    fori_loop sweep to round-off across LML, predict, and cov."""
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=192, n_real=177, seed=41)
    theta = jnp.asarray(kernel.theta0 + 0.03)
    rng = np.random.RandomState(8)
    Xq = jnp.asarray(rng.uniform(size=(7, 3)))

    lml_loop = float(
        row_sharded_lml(kernel, theta, X, y, alpha, mask, mesh=mesh, nb=24)
    )
    lml_unroll = float(
        row_sharded_lml(
            kernel, theta, X, y, alpha, mask, mesh=mesh, nb=24,
            unroll=True,
        )
    )
    np.testing.assert_allclose(lml_unroll, lml_loop, rtol=1e-12)

    out_loop = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=24,
        y_mean=0.4, y_std=1.3, return_cov=True, return_lml=True,
    )
    out_unroll = row_sharded_predict(
        kernel, theta, X, y, alpha, mask, Xq, mesh=mesh, nb=24,
        y_mean=0.4, y_std=1.3, return_cov=True, return_lml=True,
        unroll=True,
    )
    for a, b in zip(out_unroll, out_loop):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-13
        )


def test_fuzz_shapes_and_panels():
    """Random (n_pad, n_real, nb, d) configs across the 8-device mesh
    all reproduce the single-device masked LML — guards the owner/
    panel indexing across block-boundary alignments."""
    mesh = _mesh()
    rng = np.random.RandomState(123)
    for trial in range(6):
        d = int(rng.randint(1, 4))
        n_pad = 8 * int(rng.randint(3, 25))  # multiples of 8 in [24, 192]
        n_real = int(rng.randint(max(2, n_pad // 2), n_pad + 1))
        nb = int(rng.randint(2, 40))
        kernel = ConstantKernel(1.0, (0.1, 10.0)) * Matern(
            tuple([0.4] * d), (0.05, 5.0), nu=2.5
        ) + WhiteKernel(0.05, (1e-5, 1e5))
        X = np.zeros((n_pad, d))
        X[:n_real] = rng.uniform(size=(n_real, d))
        y = np.zeros(n_pad)
        y[:n_real] = rng.randn(n_real)
        mask = jnp.asarray(np.arange(n_pad) < n_real)
        alpha = jnp.where(mask, 1e-5, 0.0)
        theta = jnp.asarray(kernel.theta0 + 0.1 * rng.randn(kernel.n_theta))
        Xj, yj = jnp.asarray(X), jnp.asarray(y)
        want = float(masked_lml(kernel, theta, Xj, yj, alpha, mask))
        got = float(
            row_sharded_lml(
                kernel, theta, Xj, yj, alpha, mask, mesh=mesh, nb=nb
            )
        )
        assert np.isfinite(want), (trial, n_pad, n_real, nb)
        np.testing.assert_allclose(
            got, want, rtol=1e-9,
            err_msg=f"trial={trial} n_pad={n_pad} n_real={n_real} nb={nb}",
        )


def test_non_pd_gives_neg_inf():
    mesh = _mesh()
    kernel = ConstantKernel(1.0, (0.1, 10.0)) * Matern(
        0.3, (0.05, 5.0), nu=2.5
    )
    n_pad, n_real = 128, 100
    rng = np.random.RandomState(1)
    X = np.zeros((n_pad, 1))
    pts = rng.uniform(size=(n_real // 2, 1))
    X[:n_real] = np.concatenate([pts, pts])  # exact duplicates
    y = np.zeros(n_pad)
    y[:n_real] = rng.randn(n_real)
    mask = jnp.asarray(np.arange(n_pad) < n_real)
    alpha = jnp.zeros(n_pad)  # no jitter: gram is singular
    theta = jnp.asarray(kernel.theta0)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    assert float(masked_lml(kernel, theta, Xj, yj, alpha, mask)) == -np.inf
    got = float(
        row_sharded_lml(kernel, theta, Xj, yj, alpha, mask, mesh=mesh)
    )
    assert got == -np.inf


def test_rejects_indivisible_n():
    mesh = _mesh()
    kernel = _kernel()
    X, y, alpha, mask = _problem(n_pad=100, n_real=90)
    with pytest.raises(ValueError, match="divisible"):
        row_sharded_lml(
            kernel, jnp.asarray(kernel.theta0), X, y, alpha, mask,
            mesh=mesh,
        )
