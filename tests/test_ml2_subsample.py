"""Huge-n ML-II warm-start subsampling (round 5).

``BayesGPR(ml2_subsample=m)`` optimizes the chain-initialization theta
on a random m-point subset through the fast dense path. Motivation is
measured (BASELINE round 5): the row-sharded value+grad at n=32768
OOMs one 16 GB chip while the chain itself fits — and the warm start
is only the MCMC starting point (reference semantics,
``bask/bayesgpr.py:78-79``). The MCMC always runs on the FULL data.
"""

import numpy as np
import pytest

from bask_tpu import BayesGPR


def _toy(n=96, d=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(n, d))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.randn(n)
    return X, y


def test_subsampled_fit_end_to_end():
    X, y = _toy()
    gp = BayesGPR(random_state=0, ml2_subsample=48)
    gp.fit(X, y, n_desired_samples=40, n_burnin=2, progress=False)
    # the CHAIN ran on the full data: padded bucket covers all 96 rows
    assert int(gp._data.mask.sum()) == 96
    mu, std = gp.predict(X[:5], return_std=True)
    assert np.isfinite(mu).all() and np.isfinite(std).all()


def test_subsample_noop_when_n_small():
    """n <= ml2_subsample draws nothing from the RNG: bit-identical to
    the plain fit with the same seed."""
    X, y = _toy(n=40)
    gp1 = BayesGPR(random_state=3, ml2_subsample=64)
    gp1.fit(X, y, n_desired_samples=30, n_burnin=2, progress=False)
    gp2 = BayesGPR(random_state=3)
    gp2.fit(X, y, n_desired_samples=30, n_burnin=2, progress=False)
    assert np.array_equal(gp1.chain_, gp2.chain_)


def test_subsampled_theta_close_to_full():
    """The subsample warm start lands near the full-data ML point —
    it is only a chain seed, but it should not be garbage."""
    from bask_tpu.ops import kernels as bk

    X, y = _toy(n=128, seed=1)

    def warm_theta(**kw):
        gp = BayesGPR(random_state=0, **kw)
        gp._spec = gp._user_kernel + bk.WhiteKernel(1.0, (1e-5, 1e5))
        gp._priors_cache = None
        gp._set_data(X, y, None)
        return gp._ml2_optimize()

    t_full = warm_theta()
    t_sub = warm_theta(ml2_subsample=96)
    assert np.all(np.abs(t_full - t_sub) < 1.5)  # log-space proximity


def test_subsample_with_noise_vector():
    X, y = _toy()
    nv = np.full(len(y), 0.01)
    gp = BayesGPR(random_state=0, ml2_subsample=48)
    gp.fit(
        X, y, noise_vector=nv,
        n_desired_samples=30, n_burnin=2, progress=False,
    )
    assert np.isfinite(gp.predict(X[:3])).all()


def test_invalid_subsample_raises():
    with pytest.raises(ValueError, match="ml2_subsample"):
        BayesGPR(ml2_subsample=1)


def test_subsample_checkpoint_roundtrip(tmp_path):
    from bask_tpu.utils.serialization import load_gpr, save_gpr

    X, y = _toy()
    gp = BayesGPR(random_state=0, ml2_subsample=48)
    gp.fit(X, y, n_desired_samples=30, n_burnin=2, progress=False)
    p = tmp_path / "gp.npz"
    save_gpr(gp, p)
    gp2 = load_gpr(p)
    assert gp2.ml2_subsample == 48
