"""Hyperposterior-marginal pathwise Thompson top-k: per-draw chain rows,
warping support, and sensible minimizer locations."""

import numpy as np
import pytest

from bask_tpu.models.bayesgpr import BayesGPR
from bask_tpu.ops import kernels as bk


def _fit(warp=False):
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(25, 1))
    y = (X[:, 0] - 0.6) ** 2 + 0.02 * rng.randn(25)
    gp = BayesGPR(
        kernel=bk.ConstantKernel(1.0, (0.1, 2.0))
        * bk.Matern(0.3, (0.05, 2.0), nu=2.5),
        random_state=0,
        warp_inputs=warp,
    )
    gp.fit(X, y, n_burnin=3, progress=False)
    return gp


@pytest.mark.parametrize("warp", [False, True])
def test_hyper_topk_finds_minimum_region(warp):
    gp = _fit(warp)
    Xc = np.linspace(0, 1, 512)[:, None]
    idx = gp.thompson_argmin_pathwise(
        Xc, n_samples=16, top_k=4, random_state=1, sample_mean=False
    )
    assert idx.shape == (16, 4)
    # most draws should place their minimizer near the true minimum 0.6
    best_x = Xc[idx[:, 0], 0]
    assert np.median(np.abs(best_x - 0.6)) < 0.2


def test_consensus_and_hyper_agree_roughly():
    gp = _fit(False)
    Xc = np.linspace(0, 1, 256)[:, None]
    i_mean = gp.thompson_argmin_pathwise(
        Xc, n_samples=32, top_k=1, random_state=2, sample_mean=True
    )
    i_hyper = gp.thompson_argmin_pathwise(
        Xc, n_samples=32, top_k=1, random_state=2, sample_mean=False
    )
    x_mean = np.median(Xc[i_mean[:, 0], 0])
    x_hyper = np.median(Xc[i_hyper[:, 0], 0])
    assert abs(x_mean - x_hyper) < 0.25
