"""``kernel_`` must carry the fitted hyperparameters.

Reference parity: sklearn GPR's ``kernel_`` reflects the fitted theta
(the reference reads ``kernel_.theta`` and rebuilds kernels from it,
``bask/bayesgpr.py:163,200-217``). bask-tpu keeps the *pristine* spec
as the jit static argument internally; the public property must still
show (and round-trip) the consensus values.
"""

import numpy as np

from bask_tpu import BayesGPR
from bask_tpu.ops.kernels import ConstantKernel, Matern


def _fit_gp():
    rng = np.random.RandomState(0)
    X = rng.uniform(size=(10, 1))
    y = np.sin(4.0 * X[:, 0]) + 0.1 * rng.randn(10)
    gp = BayesGPR(
        kernel=ConstantKernel(1.0, (0.1, 10.0))
        * Matern(1.0, (0.05, 5.0), nu=2.5),
        random_state=0,
    )
    gp.fit(X, y, n_burnin=3, n_desired_samples=30, progress=False)
    return gp


def test_kernel_property_carries_fitted_theta():
    gp = _fit_gp()
    fitted = gp.kernel_
    # theta round-trips through the spec's log-parameter vector
    np.testing.assert_allclose(fitted.theta0, gp.theta, rtol=1e-12)
    # the repr shows fitted values, not the constructor values
    assert "length_scale=1.0," not in repr(fitted).replace(" ", "")

    # internal pristine spec is untouched (jit static-arg stability)
    np.testing.assert_allclose(
        gp._spec.theta0[:2], np.log([1.0, 1.0]), rtol=1e-12
    )


def test_kernel_property_unfitted_and_setter():
    gp = BayesGPR(
        kernel=ConstantKernel(1.0, (0.1, 10.0))
        * Matern(1.0, (0.05, 5.0), nu=2.5)
    )
    assert gp.kernel_ is None
    fitted = _fit_gp()
    gp.kernel_ = fitted._spec  # reference code assigns kernel_ directly
    assert gp._spec is fitted._spec
