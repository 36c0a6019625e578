"""``import bask`` compatibility layer: reference user code must run
with unchanged imports (reference ``bask/__init__.py:12-35`` and the
tutorial notebooks' submodule imports)."""

import numpy as np


def test_toplevel_reexports():
    import bask

    for name in (
        "BayesGPR",
        "Optimizer",
        "evaluate_acquisitions",
        "ExpectedImprovement",
        "PVRS",
        "geometric_median",
        "guess_priors",
        "construct_default_kernel",
        "r2_sequence",
        "validate_zeroone",
    ):
        assert hasattr(bask, name), name
    assert bask.__version__


def test_submodule_imports_match_reference_layout():
    from bask.acquisition import PVRS, evaluate_acquisitions  # noqa: F401
    from bask.bayesgpr import BayesGPR  # noqa: F401
    from bask.init import r2_sequence, sb_sequence  # noqa: F401
    from bask.optimizer import Optimizer  # noqa: F401
    from bask.priors import make_roundflat  # noqa: F401
    from bask.utils import (  # noqa: F401
        construct_default_kernel,
        geometric_median,
        get_progress_bar,
        guess_priors,
        validate_zeroone,
    )

    import bask

    assert bask.Optimizer is Optimizer
    assert bask.BayesGPR is BayesGPR


def test_searchcv_lazy():
    import bask

    from bask.searchcv import BayesSearchCV

    assert bask.BayesSearchCV is BayesSearchCV


def test_reference_style_loop_runs():
    """A verbatim reference-style snippet (imports and all) end to end."""
    from bask import Optimizer

    opt = Optimizer(
        [(0.0, 1.0)], n_initial_points=2, init_strategy="random",
        random_state=0,
    )
    result = opt.run(
        lambda x: float((x[0] - 0.6) ** 2), n_iter=4, gp_burnin=2,
        gp_samples=20, n_samples=1,
    )
    assert np.isfinite(result.fun)
    assert len(opt.Xi) == 4
