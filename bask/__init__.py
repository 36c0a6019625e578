"""Drop-in compatibility package: ``import bask`` -> bask-tpu.

Code written against kiudee/bayes-skopt imports from ``bask`` and its
submodules (``bask/__init__.py:12-35`` re-exports the public API;
tutorials import from ``bask.bayesgpr`` etc.). This package maps that
exact module layout onto bask-tpu so reference user code runs without
changing a single import:

    from bask import Optimizer, BayesGPR
    from bask.acquisition import evaluate_acquisitions, PVRS
    from bask.optimizer import Optimizer
    from bask.bayesgpr import BayesGPR
    from bask.utils import guess_priors, geometric_median
    from bask.priors import make_roundflat
    from bask.init import r2_sequence, sb_sequence
    from bask.searchcv import BayesSearchCV

The submodule aliases are registered in ``sys.modules`` at import time;
``bask.utils`` aggregates the helpers the reference keeps in one file
(bask-tpu splits them across ``bask_tpu.utils.*``).
"""

import sys as _sys

from bask_tpu import *  # noqa: F401,F403
from bask_tpu import __all__ as _all
from bask_tpu import __version__  # noqa: F401

# reference __all__ includes BayesSearchCV (bask/__init__.py:12-35);
# star-imports resolve it through module __getattr__, keeping plain
# `import bask` sklearn-free
__all__ = list(_all) + ["BayesSearchCV"]


def _alias(name, module):
    _sys.modules[f"{__name__}.{name}"] = module
    globals()[name] = module


import bask_tpu.acquisition as _acquisition  # noqa: E402
import bask_tpu.optimizer as _optimizer  # noqa: E402
import bask_tpu.models.bayesgpr as _bayesgpr  # noqa: E402
import bask_tpu.utils.init_seq as _init  # noqa: E402
from . import _utils_compat as _utils  # noqa: E402
from . import _priors_compat as _priors  # noqa: E402

_alias("acquisition", _acquisition)
_alias("optimizer", _optimizer)
_alias("bayesgpr", _bayesgpr)
_alias("init", _init)
_alias("utils", _utils)
_alias("priors", _priors)


def __getattr__(name):
    # lazy, like bask_tpu: searchcv pulls in sklearn (the submodule
    # itself is a real file, so `from bask.searchcv import ...` works)
    if name == "BayesSearchCV":
        from bask_tpu.searchcv import BayesSearchCV

        return BayesSearchCV
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
