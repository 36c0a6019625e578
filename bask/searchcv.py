"""``bask.searchcv`` compatibility module (reference ``bask/searchcv.py``).

A real file rather than a ``sys.modules`` alias so that
``from bask.searchcv import BayesSearchCV`` works; importing it pulls in
scikit-learn (same laziness as ``bask_tpu``: the top-level
``bask.BayesSearchCV`` attribute also defers until first use).
"""

from bask_tpu.searchcv import BayesSearchCV  # noqa: F401

__all__ = ["BayesSearchCV"]
