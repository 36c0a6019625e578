"""``bask.utils`` compatibility module.

The reference keeps these helpers in one file (``bask/utils.py``);
bask-tpu splits them across ``bask_tpu.utils.*``. This module restores
the reference's flat namespace.
"""

from bask_tpu.utils.median import geometric_median  # noqa: F401
from bask_tpu.utils.priors import (  # noqa: F401
    construct_default_kernel,
    guess_priors,
)
from bask_tpu.utils.progress import get_progress_bar  # noqa: F401
from bask_tpu.utils.validation import validate_zeroone  # noqa: F401

__all__ = [
    "geometric_median",
    "guess_priors",
    "construct_default_kernel",
    "get_progress_bar",
    "validate_zeroone",
]
