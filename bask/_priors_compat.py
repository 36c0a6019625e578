"""``bask.priors`` compatibility module (reference ``bask/priors.py``)."""

from bask_tpu.utils.priors import make_roundflat  # noqa: F401

__all__ = ["make_roundflat"]
