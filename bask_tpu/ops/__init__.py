from . import kernels, linalg  # noqa: F401
