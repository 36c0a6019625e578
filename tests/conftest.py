"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with float64 enabled for numerical parity against
the NumPy/SciPy/sklearn oracles.
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (TPU tunnel),
# but tests must run on the virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient axon sitecustomize registers the TPU backend regardless of
# JAX_PLATFORMS; config.update overrides it reliably.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
