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


# XLA:CPU segfaults inside backend_compile_and_load after a few hundred
# live compiled executables accumulate in one process (reproduced
# deterministically at the ~276th test of a full run, on a clean tree,
# with the crashing test passing in ANY smaller subset — an upstream
# LLVM-JIT code-memory issue, not a test bug). Dropping jax's
# executable caches every ~100 tests keeps the live-code footprint
# bounded; the handful of session-cached programs recompile on next
# use (costs ~1 min over the full suite).
_N_TESTS_BETWEEN_CACHE_CLEARS = 100
_test_count = {"n": 0}


def pytest_runtest_setup(item):
    _test_count["n"] += 1
    if _test_count["n"] % _N_TESTS_BETWEEN_CACHE_CLEARS == 0:
        import gc

        jax.clear_caches()
        gc.collect()


# ---------------------------------------------------------------------------
# Fast/slow split: the full suite is ~51 min on this 8-virtual-device
# CPU setup (round-5 measurement); the default per-commit target is the
# fast tier (`pytest -m 'not slow'`, ~9 min — nox session `tests`),
# with the full suite in nox `tests_all` / the CI slow job. Heavy tests
# are listed by base nodeid in tests/slow_manifest.txt (parametrized
# variants inherit) so test files stay unmarked and every file keeps
# its sub-9s smoke coverage in the fast tier. Regenerate the manifest
# per its header after big suite changes.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_MANIFEST = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")


def _slow_bases():
    bases = set()
    try:
        with open(_MANIFEST) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    bases.add(line)
    except OSError:
        pass
    return bases


def pytest_collection_modifyitems(config, items):
    bases = _slow_bases()
    if not bases:
        return
    rootdir = str(config.rootdir)
    for item in items:
        nodeid = item.nodeid.split("[")[0]
        if not nodeid.startswith("tests/"):
            # invoked from a subdirectory: normalize to repo-relative
            path = str(item.path)
            if path.startswith(rootdir):
                nodeid = (
                    path[len(rootdir):].lstrip("/")
                    + "::"
                    + item.nodeid.split("::", 1)[-1].split("[")[0]
                )
        if nodeid in bases:
            item.add_marker(pytest.mark.slow)
