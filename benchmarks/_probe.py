"""Fail-fast device probe for hardware benchmarks.

Through the axon tunnel, a dead/hung worker makes the FIRST device op
block forever (observed repeatedly; see CLAUDE.md). bench.py guards
its run with a threaded trivial-op watchdog; this module shares that
pattern with the standalone benches so a mid-queue tunnel drop costs a
probe timeout (default 120 s), not the queue item's full timeout.
"""

import os
import sys
import threading


def probe_or_exit(timeout: float | None = None) -> None:
    """Run one trivial device op with a watchdog; exit(2) on timeout.

    Call AFTER backend selection (e.g. the BENCH_CPU branch) and before
    any real device work. No-op overhead when the device is healthy.
    """
    if timeout is None:
        timeout = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "120"))

    ok = threading.Event()

    def _probe():
        import jax.numpy as jnp

        x = jnp.ones((8,)) * 2.0
        float(x[0])  # scalar host fetch: the only reliable sync on axon
        ok.set()

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout)
    if not ok.is_set():
        print(
            f"device unreachable: trivial op did not complete within "
            f"{timeout:.0f}s (tunnel hung?) — aborting benchmark",
            flush=True,
        )
        sys.exit(2)
