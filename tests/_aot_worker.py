"""Subprocess worker for the cross-process AOT cache test.

Usage: python _aot_worker.py <cache_dir>

Fits a small seeded BayesGPR chain with the AOT executable cache rooted
at <cache_dir>, counting (a) executable loads (``deserialize_and_load``)
and (b) explicit ``Lowered.compile`` calls — the only ``.compile()``
call sites in this process are inside ``bask_tpu.utils.aot``, so a
second process hitting a warm cache must report ``compiles == 0``.
Prints one JSON line with the counters and a chain checksum.
"""

import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

cache_dir = sys.argv[1]

counters = {"loads": 0, "compiles": 0}

from jax.experimental import serialize_executable as se  # noqa: E402

_real_load = se.deserialize_and_load


def _counting_load(*a, **k):
    counters["loads"] += 1
    return _real_load(*a, **k)


se.deserialize_and_load = _counting_load

import jax._src.stages as _stages  # noqa: E402

_real_compile = _stages.Lowered.compile


def _counting_compile(self, *a, **k):
    counters["compiles"] += 1
    return _real_compile(self, *a, **k)


_stages.Lowered.compile = _counting_compile

from bask_tpu import BayesGPR, enable_aot_cache  # noqa: E402
from bask_tpu.ops import kernels as bk  # noqa: E402

enable_aot_cache(cache_dir)

rng = np.random.RandomState(0)
X = rng.uniform(size=(6, 1))
y = np.sin(3 * X[:, 0])
gp = BayesGPR(
    kernel=bk.ConstantKernel(1.0, (0.1, 2.0)) * bk.Matern(
        0.3, (0.05, 2.0), nu=2.5
    ),
    random_state=5,
    optimizer=None,  # skip ML-II: the scipy driver count varies per run
)
gp.fit(
    X, y, n_desired_samples=30, n_burnin=3, n_walkers_per_thread=10,
    progress=False,
)

print(
    json.dumps(
        {
            "loads": counters["loads"],
            "compiles": counters["compiles"],
            "checksum": float(np.sum(gp.chain_)),
            "theta0": float(gp.theta[0]),
        }
    )
)
