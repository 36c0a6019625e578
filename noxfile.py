"""Nox sessions for bask-tpu (dev harness parity with the reference's
noxfile, `/root/reference/noxfile.py:68-92`, rebuilt for this repo).

The CI workflow (.github/workflows/tests.yml) runs the same two jobs
directly; nox is the local one-command entry point:

    nox -s tests      # fast pytest tier on CPU with 8 virtual devices
    nox -s tests_all  # the full suite including slow integration tiers
    nox -s lint       # ruff check + format --check
    nox -s build      # wheel build + clean-venv install + import smoke
"""

import nox

PYTHON_VERSIONS = ["3.10", "3.11", "3.12", "3.13"]


@nox.session(python=PYTHON_VERSIONS)
def tests(session):
    session.install("-e", ".", "pytest")
    # tests/conftest.py forces the CPU backend and 8 virtual devices;
    # x64 is enabled there for parity-grade numerics. The default tier
    # excludes the slow end-to-end integrations (see tests_all).
    session.run("python", "-m", "pytest", "tests/", "-x", "-q",
                "-m", "not slow")


@nox.session
def tests_all(session):
    session.install("-e", ".", "pytest")
    session.run("python", "-m", "pytest", "tests/", "-x", "-q")


@nox.session
def lint(session):
    session.install("ruff")
    session.run("ruff", "check", "bask_tpu", "bask", "tests", "benchmarks")
    session.run("ruff", "format", "--check", "bask_tpu", "bask")


@nox.session
def build(session):
    """Distribution smoke: build a wheel, install it into the (clean)
    session venv, and run a tiny BO loop from the INSTALLED package —
    catches packaging regressions (missing modules/data, broken
    metadata) that an editable install hides."""
    session.install("build")
    session.run("python", "-m", "build", "--wheel", "--outdir",
                session.create_tmp())
    import glob
    import os

    wheel = sorted(glob.glob(os.path.join(session.create_tmp(),
                                          "*.whl")))[-1]
    session.install(wheel)
    # run from the venv tmp dir so 'import bask_tpu' resolves to the
    # installed wheel, never the repo tree
    session.chdir(session.create_tmp())
    session.run(
        "python", "-c",
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import bask_tpu, bask\n"
        "from bask import Optimizer\n"
        "opt = Optimizer(dimensions=[(-1.0, 1.0)], n_initial_points=2,"
        " random_state=1, n_points=16)\n"
        "for _ in range(3):\n"
        "    x = opt.ask()\n"
        "    opt.tell(x, float((x[0]-0.3)**2), gp_samples=10, gp_burnin=2)\n"
        "print('wheel smoke OK')",
    )
