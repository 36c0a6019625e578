"""Nox sessions for bask-tpu (dev harness parity with the reference's
noxfile, `/root/reference/noxfile.py:68-92`, rebuilt for this repo).

The CI workflow (.github/workflows/tests.yml) runs the same two jobs
directly; nox is the local one-command entry point:

    nox -s tests      # pytest on CPU with 8 virtual devices
    nox -s lint       # ruff check + format --check
"""

import nox

PYTHON_VERSIONS = ["3.10", "3.11", "3.12", "3.13"]


@nox.session(python=PYTHON_VERSIONS)
def tests(session):
    session.install("-e", ".", "pytest")
    # tests/conftest.py forces the CPU backend and 8 virtual devices;
    # x64 is enabled there for parity-grade numerics
    session.run("python", "-m", "pytest", "tests/", "-x", "-q")


@nox.session
def lint(session):
    session.install("ruff")
    session.run("ruff", "check", "bask_tpu", "bask", "tests", "benchmarks")
    session.run("ruff", "format", "--check", "bask_tpu", "bask")
