"""Sphinx configuration for the bask-tpu API reference.

Mirrors the reference's documented build surface
(``/root/reference/docs/conf.py``) without copying it: autodoc +
napoleon over the ``bask_tpu`` package. The build environment this repo
develops in has no sphinx available, so ``make docs`` runs the
dependency-free ``docs/gen_api.py`` generator instead; this file makes
``sphinx-build -b html docs docs/_build`` work wherever sphinx IS
installed.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "bask-tpu"
author = "bask-tpu developers"
copyright = "2026, bask-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autosummary_generate = True
autodoc_default_options = {
    "members": True,
    "undoc-members": False,
    "show-inheritance": True,
}
napoleon_google_docstring = True
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
    "sklearn": ("https://scikit-learn.org/stable/", None),
}

templates_path = ["_templates"]
exclude_patterns = ["_build", "api"]

html_theme = "alabaster"
master_doc = "index"
