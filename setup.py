"""Thin setuptools shim — all metadata lives in pyproject.toml.

Kept so the legacy editable route (``pip install -e . --no-use-pep517
--no-build-isolation`` or ``python setup.py develop``) works on
environments whose setuptools predates built-in bdist_wheel (< 70.1)
and that have no ``wheel`` package / network access — the PEP 660
editable-wheel path needs one of those. Modern environments can ignore
this file; ``pip install -e .`` uses pyproject.toml directly.
"""

from setuptools import setup

setup()
