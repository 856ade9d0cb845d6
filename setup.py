"""Thin shim: all metadata lives in pyproject.toml (PEP 621).

Kept so `pip install -e .` works on boxes whose setuptools predates
PEP 660 editable wheels or that lack the `wheel` package (pip then
falls back to the legacy `setup.py develop` path, which needs this
file). Mirrors the reference's setuptools entry
(/root/reference/setup.py) in spirit; the console script is declared
in pyproject.toml ([project.scripts] spark-etl).
"""
from setuptools import setup

setup()
