#!/usr/bin/env python
"""Shim for legacy installs; configuration lives in pyproject.toml
(the reference ships an equivalent minimal setup.py, setup.py:1-16)."""
from setuptools import setup

setup()
