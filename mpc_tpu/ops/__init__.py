"""Compute ops: batched small-matrix linalg, PNQP, LQR scans, custom VJP."""

from . import linalg, lqr, pnqp, diff
from .pnqp import pnqp as pnqp_solve

__all__ = ['linalg', 'lqr', 'pnqp', 'diff', 'pnqp_solve']
