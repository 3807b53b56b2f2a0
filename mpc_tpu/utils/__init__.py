"""Utilities: finite differences, logging, numerics debugging."""

from .fd import fd_grad, fd_hess, fd_jacobian
from .logging import table_log
from .debug import assert_finite, finite_mask, nan_checks

__all__ = ['fd_grad', 'fd_hess', 'fd_jacobian', 'table_log',
           'assert_finite', 'finite_mask', 'nan_checks']
