"""Utilities: finite differences, logging, numerics helpers."""

from .fd import fd_grad, fd_hess, fd_jacobian
from .logging import table_log

__all__ = ['fd_grad', 'fd_hess', 'fd_jacobian', 'table_log']
