"""Utilities: finite differences, logging, numerics debugging,
training-state checkpointing."""

from .fd import fd_grad, fd_hess, fd_jacobian
from .logging import table_log
from .debug import assert_finite, finite_mask, nan_checks
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = ['fd_grad', 'fd_hess', 'fd_jacobian', 'table_log',
           'assert_finite', 'finite_mask', 'nan_checks',
           'save_checkpoint', 'load_checkpoint']
