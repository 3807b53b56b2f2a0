"""mpc_tpu: a TPU-native differentiable MPC framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
locuslab/mpc.pytorch: a batched, box-constrained, differentiable iLQR
solver whose backward pass differentiates through the KKT fixed point of
the converged controller (Amos et al., NeurIPS 2018).

Public surface:
  MPC                      - reference-compatible batched solver class
  QuadCost, LinDx          - cost / linear-dynamics pytrees
  GradMethods              - dynamics-Jacobian method enum
  MPCConfig, Solution      - static config / full solver output
  solve_single             - pure per-instance functional solver
                             (vmap/jit/grad/pjit-composable)
"""

from .types import GradMethods, LinDx, MPCConfig, QuadCost, Solution
from .mpc import MPC, SlewRateCost
from .solver import (linearize_dynamics, quadratize_cost, rollout,
                     solve_single, trajectory_cost)
from .learning import (TrainState, batched_solve, imitation_loss,
                       make_imitation_train_step,
                       make_sharded_train_step)
from .closed_loop import make_closed_loop

__version__ = '0.1.0'

__all__ = [
    'MPC', 'SlewRateCost', 'QuadCost', 'LinDx', 'GradMethods',
    'MPCConfig', 'Solution',
    'solve_single', 'batched_solve', 'rollout', 'trajectory_cost',
    'linearize_dynamics', 'quadratize_cost',
    'TrainState', 'imitation_loss', 'make_imitation_train_step',
    'make_sharded_train_step', 'make_closed_loop',
]
