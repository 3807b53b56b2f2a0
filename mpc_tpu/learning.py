"""Differentiable-MPC learning loops.

The reference demonstrates learning through the controller in two ways:
online system identification (examples/gym_pendulum_approximate.py:100-147)
and the backward tests that differentiate the solver w.r.t. cost and
dynamics parameters (tests/test_mpc.py:303-744).  This module packages
the TPU-native equivalent: imitation learning by backpropagating through
the KKT fixed point of the controller, data-parallel over a device mesh
with XLA inserting the gradient reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .solver import solve_single
from .types import MPCConfig, Solution


def batched_solve(cfg: MPCConfig, x_init, cost, dynamics,
                  u_init=None, u_lower=None, u_upper=None) -> Solution:
    """vmap the per-instance solver over a scenario batch.

    ``x_init`` is batch-major [B, n_state]; QuadCost/LinDx/bounds/u_init
    arrays are time-major [T, B, ...] (the reference layout,
    mpc/mpc.py:185-186).  Cost/dynamics given as callables are shared
    across the batch.

    On TPU, problems in the fused-kernel scope (n_ctrl=1, quadratic
    cost, SoA dynamics, no backprop - ops/fused.py:supports) dispatch to
    the single-kernel Pallas solver; everything else runs the vmapped
    jnp path.  ``cfg.use_fused`` overrides.
    """
    from .types import LinDx, QuadCost

    if cfg.use_fused != 'never':
        from .ops import fused
        in_scope = fused.supports(cfg, cost, dynamics,
                                  dtype=jnp.asarray(x_init).dtype)
        on_tpu = jax.default_backend() == 'tpu'
        if cfg.use_fused == 'always':
            if not in_scope:
                raise ValueError('use_fused="always" but the problem is '
                                 'outside the fused-kernel scope '
                                 '(see ops/fused.py:supports)')
            return fused.fused_batched_solve(
                cfg, x_init, cost, dynamics, u_init=u_init,
                u_lower=u_lower, u_upper=u_upper)
        if in_scope and on_tpu:
            return fused.fused_batched_solve(
                cfg, x_init, cost, dynamics, u_init=u_init,
                u_lower=u_lower, u_upper=u_upper)

    def one(x0, cost_i, dyn_i, u0, lb, ub):
        return solve_single(cfg, x0, cost_i, dyn_i, u_init=u0,
                            u_lower=lb, u_upper=ub)

    in_axes = (
        0,
        jax.tree_util.tree_map(lambda _: 1, cost)
        if isinstance(cost, (QuadCost,)) else None,
        jax.tree_util.tree_map(lambda _: 1, dynamics)
        if isinstance(dynamics, (LinDx,)) else None,
        1 if u_init is not None else None,
        1 if u_lower is not None else None,
        1 if u_upper is not None else None,
    )
    out_axes = Solution(x=1, u=1, costs=0, full_du_norm=0, n_iter=0,
                        n_qp_iter=0, converged=0, mean_alpha=0)
    return jax.vmap(one, in_axes=in_axes, out_axes=out_axes)(
        x_init, cost, dynamics, u_init, u_lower, u_upper)


def imitation_loss(theta, cfg: MPCConfig, x_init, u_expert,
                   make_cost: Callable, make_dynamics: Callable,
                   u_lower=None, u_upper=None):
    """Mean-squared imitation loss of the MPC controls vs expert controls.

    ``theta`` is any pytree of learnable parameters; ``make_cost(theta)``
    / ``make_dynamics(theta)`` build the (possibly parameterized) cost
    and dynamics.  Gradients flow through the solver's KKT fixed point
    (the differentiable-MPC objective of Amos et al., mirrored from the
    reference's backward tests, tests/test_mpc.py:560-649).
    """
    cost = make_cost(theta)
    dynamics = make_dynamics(theta)
    sol = batched_solve(cfg, x_init, cost, dynamics,
                        u_lower=u_lower, u_upper=u_upper)
    return jnp.mean((sol.u - u_expert) ** 2)


class TrainState(NamedTuple):
    theta: Any
    opt_state: Any
    step: jax.Array


def make_imitation_train_step(cfg: MPCConfig, optimizer,
                              make_cost: Callable,
                              make_dynamics: Callable,
                              u_lower=None, u_upper=None):
    """Build a jitted imitation-learning train step.

    With batch arrays sharded over a mesh (see parallel.shard_batch), XLA
    automatically inserts the cross-device psum for the gradient of the
    mean loss - the only collective in the framework, matching the north
    star ('collectives only for loss/gradient reduction').
    """

    import optax

    @jax.jit
    def train_step(state: TrainState, x_init, u_expert):
        loss, grads = jax.value_and_grad(imitation_loss)(
            state.theta, cfg, x_init, u_expert, make_cost, make_dynamics,
            u_lower=u_lower, u_upper=u_upper)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.theta)
        theta = optax.apply_updates(state.theta, updates)
        return TrainState(theta, opt_state, state.step + 1), loss

    return train_step
