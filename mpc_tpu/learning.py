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


def _cost_axes(cst):
    """vmap in_axes for a cost: batch-shared arrays map with None."""
    from .types import QuadCost
    if not isinstance(cst, QuadCost):
        return None
    return QuadCost(1 if jnp.ndim(cst.C) == 4 else None,
                    1 if jnp.ndim(cst.c) == 3 else None)


def _dyn_axes(dyn):
    from .types import LinDx
    if not isinstance(dyn, LinDx):
        return None
    return LinDx(1 if jnp.ndim(dyn.F) == 4 else None,
                 (1 if jnp.ndim(dyn.f) == 3 else None)
                 if dyn.f is not None else None)


def _phase2_kernel_bwd(cfg, x_init, cost, dynamics, sol1,
                       u_lower, u_upper):
    """Differentiable phase 2 with the fused KKT-backward kernel
    (ops/fused_bwd.py): re-linearization/quadratization at the solution
    (differentiable, so gradients reach cost/dynamics params through
    the dC/dc/dF/df cotangents), then a batched custom_vjp fixed point
    whose backward runs as ONE Pallas kernel instead of a vmapped chain
    of small XLA ops.  Batch-shared quadratic costs / LinDx dynamics
    stay UN-broadcast ([T, ...]): they ride the kernel's SMEM fast path
    and their gradients come back batch-reduced straight from the
    kernel - no [T, B, ntau, ntau] HBM materialization on either side
    of the solve."""
    from .ops.fused_bwd import make_batched_fixed_point
    from .solver import linearize_dynamics, quadratize_cost
    from .types import LinDx, QuadCost

    T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
    dtype = jnp.asarray(x_init).dtype
    B = x_init.shape[0]
    sg = jax.lax.stop_gradient
    bx, bu = sg(sol1.x), sg(sol1.u)

    # shared only when EVERY leaf is batch-shared: the reference
    # broadcasts leaves independently (mpc/mpc.py:205-226), so e.g. a
    # shared C may arrive with per-example c - that pair is batched
    cost_shared = (isinstance(cost, QuadCost) and jnp.ndim(cost.C) <= 3
                   and jnp.ndim(cost.c) <= 2)
    dyn_shared = (isinstance(dynamics, LinDx) and jnp.ndim(dynamics.F) == 3
                  and (dynamics.f is None or jnp.ndim(dynamics.f) == 2))

    if cost_shared:
        # quadratize is trajectory-independent for QuadCost; keep the
        # shared [T, ntau, ntau] layout (the kernel reduces dC/dc)
        C, c, _ = quadratize_cost(cost, bx[:, 0], bu[:, 0])
    else:
        C, c, _ = jax.vmap(
            lambda x, u, cost_i: quadratize_cost(cost_i, x, u),
            in_axes=(1, 1, _cost_axes(cost)), out_axes=1)(bx, bu, cost)
    if dyn_shared:
        F = jnp.asarray(dynamics.F, dtype)
        f = (jnp.asarray(dynamics.f, dtype)
             if dynamics.f is not None else None)
    else:
        F, f = jax.vmap(
            lambda x, u, dyn_i: linearize_dynamics(dyn_i, x, u,
                                                   cfg.grad_method),
            in_axes=(1, 1, _dyn_axes(dynamics)), out_axes=1)(
            bx, bu, dynamics)

    has_f = f is not None
    if has_f:
        f_arr = f
    elif dyn_shared:
        f_arr = jnp.zeros((T - 1, ns), dtype)
    else:
        f_arr = jnp.zeros((T - 1, B, ns), dtype)
    has_bounds = u_lower is not None
    if has_bounds:
        def to_TBn(b):
            b = jnp.asarray(b, dtype)
            if b.ndim == 0:                      # scalar
                b = jnp.full((T, nc), b)
            if b.ndim == 2:                      # batch-shared [T, nc]
                b = b[:, None, :]
            return jnp.broadcast_to(b, (T, B, nc))

        lb = to_TBn(u_lower)
        ub = to_TBn(u_upper)
    else:
        lb = ub = jnp.zeros((T, B, nc), dtype)

    fp = make_batched_fixed_point(ns, has_bounds, has_f)
    x, u = fp(x_init, C, c, F, f_arr, lb, ub, bx, bu)

    if cfg.detach_unconverged:
        conv = sol1.converged[None, :, None]
        x = jnp.where(conv, x, sg(x))
        u = jnp.where(conv, u, sg(u))
    return x, u


def batched_solve(cfg: MPCConfig, x_init, cost, dynamics,
                  u_init=None, u_lower=None, u_upper=None,
                  u_zero_I=None, prev_ctrl=None) -> Solution:
    """vmap the per-instance solver over a scenario batch.

    This is THE batched dispatch path: the ``MPC`` class delegates here
    after normalizing shapes, so both entry points always pick the same
    (fused-kernel or jnp) execution path.

    ``x_init`` is batch-major [B, n_state]; QuadCost/LinDx/bounds/u_init/
    u_zero_I arrays are time-major [T, B, ...] (the reference layout,
    mpc/mpc.py:185-186) or batch-shared with the batch axis dropped;
    ``prev_ctrl`` is [B, n_ctrl] or [n_ctrl].  Cost/dynamics given as
    callables are shared across the batch.

    On TPU, problems in the fused-kernel scope (quadratic cost, SoA or
    LinDx dynamics - ops/fused.py:supports) dispatch to the
    single-kernel Pallas solver; differentiable solves run phase 1 in
    the kernel and attach the vmapped custom_vjp fixed point on top.
    Everything else runs the vmapped jnp path.  ``cfg.use_fused``
    overrides.
    """
    if (u_lower is None) != (u_upper is None):
        # one-sided bounds would silently clamp against 0.0 in the
        # Riccati control solve (ops/lqr.py substitutes zeros); the
        # reference has no one-sided box either (mpc/mpc.py:127-130)
        raise ValueError('u_lower and u_upper must both be given or '
                         'both be None')
    if cfg.use_fused != 'never':
        import dataclasses

        from .ops import fused
        from .solver import fixed_point_phase

        dtype = jnp.asarray(x_init).dtype
        on_tpu = jax.default_backend() == 'tpu'
        cfg1 = dataclasses.replace(cfg, backprop=False)
        in_scope = fused.supports(cfg1, cost, dynamics,
                                  u_zero_I=u_zero_I, prev_ctrl=prev_ctrl,
                                  u_lower=u_lower, dtype=dtype,
                                  n_batch=jnp.shape(x_init)[0])
        use = in_scope and (on_tpu or cfg.use_fused == 'always')
        if cfg.use_fused == 'always' and not in_scope:
            raise ValueError('use_fused="always" but the problem is '
                             'outside the fused-kernel scope '
                             '(see ops/fused.py:supports)')
        if use:
            B = x_init.shape[0]
            u_init_f = u_init
            if u_init_f is not None and jnp.ndim(u_init_f) == 2:
                u_init_f = jnp.broadcast_to(
                    u_init_f[:, None], (cfg.T, B, cfg.n_ctrl))
            if not cfg.backprop:
                return fused.fused_batched_solve(
                    cfg, x_init, cost, dynamics, u_init=u_init_f,
                    u_lower=u_lower, u_upper=u_upper,
                    u_zero_I=u_zero_I, prev_ctrl=prev_ctrl)
            # differentiable solve: phase 1 (the iterations) through the
            # kernel with gradients stopped - exactly the reference's
            # detached outer loop (mpc/mpc.py:249-262) - then the
            # custom_vjp fixed-point layer vmapped at the solution
            sg = jax.lax.stop_gradient

            def sgt(t):
                return jax.tree_util.tree_map(
                    lambda a: sg(a) if isinstance(a, jax.Array) else a, t)

            sol1 = fused.fused_batched_solve(
                cfg1, sg(x_init), sgt(cost), sgt(dynamics),
                u_init=sg(u_init_f) if u_init_f is not None else None,
                u_lower=sgt(u_lower), u_upper=sgt(u_upper),
                u_zero_I=sgt(u_zero_I), prev_ctrl=sgt(prev_ctrl))

            # phase 2: prefer the fused KKT-backward kernel (one Pallas
            # kernel over the whole batch instead of a vmapped chain of
            # small XLA ops); the vmapped jnp custom_vjp remains the
            # fallback (slew, f64, VMEM-exceeding shapes)
            from .ops import fused_bwd
            from .types import QuadCost as _QC, LinDx as _LD
            _cost_sh = (isinstance(cost, _QC) and jnp.ndim(cost.C) <= 3
                        and jnp.ndim(cost.c) <= 2)
            _dyn_sh = (isinstance(dynamics, _LD)
                       and jnp.ndim(dynamics.F) == 3
                       and (dynamics.f is None
                            or jnp.ndim(dynamics.f) == 2))
            if (cfg.slew_rate_penalty is None
                    and fused_bwd.supports_bwd(cfg.T, cfg.n_state,
                                               cfg.n_ctrl, dtype,
                                               cost_shared=_cost_sh,
                                               dyn_shared=_dyn_sh)):
                with jax.default_matmul_precision(cfg.matmul_precision):
                    x, u = _phase2_kernel_bwd(cfg, x_init, cost,
                                              dynamics, sol1,
                                              u_lower, u_upper)
                return sol1._replace(x=x, u=u)

            lb2, ub2 = u_lower, u_upper
            if lb2 is not None and jnp.ndim(lb2) == 0:
                lb2 = jnp.full((cfg.T, cfg.n_ctrl), lb2, dtype)
                ub2 = jnp.full((cfg.T, cfg.n_ctrl), ub2, dtype)

            def ph2(x0, cost_i, dyn_i, bx, bu, lb_i, ub_i, conv, pc_i):
                return fixed_point_phase(cfg, x0, cost_i, dyn_i,
                                         sg(bx), sg(bu), lb_i, ub_i, conv,
                                         prev_ctrl=pc_i)

            b_ax = ((1 if jnp.ndim(lb2) == 3 else None)
                    if lb2 is not None else None)
            pc_ax = ((0 if jnp.ndim(prev_ctrl) == 2 else None)
                     if prev_ctrl is not None else None)
            # phase 2 must run at the configured matmul precision too:
            # its KKT backward otherwise executes at TPU's bf16 default
            with jax.default_matmul_precision(cfg.matmul_precision):
                x, u = jax.vmap(
                    ph2, in_axes=(0, _cost_axes(cost), _dyn_axes(dynamics),
                                  1, 1, b_ax, b_ax, 0, pc_ax),
                    out_axes=(1, 1))(
                    x_init, cost, dynamics, sol1.x, sol1.u, lb2, ub2,
                    sol1.converged, prev_ctrl)
            return sol1._replace(x=x, u=u)

    def one(x0, cost_i, dyn_i, u0, lb, ub, uz, pc):
        return solve_single(cfg, x0, cost_i, dyn_i, u_init=u0,
                            u_lower=lb, u_upper=ub, u_zero_I=uz,
                            prev_ctrl=pc)

    if u_lower is not None and jnp.ndim(u_lower) == 0:
        dt = jnp.asarray(x_init).dtype
        u_lower = jnp.full((cfg.T, cfg.n_ctrl), u_lower, dt)
        u_upper = jnp.full((cfg.T, cfg.n_ctrl), u_upper, dt)
    in_axes = (
        0,
        _cost_axes(cost),
        _dyn_axes(dynamics),
        (1 if jnp.ndim(u_init) == 3 else None) if u_init is not None
        else None,
        (1 if jnp.ndim(u_lower) == 3 else None) if u_lower is not None
        else None,
        (1 if jnp.ndim(u_upper) == 3 else None) if u_upper is not None
        else None,
        (1 if jnp.ndim(u_zero_I) == 3 else None) if u_zero_I is not None
        else None,
        (0 if jnp.ndim(prev_ctrl) == 2 else None) if prev_ctrl is not None
        else None,
    )
    out_axes = Solution(x=1, u=1, costs=0, full_du_norm=0, n_iter=0,
                        n_qp_iter=0, converged=0, alpha=0,
                        iter_stats=0 if cfg.verbose > 0 else None)
    return jax.vmap(one, in_axes=in_axes, out_axes=out_axes)(
        x_init, cost, dynamics, u_init, u_lower, u_upper, u_zero_I,
        prev_ctrl)


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


def make_sharded_train_step(cfg: MPCConfig, mesh, optimizer,
                            make_cost: Callable,
                            make_dynamics: Callable,
                            u_lower=None, u_upper=None,
                            batch_axes=None):
    """Imitation train step with EXPLICIT shard_map data parallelism.

    ``make_imitation_train_step`` leaves partitioning to XLA's
    automatic sharding propagation, which cannot split a
    ``pallas_call``: on a real multi-chip mesh the fused solver would
    be replicated (every chip solving the full batch).  This variant
    ``shard_map``s the per-shard loss gradient over the mesh - each
    device runs the fused kernel on its LOCAL batch shard - and
    reduces with one ``pmean``, the scale-out layout of SURVEY.md
    section 2.3 / the BASELINE north star (collectives only for the
    loss/gradient reduction; the solve itself is embarrassingly
    parallel per example, like ``parallel.solve_sharded``).

    ``theta`` (and the optimizer state) are replicated; ``x_init``
    [B, ns] and ``u_expert`` [T, B, nc] are sharded on the batch axis
    over ``batch_axes`` (default: ALL mesh axes, the (hosts, chips)
    pod layout of ``parallel.distributed.make_pod_mesh``).  B must
    divide evenly over the devices.  ``make_cost``/``make_dynamics``
    run UNDER the shard_map, so they must be local-batch-size
    agnostic: return batch-shared layouts (e.g.
    ``QuadCost(C_[T,ntau,ntau], c_[T,ntau])``) or derive the batch
    size from traced operands, never from a closed-over global B.
    ``u_lower``/``u_upper`` likewise: scalars or [T, nc] shared.
    """
    import optax
    from jax.sharding import PartitionSpec as P

    if batch_axes is None:
        batch_axes = mesh.axis_names
    # a bare axis name must not be split into characters
    axes = ((batch_axes,) if isinstance(batch_axes, str)
            else tuple(batch_axes))

    def local_grad(theta, x0, u_exp):
        loss, grads = jax.value_and_grad(imitation_loss)(
            theta, cfg, x0, u_exp, make_cost, make_dynamics,
            u_lower=u_lower, u_upper=u_upper)
        # equal shard sizes: global mean = mean of per-shard means
        loss = jax.lax.pmean(loss, axes)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axes), grads)
        return loss, grads

    sharded_grad = jax.shard_map(
        local_grad, mesh=mesh,
        in_specs=(P(), P(axes), P(None, axes)),
        out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def train_step(state: TrainState, x_init, u_expert):
        loss, grads = sharded_grad(state.theta, x_init, u_expert)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.theta)
        theta = optax.apply_updates(state.theta, updates)
        return TrainState(theta, opt_state, state.step + 1), loss

    return train_step
