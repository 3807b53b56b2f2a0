"""User-facing MPC API with reference-compatible shapes and semantics.

This is the TPU-native equivalent of the reference's ``MPC`` nn.Module
(mpc/mpc.py:58-337): same constructor knobs, same time-major
``[T, n_batch, ...]`` tensor layout, same ``(x, u, costs)`` return.  The
class is a thin stateless wrapper: it normalizes/broadcasts shapes
(reference mpc/mpc.py:193-236), then dispatches to a cached jitted
``vmap`` of the functional per-instance solver in ``solver.py``.

For fully-jittable pipelines (training loops, pjit sharding) use
``mpc_tpu.batched_solve`` or ``mpc_tpu.solver.solve_single`` directly -
the class ``__call__`` performs a host-side convergence check when
``exit_unconverged`` is set (the reference asserts there,
mpc/mpc.py:321-324), which forces a device sync.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from . import solver
from .types import GradMethods, LinDx, MPCConfig, QuadCost, Solution


# Compiled solvers are cached at module level, keyed by (config,
# structural flags, callable identities), so fresh MPC instances with the
# same configuration - the common receding-horizon pattern of re-creating
# the controller every env step (reference examples/gym_pendulum.py:92-95)
# - reuse the compiled program instead of re-tracing.
_SOLVER_CACHE = {}


def _bcast_cost(C, c, T, n_batch, n_tau):
    """Add missing time/batch dims (reference mpc/mpc.py:205-226)."""
    if C.ndim == 2:
        C = jnp.broadcast_to(C, (T, n_batch, n_tau, n_tau))
    elif C.ndim == 3:
        C = jnp.broadcast_to(C[:, None], (T, n_batch, n_tau, n_tau))
    if c.ndim == 1:
        c = jnp.broadcast_to(c, (T, n_batch, n_tau))
    elif c.ndim == 2:
        c = jnp.broadcast_to(c[:, None], (T, n_batch, n_tau))
    if C.ndim != 4 or c.ndim != 3:
        raise ValueError('MPC Error: Unexpected QuadCost shape.')
    return C, c


def _bcast_bound(v, T, n_batch, n_ctrl, dtype):
    """Bounds may be floats or [T, n_batch, n_ctrl] arrays
    (reference mpc/mpc.py:81-83)."""
    if v is None:
        return None
    v = jnp.asarray(v, dtype)
    return jnp.broadcast_to(v, (T, n_batch, n_ctrl))


class MPC:
    """A differentiable box-constrained iLQR solver (TPU-native).

    Same constructor arguments, defaults and semantics as the reference
    (mpc/mpc.py:77-144).  Instances are stateless and cheap; the compiled
    solver is cached across calls with matching shapes/dtypes.
    """

    def __init__(self, n_state, n_ctrl, T,
                 u_lower=None, u_upper=None,
                 u_zero_I=None,
                 u_init=None,
                 lqr_iter=10,
                 grad_method=GradMethods.ANALYTIC,
                 delta_u=None,
                 verbose=0,
                 eps=1e-7,
                 back_eps=1e-7,
                 n_batch=None,
                 linesearch_decay=0.2,
                 max_linesearch_iter=10,
                 exit_unconverged=True,
                 detach_unconverged=True,
                 backprop=True,
                 slew_rate_penalty=None,
                 prev_ctrl=None,
                 not_improved_lim=5,
                 best_cost_eps=1e-4,
                 pnqp_iter=20,
                 parallel_linesearch=True):
        assert (u_lower is None) == (u_upper is None)
        assert max_linesearch_iter > 0

        self.u_lower = u_lower
        self.u_upper = u_upper
        self.u_zero_I = u_zero_I
        self.u_init = u_init
        self.n_batch = n_batch
        self.prev_ctrl = prev_ctrl
        self.exit_unconverged = exit_unconverged

        self.cfg = MPCConfig(
            n_state=n_state, n_ctrl=n_ctrl, T=T,
            lqr_iter=lqr_iter,
            grad_method=grad_method,
            delta_u=float(delta_u) if delta_u is not None else None,
            verbose=verbose,
            eps=eps, back_eps=back_eps,
            linesearch_decay=linesearch_decay,
            max_linesearch_iter=max_linesearch_iter,
            exit_unconverged=exit_unconverged,
            detach_unconverged=detach_unconverged,
            backprop=backprop,
            slew_rate_penalty=(float(slew_rate_penalty)
                               if slew_rate_penalty is not None else None),
            not_improved_lim=not_improved_lim,
            best_cost_eps=best_cost_eps,
            pnqp_iter=pnqp_iter,
            parallel_linesearch=parallel_linesearch)
        self._cache = {}

    # -- properties mirroring the reference attribute surface -------------
    @property
    def n_state(self):
        return self.cfg.n_state

    @property
    def n_ctrl(self):
        return self.cfg.n_ctrl

    @property
    def T(self):
        return self.cfg.T

    # ----------------------------------------------------------------------
    def __call__(self, x_init, cost, dx):
        sol = self.solve(x_init, cost, dx)
        if self.cfg.detach_unconverged and self.exit_unconverged:
            # the reference asserts when any example fails to reach a
            # fixed point (mpc/mpc.py:321-324); this is a host-side check.
            if not bool(jnp.all(sol.converged)):
                raise AssertionError(
                    'LQR: some examples did not converge to a fixed point '
                    '(max ||full_du|| = '
                    f'{float(jnp.max(sol.full_du_norm)):.2e} > eps = '
                    f'{self.cfg.eps:.2e}). Pass exit_unconverged=False to '
                    'continue with detached unconverged examples.')
        return sol.x, sol.u, sol.costs

    def solve(self, x_init, cost, dx) -> Solution:
        """Full solve returning the complete per-example Solution."""
        cfg = self.cfg
        T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
        n_tau = ns + nc
        x_init = jnp.asarray(x_init)
        dtype = x_init.dtype
        assert x_init.ndim == 2, 'x_init must be [n_batch, n_state]'

        # -- batch-size inference (reference mpc/mpc.py:193-199) ----------
        if self.n_batch is not None:
            n_batch = self.n_batch
        elif isinstance(cost, QuadCost) and jnp.asarray(cost.C).ndim == 4:
            n_batch = cost.C.shape[1]
        else:
            n_batch = x_init.shape[0]
        assert x_init.shape[0] == n_batch

        # -- cost normalization --------------------------------------------
        if isinstance(cost, QuadCost):
            C = jnp.asarray(cost.C, dtype)
            c = jnp.asarray(cost.c, dtype)
            C, c = _bcast_cost(C, c, T, n_batch, n_tau)
            cost_b = QuadCost(C, c)
        else:
            cost_b = cost

        # -- dynamics normalization ------------------------------------------
        if isinstance(dx, LinDx):
            F = jnp.asarray(dx.F, dtype)
            f = jnp.asarray(dx.f, dtype) if dx.f is not None else None
            # the reference tolerates [T, ...] time dims and never touches
            # the last slice (tests/test_mpc.py:102-106 pass T slices)
            if F.shape[0] == T:
                F = F[:T - 1]
            if f is not None and f.shape[0] == T:
                f = f[:T - 1]
            if F.ndim == 3:
                F = jnp.broadcast_to(F[:, None], (T - 1, n_batch, ns, n_tau))
            if f is not None and f.ndim == 2:
                f = jnp.broadcast_to(f[:, None], (T - 1, n_batch, ns))
            dx_b = LinDx(F, f)
        else:
            dx_b = dx

        # -- warm start (reference mpc/mpc.py:230-236) ---------------------
        u_init = self.u_init
        if u_init is not None:
            u_init = jnp.asarray(u_init, dtype)
            if u_init.ndim == 2:
                u_init = jnp.broadcast_to(u_init[:, None], (T, n_batch, nc))

        lb = _bcast_bound(self.u_lower, T, n_batch, nc, dtype)
        ub = _bcast_bound(self.u_upper, T, n_batch, nc, dtype)

        uz = self.u_zero_I
        if uz is not None:
            uz = jnp.broadcast_to(jnp.asarray(uz, bool), (T, n_batch, nc))

        pc = self.prev_ctrl
        if pc is not None:
            pc = jnp.asarray(pc, dtype)
            if pc.ndim == 3:     # [1, n_batch, n_ctrl]
                pc = pc[0]
            if pc.ndim == 1:     # [n_ctrl]
                pc = jnp.broadcast_to(pc, (n_batch, nc))

        if cfg.grad_method == GradMethods.ANALYTIC_CHECK and \
                not isinstance(dx_b, LinDx):
            self._analytic_check(x_init, dx_b, u_init, dtype)
            cfg = self._cfg_with(grad_method=GradMethods.ANALYTIC)

        # fused single-kernel Pallas path (ops/fused.py) for in-scope
        # problems on TPU; same dispatch rule as learning.batched_solve.
        # Cached jitted like the vmapped path, so the receding-horizon
        # pattern of re-creating the controller each step reuses the
        # compiled kernel.
        if cfg.use_fused != 'never':
            from .ops import fused
            # hand the kernel the PRE-broadcast cost/bounds so the
            # batch-shared case rides SMEM instead of being materialized
            # to [T, B, ...] and relaid out every call
            if isinstance(cost, QuadCost):
                cost_f = QuadCost(jnp.asarray(cost.C, dtype),
                                  jnp.asarray(cost.c, dtype))
            else:
                cost_f = cost_b
            if isinstance(dx, LinDx):
                # pre-broadcast dynamics (with the same trailing-slice
                # trim as the normalization above) keep batch-shared F/f
                # on the kernel's SMEM path
                F_f = jnp.asarray(dx.F, dtype)
                f_f = (jnp.asarray(dx.f, dtype)
                       if dx.f is not None else None)
                if F_f.shape[0] == T:
                    F_f = F_f[:T - 1]
                if f_f is not None and f_f.shape[0] == T:
                    f_f = f_f[:T - 1]
                dx_f = LinDx(F_f, f_f)
            else:
                dx_f = dx_b
            scalar_bounds = (self.u_lower is not None
                             and jnp.ndim(self.u_lower) == 0
                             and jnp.ndim(self.u_upper) == 0)
            lb_f = jnp.asarray(self.u_lower, dtype) if scalar_bounds else lb
            ub_f = jnp.asarray(self.u_upper, dtype) if scalar_bounds else ub
            in_scope = fused.supports(cfg, cost_f, dx_f, u_zero_I=uz,
                                      prev_ctrl=pc, u_lower=lb_f,
                                      dtype=dtype)
            if cfg.use_fused == 'always' and not in_scope:
                raise ValueError(
                    'use_fused="always" but the problem is outside the '
                    'fused-kernel scope (see ops/fused.py:supports)')
            if in_scope and (cfg.use_fused == 'always'
                             or jax.default_backend() == 'tpu'):
                key = ('fused', cfg, type(dx_f), u_init is not None,
                       lb is not None, jnp.ndim(cost_f.C), scalar_bounds,
                       jnp.ndim(dx_f.F) if isinstance(dx_f, LinDx) else None)
                if key not in _SOLVER_CACHE:
                    fn = jax.jit(
                        lambda x0, C, c, dyn, u0, lbi, ubi:
                        fused.fused_batched_solve(
                            cfg, x0, QuadCost(C, c), dyn, u_init=u0,
                            u_lower=lbi, u_upper=ubi))
                    _SOLVER_CACHE[key] = (fn, None, None)
                return _SOLVER_CACHE[key][0](
                    x_init, cost_f.C, cost_f.c, dx_f, u_init, lb_f, ub_f)

        fn = self._get_solver(cfg, cost_b, dx_b, u_init is not None,
                              lb is not None, uz is not None,
                              pc is not None)
        return fn(x_init, cost_b, dx_b, u_init, lb, ub, uz, pc)

    # ----------------------------------------------------------------------
    def _cfg_with(self, **kw):
        import dataclasses
        return dataclasses.replace(self.cfg, **kw)

    def _get_solver(self, cfg, cost, dx, has_u_init, has_bounds, has_uz,
                    has_pc):
        cost_key = None if isinstance(cost, QuadCost) else id(cost)
        dx_key = None if isinstance(dx, LinDx) else id(dx)
        has_f = isinstance(dx, LinDx) and dx.f is not None
        key = (cfg, cost_key, dx_key, has_f, has_u_init, has_bounds,
               has_uz, has_pc)
        if key in _SOLVER_CACHE:
            return _SOLVER_CACHE[key][0]

        cost_call = None if isinstance(cost, QuadCost) else cost
        dx_call = None if isinstance(dx, LinDx) else dx

        def one(x_init, C, c, F, f, u_init, lbi, ubi, uzi, pci):
            cost_i = QuadCost(C, c) if cost_call is None else cost_call
            dx_i = LinDx(F, f) if dx_call is None else dx_call
            return solver.solve_single(
                cfg, x_init, cost_i, dx_i,
                u_init=u_init, u_lower=lbi, u_upper=ubi,
                u_zero_I=uzi, prev_ctrl=pci)

        # vmap over the batch axis: x_init/prev_ctrl are batch-major,
        # everything else is time-major with batch at axis 1
        in_axes = (
            0,
            1 if cost_call is None else None,
            1 if cost_call is None else None,
            1 if dx_call is None else None,
            (1 if has_f else None) if dx_call is None else None,
            1 if has_u_init else None,
            1 if has_bounds else None,
            1 if has_bounds else None,
            1 if has_uz else None,
            0 if has_pc else None,
        )
        batched = jax.vmap(one, in_axes=in_axes, out_axes=Solution(
            x=1, u=1, costs=0, full_du_norm=0, n_iter=0, n_qp_iter=0,
            converged=0, mean_alpha=0))

        def run(x_init, cost_b, dx_b, u_init, lb, ub, uz, pc):
            C = cost_b.C if cost_call is None else None
            c = cost_b.c if cost_call is None else None
            F = dx_b.F if dx_call is None else None
            f = (dx_b.f if has_f else None) if dx_call is None else None
            return batched(x_init, C, c, F, f, u_init, lb, ub, uz, pc)

        fn = jax.jit(run)
        # keep refs to the callables so their ids (part of the key) stay
        # valid for the cache lifetime
        _SOLVER_CACHE[key] = (fn, cost_call, dx_call)
        return fn

    def _analytic_check(self, x_init, dynamics, u_init, dtype):
        """Eager cross-check of a model's analytic ``grad_input`` against
        autodiff (re-design of the reference's dead ANALYTIC_CHECK branch,
        mpc/mpc.py:552-567, which always asserts False)."""
        cfg = self.cfg
        if getattr(dynamics, 'grad_input', None) is None:
            raise ValueError('ANALYTIC_CHECK requires dynamics.grad_input')
        key_u = u_init
        if key_u is None:
            key_u = jnp.zeros((cfg.T, x_init.shape[0], cfg.n_ctrl), dtype)
        xt = x_init
        ut = key_u[0]
        R_an, S_an = jax.vmap(dynamics.grad_input)(xt, ut)
        R_ad, S_ad = jax.vmap(jax.jacrev(dynamics, argnums=(0, 1)))(xt, ut)
        err = max(float(jnp.max(jnp.abs(R_an - R_ad))),
                  float(jnp.max(jnp.abs(S_an - S_ad))))
        if err > 1e-8:
            raise AssertionError(
                f'ANALYTIC_CHECK: analytic dynamics Jacobian is off by '
                f'{err:.2e} from autodiff.')

    # -- reference-parity helpers ------------------------------------------
    def linearize_dynamics(self, x, u, dynamics, diff=None):
        """Batched linearization, [T, B, ...] layout
        (reference mpc/mpc.py:490-601).  ``diff`` is ignored: JAX decides
        differentiability by how the output is used."""
        lin = jax.vmap(
            lambda xs, us: solver.linearize_dynamics(
                dynamics, xs, us, self.cfg.grad_method),
            in_axes=1, out_axes=1)
        return lin(x, u)

    def approximate_cost(self, x, u, Cf, diff=None):
        """Batched cost quadratization, [T, B, ...] layout
        (reference mpc/mpc.py:447-487)."""
        if self.cfg.slew_rate_penalty is not None:
            raise NotImplementedError(
                'Using a non-convex cost with a slew rate penalty is not '
                'implemented (reference mpc/mpc.py:451-457).')
        quad = jax.vmap(
            lambda xs, us: solver.quadratize_cost(Cf, xs, us),
            in_axes=1, out_axes=1)
        return quad(x, u)
