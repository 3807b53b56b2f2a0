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
from .utils.logging import table_log


# Compiled solvers are cached at module level, keyed by (config,
# structural flags, callable identities), so fresh MPC instances with the
# same configuration - the common receding-horizon pattern of re-creating
# the controller every env step (reference examples/gym_pendulum.py:92-95)
# - reuse the compiled program instead of re-tracing.  LRU-bounded like
# parallel.mesh._SHARDED_CACHE: a long-lived process sweeping configs or
# fresh lambda costs (whose ids key entries) must not pin compiled
# programs forever.
from collections import OrderedDict

_SOLVER_CACHE = OrderedDict()
_SOLVER_CACHE_MAX = 128


def _is_data_pytree(obj):
    """True when ``obj`` flattens to data leaves (QuadCost / LinDx /
    registered-pytree models) and can be a jit operand; plain callables
    are their own leaf and must be closed over instead."""
    return not any(l is obj for l in jax.tree_util.tree_leaves(obj))


def _batched_cost(cost, dynamics, x_init, u):
    """Mean-free batched trajectory cost of rolling ``u`` from ``x_init``
    (the reference's initial-cost diagnostic, mpc/mpc.py:238-243).
    ``u`` is [T, B, n_ctrl]; returns [B] total costs."""
    def one(x0, C, c, F, f, ut):
        cost_i = QuadCost(C, c) if C is not None else cost
        dx_i = LinDx(F, f) if F is not None else dynamics
        xs = solver.rollout(dx_i, x0, ut)
        return solver.trajectory_cost(cost_i, xs, ut)

    is_qc = isinstance(cost, QuadCost)
    is_lin = isinstance(dynamics, LinDx)
    C = cost.C if is_qc else None
    c = cost.c if is_qc else None
    F = dynamics.F if is_lin else None
    f = dynamics.f if is_lin else None
    axes = (0,
            (1 if jnp.ndim(C) == 4 else None) if C is not None else None,
            (1 if jnp.ndim(c) == 3 else None) if c is not None else None,
            (1 if jnp.ndim(F) == 4 else None) if F is not None else None,
            (1 if jnp.ndim(f) == 3 else None) if f is not None else None,
            1)
    return jax.vmap(one, in_axes=axes)(x_init, C, c, F, f, u)


def _bcast_bound(v, T, n_batch, n_ctrl, dtype):
    """Bounds may be floats or [T, n_batch, n_ctrl] arrays
    (reference mpc/mpc.py:81-83)."""
    if v is None:
        return None
    v = jnp.asarray(v, dtype)
    return jnp.broadcast_to(v, (T, n_batch, n_ctrl))


@jax.tree_util.register_pytree_node_class
class SlewRateCost:
    """Cost wrapper on the slew-augmented tau ``(u_{t-1}, x_t, u_t)``:
    the true cost of the un-augmented part plus the (time-invariant)
    quadratic slew penalty (reference mpc/mpc.py:36-55).

    ``cost`` maps the true tau ``(x_t, u_t)`` to a scalar; ``slew_C`` is
    the [n_aug, n_aug] penalty block (see solver._augment_slew).
    Operates on a single instance (no batch axis); compose with vmap.
    """

    def __init__(self, cost, slew_C, n_state, n_ctrl):
        self.cost = cost
        self.slew_C = slew_C
        self.n_state = n_state
        self.n_ctrl = n_ctrl

    def __call__(self, tau):
        true_tau = tau[self.n_ctrl:]
        return self.cost(true_tau) + 0.5 * (tau @ self.slew_C @ tau)

    def tree_flatten(self):
        return (self.slew_C,), (self.cost, self.n_state, self.n_ctrl)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        cost, n_state, n_ctrl = aux
        return cls(cost, leaves[0], n_state, n_ctrl)


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
                 parallel_linesearch=True,
                 use_fused='auto',
                 matmul_precision='float32',
                 parallel_riccati='auto',
                 scan_unroll=4):
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
            parallel_linesearch=parallel_linesearch,
            use_fused=use_fused,
            matmul_precision=matmul_precision,
            parallel_riccati=parallel_riccati,
            scan_unroll=scan_unroll)
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
        if self.cfg.detach_unconverged and \
                (self.exit_unconverged or self.cfg.verbose >= 0):
            # host-side convergence check (forces a device sync - the
            # reference is eager and always pays it, mpc/mpc.py:321-328);
            # ``solve()`` never syncs, so fast paths should use it.
            if not bool(jnp.all(sol.converged)):
                if self.exit_unconverged:
                    # the reference asserts here (mpc/mpc.py:323-324)
                    raise AssertionError(
                        'LQR: some examples did not converge to a fixed '
                        'point (max ||full_du|| = '
                        f'{float(jnp.max(sol.full_du_norm)):.2e} > eps = '
                        f'{self.cfg.eps:.2e}). Pass exit_unconverged='
                        'False to continue with detached unconverged '
                        'examples.')
                # reference mpc/mpc.py:326-328
                print('LQR Warning: All examples did not converge to a '
                      'fixed point.')
                print('Detaching and *not* backpropping through the bad '
                      'examples.')
        return sol.x, sol.u, sol.costs

    def solve(self, x_init, cost, dx) -> Solution:
        """Full solve returning the complete per-example Solution.

        Normalizes shapes (reference mpc/mpc.py:193-236), then delegates
        to ``learning.batched_solve`` - the single batched dispatch path
        shared with the functional API, so the MPC class and
        ``batched_solve`` always pick the same (fused-kernel or jnp)
        execution path, including the kernel-phase-1 + custom-vjp-phase-2
        composition for differentiable solves.  The jitted program is
        cached on the problem structure, so the receding-horizon pattern
        of re-creating the controller every env step reuses the compiled
        solver (reference examples/gym_pendulum.py:92-95).

        Batch-shared cost / dynamics / bounds are kept un-broadcast so
        they ride the fused kernel's SMEM fast path.
        """
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

        # -- cost normalization (batch-shared layouts preserved) -----------
        # C and c broadcast INDEPENDENTLY, like the reference's
        # per-param expansions (mpc/mpc.py:205-226): mixed pairs (e.g.
        # shared weights C + per-example goal vectors c) are valid
        if isinstance(cost, QuadCost):
            C = jnp.asarray(cost.C, dtype)
            c = jnp.asarray(cost.c, dtype)
            if C.ndim not in (2, 3, 4) or c.ndim not in (1, 2, 3):
                raise ValueError('MPC Error: Unexpected QuadCost shape.')
            cost_b = QuadCost(C, c)
        else:
            cost_b = cost

        # -- dynamics normalization ----------------------------------------
        if isinstance(dx, LinDx):
            F = jnp.asarray(dx.F, dtype)
            f = jnp.asarray(dx.f, dtype) if dx.f is not None else None
            # the reference tolerates [T, ...] time dims and never touches
            # the last slice (tests/test_mpc.py:102-106 pass T slices)
            if F.shape[0] == T:
                F = F[:T - 1]
            if f is not None and f.shape[0] == T:
                f = f[:T - 1]
            dx_b = LinDx(F, f)
        else:
            dx_b = dx

        # -- warm start (reference mpc/mpc.py:230-236) ---------------------
        u_init = self.u_init
        if u_init is not None:
            u_init = jnp.asarray(u_init, dtype)

        # scalar bounds stay 0-d (SMEM / static on the fused path);
        # array bounds broadcast to the full [T, n_batch, n_ctrl]
        if self.u_lower is None:
            lb = ub = None
        elif jnp.ndim(self.u_lower) == 0 and jnp.ndim(self.u_upper) == 0:
            lb = jnp.asarray(self.u_lower, dtype)
            ub = jnp.asarray(self.u_upper, dtype)
        else:
            lb = _bcast_bound(self.u_lower, T, n_batch, nc, dtype)
            ub = _bcast_bound(self.u_upper, T, n_batch, nc, dtype)

        uz = self.u_zero_I
        if uz is not None:
            uz = jnp.asarray(uz, bool)
            if uz.ndim >= 3:
                uz = jnp.broadcast_to(uz, (T, n_batch, nc))
            else:
                uz = jnp.broadcast_to(uz, (T, nc))

        pc = self.prev_ctrl
        if pc is not None:
            pc = jnp.asarray(pc, dtype)
            if pc.ndim == 3:     # [1, n_batch, n_ctrl]
                pc = pc[0]

        if cfg.grad_method == GradMethods.ANALYTIC_CHECK and \
                not isinstance(dx_b, LinDx):
            self._analytic_check(x_init, dx_b, u_init, dtype)
            cfg = self._cfg_with(grad_method=GradMethods.ANALYTIC)

        if cfg.verbose > 0:
            # reference mpc/mpc.py:238-243
            u0 = u_init
            if u0 is None:
                u0 = jnp.zeros((T, n_batch, nc), dtype)
            elif u0.ndim == 2:
                u0 = jnp.broadcast_to(u0[:, None], (T, n_batch, nc))
            print('Initial mean(cost): {:.4e}'.format(
                float(jnp.mean(_batched_cost(cost_b, dx_b, x_init, u0)))))

        # data pytrees (QuadCost/LinDx/registered models) are jit
        # operands - so e.g. updated model params are never silently
        # frozen into a cached program; plain callables are closed over
        # and keyed by identity.
        cost_op = cost_b if _is_data_pytree(cost_b) else None
        dx_op = dx_b if _is_data_pytree(dx_b) else None
        fn = self._get_solver(cfg, cost_b, dx_b, u_init, lb, uz, pc)
        sol = fn(x_init, cost_op, dx_op, u_init, lb, ub, uz, pc)

        if cfg.verbose > 0 and sol.iter_stats is not None:
            # one table_log row per outer iteration, the reference's
            # columns exactly (mpc/mpc.py:287-297), aggregated over the
            # batch from the recorded per-iteration history.  Lanes that
            # stopped early (per-example stopping) are NaN-padded and
            # drop out of the aggregates.
            stats = np.asarray(sol.iter_stats)      # [B, lqr_iter, 4]
            for i in range(stats.shape[1]):
                ran = ~np.isnan(stats[:, i, 0])
                if not ran.any():
                    break
                table_log('lqr', (
                    ('iter', i),
                    ('mean(cost)', float(np.nanmean(stats[:, i, 0])),
                     '{:.4e}'),
                    ('||full_du||_max', float(np.nanmax(stats[:, i, 1])),
                     '{:.2e}'),
                    ('mean(alphas)', float(np.nanmean(stats[:, i, 2])),
                     '{:.2e}'),
                    ('total_qp_iters', int(np.nansum(stats[:, i, 3]))),
                ))
        return sol

    # ----------------------------------------------------------------------
    def _cfg_with(self, **kw):
        import dataclasses
        return dataclasses.replace(self.cfg, **kw)

    def _get_solver(self, cfg, cost, dx, u_init, lb, uz, pc):
        """Cached jitted wrapper around ``learning.batched_solve``."""
        from .learning import batched_solve

        cost_call = None if _is_data_pytree(cost) else cost
        dx_call = None if _is_data_pytree(dx) else dx
        cost_key = (jax.tree_util.tree_structure(cost)
                    if cost_call is None else id(cost))
        dx_key = (jax.tree_util.tree_structure(dx)
                  if dx_call is None else id(dx))
        key = (cfg, cost_key, dx_key,
               jnp.ndim(u_init) if u_init is not None else None,
               jnp.ndim(lb) if lb is not None else None,
               jnp.ndim(uz) if uz is not None else None,
               jnp.ndim(pc) if pc is not None else None)
        if key in _SOLVER_CACHE:
            _SOLVER_CACHE.move_to_end(key)
            return _SOLVER_CACHE[key][0]

        def run(x_init, cost_op, dx_op, u_init, lb, ub, uz, pc):
            cost_i = cost_op if cost_call is None else cost_call
            dx_i = dx_op if dx_call is None else dx_call
            return batched_solve(
                cfg, x_init, cost_i, dx_i, u_init=u_init,
                u_lower=lb, u_upper=ub, u_zero_I=uz, prev_ctrl=pc)

        fn = jax.jit(run)
        # keep refs to the callables so their ids (part of the key) stay
        # valid for the cache lifetime
        _SOLVER_CACHE[key] = (fn, cost_call, dx_call)
        while len(_SOLVER_CACHE) > _SOLVER_CACHE_MAX:
            _SOLVER_CACHE.popitem(last=False)
        return fn

    def _analytic_check(self, x_init, dynamics, u_init, dtype):
        """Eager cross-check of a model's analytic ``grad_input`` against
        autodiff ALONG THE WARM-START TRAJECTORY (re-design of the
        reference's dead ANALYTIC_CHECK branch, mpc/mpc.py:552-567,
        whose intent was a per-timestep check inside the linearization
        loop but which always asserts False).  Rolls the dynamics from
        ``x_init`` under ``u_init`` (or zeros) and compares at every
        (x_t, u_t) the solver would linearize at, so a hand-rolled
        Jacobian that is wrong only away from the initial state is
        still caught; reports the worst timestep."""
        cfg = self.cfg
        if getattr(dynamics, 'grad_input', None) is None:
            raise ValueError('ANALYTIC_CHECK requires dynamics.grad_input')
        B = x_init.shape[0]
        key_u = u_init
        if key_u is None:
            key_u = jnp.zeros((cfg.T, B, cfg.n_ctrl), dtype)
        elif key_u.ndim == 2:                        # batch-shared [T, nc]
            key_u = jnp.broadcast_to(key_u[:, None],
                                     (cfg.T, B, cfg.n_ctrl))
        # the states the linearization loop visits (reference
        # mpc/mpc.py:527-595 re-rolls from x[0] while linearizing)
        xs = jax.vmap(lambda x0, u: solver.rollout(dynamics, x0, u),
                      in_axes=(0, 1), out_axes=1)(x_init, key_u)
        xf = xs[:-1].reshape(-1, cfg.n_state)       # [(T-1)*B, ns]
        uf = key_u[:-1].reshape(-1, cfg.n_ctrl)
        R_an, S_an = jax.vmap(dynamics.grad_input)(xf, uf)
        R_ad, S_ad = jax.vmap(jax.jacrev(dynamics, argnums=(0, 1)))(xf, uf)
        per_pt = jnp.maximum(
            jnp.max(jnp.abs(R_an - R_ad), axis=(1, 2)),
            jnp.max(jnp.abs(S_an - S_ad), axis=(1, 2))).reshape(
            cfg.T - 1, B)
        per_t = jnp.max(per_pt, axis=1)
        err = float(jnp.max(per_t))
        if err > 1e-8:
            t_bad = int(jnp.argmax(per_t))
            raise AssertionError(
                f'ANALYTIC_CHECK: analytic dynamics Jacobian is off by '
                f'{err:.2e} from autodiff (worst at trajectory step '
                f'{t_bad} of {cfg.T - 1}).')

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
