"""The per-instance differentiable iLQR solver (functional core).

This is the TPU-native re-design of ``MPC.forward``
(reference mpc/mpc.py:184-337): the outer iLQR loop is a
``lax.while_loop`` carrying per-example best-solution tracking, all run
with gradients stopped; differentiability is restored by a final
``custom_vjp`` fixed-point layer, exactly mirroring the reference's
"solve detached, then attach the graph with a no-op LQRStep" structure
(mpc/mpc.py:248-319).

Everything operates on a *single* problem instance; ``jax.vmap``
introduces the scenario batch (the reference's ``n_batch`` axis), which
also upgrades every data-dependent while-loop into a masked batched loop
with per-example convergence - the reference's per-example best-tracking
and line-search masks fall out automatically.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops import lqr
from .ops.diff import make_lqr_fixed_point
from .types import GradMethods, LinDx, MPCConfig, QuadCost, Solution


# ---------------------------------------------------------------------------
# Trajectory helpers
# ---------------------------------------------------------------------------

def rollout(dynamics, x_init, u):
    """Roll the dynamics along a control sequence
    (reference mpc/util.py:102-126).  Returns x of shape [T, n_state]."""
    T = u.shape[0]
    if isinstance(dynamics, LinDx):
        Fp = lqr._pad_time(dynamics.F, T)
        fp = lqr._pad_time(dynamics.f, T) if dynamics.f is not None else None

        def step(xt, inp):
            t, ut = inp
            xut = jnp.concatenate([xt, ut])
            xtp1 = Fp[t] @ xut
            if fp is not None:
                xtp1 = xtp1 + fp[t]
            return xtp1, xt

        _, xs = lax.scan(step, x_init, (jnp.arange(T), u))
        return xs

    def step(xt, ut):
        return dynamics(xt, ut), xt

    _, xs = lax.scan(step, x_init, u)
    return xs


def trajectory_cost(cost, x, u):
    """Total objective of a trajectory (reference mpc/util.py:129-153)."""
    tc = (cost.C, cost.c) if isinstance(cost, QuadCost) else cost
    return lqr.total_cost(x, u, tc)


# ---------------------------------------------------------------------------
# Linearization / quadratization
# ---------------------------------------------------------------------------

def linearize_dynamics(dynamics, x, u, grad_method: GradMethods):
    """First-order dynamics model along a trajectory
    (reference mpc/mpc.py:490-601).

    All three reference methods collapse to one vmapped code path on TPU:
      * ANALYTIC uses the model's ``grad_input(x, u) -> (R, S)`` when
        provided (reference mpc/mpc.py:495-524);
      * AUTO_DIFF / ANALYTIC without grad_input uses ``jax.jacrev``
        (exact, replacing the per-state-dim autograd loop at
        mpc/mpc.py:530-549);
      * FINITE_DIFF uses central differences with eps=1e-4
        (reference mpc/mpc.py:568-582, mpc/util.py:8-18).

    Returns F [T-1, n_state, n_tau], f [T-1, n_state] with the residual
    f_t = f(x_t, u_t) - R_t x_t - S_t u_t (reference mpc/mpc.py:515).
    """
    if isinstance(dynamics, LinDx):
        return dynamics.F, dynamics.f

    xs, us = x[:-1], u[:-1]
    new_x = jax.vmap(dynamics)(xs, us)

    grad_input = getattr(dynamics, 'grad_input', None)
    if grad_method == GradMethods.ANALYTIC and grad_input is not None:
        R, S = jax.vmap(grad_input)(xs, us)
    elif grad_method == GradMethods.FINITE_DIFF:
        eps = 1e-4

        def fd_jac(fn, z):
            n = z.shape[0]
            eye = jnp.eye(n, dtype=z.dtype)
            cols = jax.vmap(
                lambda e: (fn(z + eps * e) - fn(z - eps * e)) / (2 * eps))(eye)
            return cols.T  # [n_out, n_in]

        def per_t(xt, ut):
            R = fd_jac(lambda s: dynamics(s, ut), xt)
            S = fd_jac(lambda a: dynamics(xt, a), ut)
            return R, S

        R, S = jax.vmap(per_t)(xs, us)
    else:
        R, S = jax.vmap(jax.jacrev(dynamics, argnums=(0, 1)))(xs, us)

    f = new_x - jnp.einsum('tij,tj->ti', R, xs) - jnp.einsum(
        'tij,tj->ti', S, us)
    F = jnp.concatenate([R, S], axis=2)
    return F, f


def quadratize_cost(cost, x, u):
    """Second-order cost model along a trajectory
    (reference ``approximate_cost``, mpc/mpc.py:447-487).

    Returns (C [T, n_tau, n_tau], c [T, n_tau], costs [T]) with the
    Taylor-shifted linear term c_t = grad_t - H_t @ tau_t
    (reference mpc/mpc.py:480).
    """
    if isinstance(cost, QuadCost):
        C, cv = cost.C, cost.c
        T = x.shape[0]
        # batch-shared cost without a time axis broadcasts here
        if C.ndim == 2:
            C = jnp.broadcast_to(C, (T,) + C.shape)
        if cv.ndim == 1:
            cv = jnp.broadcast_to(cv, (T,) + cv.shape)
        return C, cv, None

    tau = jnp.concatenate([x, u], axis=1)

    def per_t(tau_t):
        g = jax.grad(cost)(tau_t)
        H = jax.hessian(cost)(tau_t)
        return H, g - H @ tau_t, cost(tau_t)

    C, c, costs = jax.vmap(per_t)(tau)
    return C, c, costs


# ---------------------------------------------------------------------------
# Slew-rate state augmentation
# ---------------------------------------------------------------------------

class _SlewProblem(NamedTuple):
    C: jax.Array
    c: jax.Array
    F: jax.Array
    f: Optional[jax.Array]
    x_init: jax.Array
    x: jax.Array           # augmented current states [T, n_ctrl + n_state]
    true_cost: Any
    true_dynamics: Any


def _augment_slew(cfg: MPCConfig, C, c, F, f, x_init, x, u,
                  cost, dynamics, prev_ctrl):
    """Augment the state with the previous control to express the slew
    penalty ||u_t - u_{t-1}||^2 (reference mpc/mpc.py:362-445).

    The augmented state is (u_{t-1}, x_t); the augmented dynamics pass
    the control through (reference CtrlPassthroughDynamics,
    mpc/dynamics.py:133-153).  All constructions are differentiable jnp
    ops of (C, c, F, f) so the fixed-point gradients chain back
    automatically.

    Documented deviation: with LinDx dynamics the reference sets the
    rollout dynamics to None and would crash (mpc/mpc.py:413-416); here
    the augmented LinDx is used, making LinDx + slew work.
    """
    T, nc, ns = cfg.T, cfg.n_ctrl, cfg.n_state
    nsc = ns + nc           # augmented state dim
    naug = nsc + nc         # augmented tau dim
    dtype = C.dtype

    gam = jnp.asarray(cfg.slew_rate_penalty, dtype)
    eyec = jnp.eye(nc, dtype=dtype)
    slew_blk = jnp.zeros((naug, naug), dtype)
    slew_blk = slew_blk.at[:nc, :nc].set(gam * eyec)
    slew_blk = slew_blk.at[-nc:, -nc:].set(gam * eyec)
    slew_blk = slew_blk.at[:nc, -nc:].set(-gam * eyec)
    slew_blk = slew_blk.at[-nc:, :nc].set(-gam * eyec)
    slew_C = jnp.broadcast_to(slew_blk, (T, naug, naug))

    _C = slew_C + jnp.pad(C, ((0, 0), (nc, 0), (nc, 0)))
    _c = jnp.pad(c, ((0, 0), (nc, 0)))

    # _F = [[0, I_ctrl], [0, F]] : the next augmented state is
    # (u_t, F @ (x_t, u_t)) (reference mpc/mpc.py:380-390)
    F0 = jnp.concatenate(
        [jnp.zeros((nc, ns + nc), dtype), eyec], axis=1)
    _F0 = jnp.broadcast_to(F0, (T - 1, nc, naug))
    _F1 = jnp.concatenate(
        [jnp.zeros((T - 1, ns, nc), dtype), F], axis=2)
    _F = jnp.concatenate([_F0, _F1], axis=1)
    _f = jnp.pad(f, ((0, 0), (nc, 0))) if f is not None else None

    if prev_ctrl is None:
        prev_u = jnp.zeros((nc,), dtype)
    else:
        prev_u = jnp.broadcast_to(prev_ctrl, (nc,)).astype(dtype)
    utm1s = jnp.concatenate([prev_u[None], u[:-1]], axis=0)
    _x = jnp.concatenate([utm1s, x], axis=1)
    _x_init = jnp.concatenate([prev_u, x_init])

    if isinstance(dynamics, LinDx):
        true_dynamics = (_F, _f)
    else:
        def true_dynamics(tilde_x, uu):
            # control-passthrough wrapper (reference mpc/dynamics.py:138-153)
            xtp1 = dynamics(tilde_x[nc:], uu)
            return jnp.concatenate([uu, xtp1])

    if isinstance(cost, QuadCost) or isinstance(cost, tuple):
        true_cost = (_C, _c)
    else:
        # the public SlewRateCost wrapper (reference mpc/mpc.py:36-52)
        from .mpc import SlewRateCost
        true_cost = SlewRateCost(cost, slew_C[0], ns, nc)

    return _SlewProblem(_C, _c, _F, _f, _x_init, _x, true_cost, true_dynamics)


# ---------------------------------------------------------------------------
# One LQR subproblem step (with optional slew augmentation)
# ---------------------------------------------------------------------------

def _subproblem_step(cfg: MPCConfig, x_init, C, c, F, f, x, u,
                     cost, dynamics, u_lower, u_upper, u_zero_I, prev_ctrl):
    """Equivalent of ``solve_lqr_subproblem`` in its non-no-op mode
    (reference mpc/mpc.py:339-445): one delta-space LQR step, with state
    augmentation when a slew-rate penalty is configured."""
    quad = isinstance(cost, QuadCost)
    lin = isinstance(dynamics, LinDx)

    if cfg.slew_rate_penalty is None:
        true_cost = (C, c) if quad else cost
        true_dynamics = (F, f) if lin else dynamics
        fwd, n_qp = lqr.lqr_step_delta(
            x_init, C, c, F, f, x, u,
            n_state=cfg.n_state,
            true_cost=true_cost, true_dynamics=true_dynamics,
            u_lower=u_lower, u_upper=u_upper, u_zero_I=u_zero_I,
            delta_u=cfg.delta_u,
            linesearch_decay=cfg.linesearch_decay,
            max_linesearch_iter=cfg.max_linesearch_iter,
            pnqp_iter=cfg.pnqp_iter,
            parallel_linesearch=cfg.parallel_linesearch,
            parallel_riccati=cfg.parallel_riccati,
            unroll=cfg.scan_unroll)
        return fwd, n_qp

    sp = _augment_slew(cfg, C, c, F, f, x_init, x, u, cost, dynamics,
                       prev_ctrl)
    fwd, n_qp = lqr.lqr_step_delta(
        sp.x_init, sp.C, sp.c, sp.F, sp.f, sp.x, u,
        n_state=cfg.n_state + cfg.n_ctrl,
        true_cost=sp.true_cost, true_dynamics=sp.true_dynamics,
        u_lower=u_lower, u_upper=u_upper, u_zero_I=u_zero_I,
        delta_u=cfg.delta_u,
        linesearch_decay=cfg.linesearch_decay,
        max_linesearch_iter=cfg.max_linesearch_iter,
        pnqp_iter=cfg.pnqp_iter,
        parallel_linesearch=cfg.parallel_linesearch,
        parallel_riccati=cfg.parallel_riccati,
        unroll=cfg.scan_unroll)
    # strip the (u_{t-1}) part of the augmented state (reference mpc/mpc.py:444)
    fwd = fwd._replace(new_x=fwd.new_x[:, cfg.n_ctrl:])
    return fwd, n_qp


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------

class _OuterState(NamedTuple):
    i: jax.Array
    x: jax.Array
    u: jax.Array
    best_x: jax.Array
    best_u: jax.Array
    best_cost: jax.Array
    best_du_norm: jax.Array
    cur_du_norm: jax.Array
    n_not_improved: jax.Array
    n_qp_total: jax.Array
    alpha: jax.Array
    # [lqr_iter, 4] per-iteration (best_cost, du_norm, alpha, n_qp),
    # NaN-padded; carried only at verbose > 0 (None otherwise)
    iter_stats: Any = None


def solve_single(cfg: MPCConfig, x_init, cost, dynamics,
                 u_init=None, u_lower=None, u_upper=None,
                 u_zero_I=None, prev_ctrl=None) -> Solution:
    """Solve one MPC instance; ``vmap`` over a batch for many.

    Runs under ``cfg.matmul_precision`` (default full float32): TPU
    matmuls otherwise default to bfloat16 inputs, which flips bang-bang
    switching times and breaks reference parity.
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _solve_single(cfg, x_init, cost, dynamics, u_init,
                             u_lower, u_upper, u_zero_I, prev_ctrl)


def _solve_single(cfg: MPCConfig, x_init, cost, dynamics,
                  u_init=None, u_lower=None, u_upper=None,
                  u_zero_I=None, prev_ctrl=None) -> Solution:
    """Solve one MPC instance (see solve_single).

    Args:
      cfg: static MPCConfig.
      x_init: [n_state] initial state.
      cost: QuadCost with per-instance arrays (C [T, n_tau, n_tau],
        c [T, n_tau]) or a callable tau -> scalar.
      dynamics: LinDx with per-instance arrays (F [T-1, n_state, n_tau],
        f [T-1, n_state] or None) or a callable (x, u) -> x_next,
        optionally carrying a ``grad_input`` attribute.
      u_init: optional [T, n_ctrl] warm start (reference mpc/mpc.py:230-236).
      u_lower/u_upper: None or [T, n_ctrl] bounds.
      u_zero_I: None or [T, n_ctrl] bool mask of controls pinned to zero.
      prev_ctrl: None or [n_ctrl] previous control (slew-rate warm start).

    Two-phase structure mirroring the reference (mpc/mpc.py:248-319):
    phase 1 iterates to the fixed point with all gradients stopped;
    phase 2 re-linearizes at the best trajectory differentiably and
    attaches the custom-VJP fixed-point layer.
    """
    T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
    dtype = x_init.dtype

    if not isinstance(cost, QuadCost) and cfg.slew_rate_penalty is not None:
        # the reference hard-exits here too (mpc/mpc.py:451-457)
        raise NotImplementedError(
            'Non-convex cost with a slew rate penalty is not implemented '
            '(same restriction as the reference, mpc/mpc.py:451-457).')

    if u_init is None:
        u_init = jnp.zeros((T, nc), dtype)
    u0 = u_init.astype(dtype)

    # ---- phase 1: iterate with gradients stopped -------------------------
    # (the reference detaches everything inside the outer loop,
    #  mpc/mpc.py:249-262; models registered as pytrees get their traced
    #  parameters stopped too, plain callables pass through unchanged)
    sg = lax.stop_gradient

    def sg_tree(t):
        return jax.tree_util.tree_map(
            lambda a: sg(a) if isinstance(a, (jax.Array, jnp.ndarray)) else a,
            t)

    x_init_s = sg(x_init)
    cost_s = sg_tree(cost)
    dyn_s = sg_tree(dynamics)
    lb_s = sg(u_lower) if u_lower is not None else None
    ub_s = sg(u_upper) if u_upper is not None else None
    uz_s = sg(u_zero_I) if u_zero_I is not None else None
    pc_s = sg(prev_ctrl) if prev_ctrl is not None else None
    u0_s = sg(u0)

    def body(s: _OuterState) -> _OuterState:
        F, f = linearize_dynamics(dyn_s, s.x, s.u, cfg.grad_method)
        C, c, _ = quadratize_cost(cost_s, s.x, s.u)
        fwd, n_qp = _subproblem_step(
            cfg, x_init_s, C, c, F, f, s.x, s.u, cost_s, dyn_s,
            lb_s, ub_s, uz_s, pc_s)

        first = s.i == 0
        improved = fwd.cost_total <= s.best_cost + cfg.best_cost_eps
        take = first | improved
        n_not_improved = jnp.where(
            improved & ~first, 0, s.n_not_improved + 1)

        def upd(new, old):
            return jnp.where(take, new, old)

        best_cost_new = jnp.where(take, fwd.cost_total, s.best_cost)
        iter_stats = s.iter_stats
        if cfg.verbose > 0:
            # per-iteration history row: the reference's table columns
            # per outer iteration (mpc/mpc.py:287-297); aggregated over
            # the batch and printed by MPC.solve after the solve
            row = jnp.stack([
                best_cost_new, fwd.full_du_norm, fwd.alpha,
                n_qp.astype(dtype)]).astype(dtype)
            iter_stats = lax.dynamic_update_slice(
                s.iter_stats, row[None],
                (s.i, jnp.zeros_like(s.i)))

        return _OuterState(
            i=s.i + 1,
            x=fwd.new_x,
            u=fwd.new_u,
            best_x=upd(fwd.new_x, s.best_x),
            best_u=upd(fwd.new_u, s.best_u),
            best_cost=best_cost_new,
            best_du_norm=jnp.where(take, fwd.full_du_norm, s.best_du_norm),
            cur_du_norm=fwd.full_du_norm,
            n_not_improved=n_not_improved,
            n_qp_total=s.n_qp_total + n_qp,
            alpha=fwd.alpha,
            iter_stats=iter_stats,
        )

    def cond(s: _OuterState):
        # the reference breaks after an iteration when
        # max(full_du_norm) < eps or n_not_improved > not_improved_lim
        # (mpc/mpc.py:299-301); per-instance here.
        keep = (s.cur_du_norm >= cfg.eps) & \
            (s.n_not_improved <= cfg.not_improved_lim)
        return (s.i < cfg.lqr_iter) & ((s.i == 0) | keep)

    x0_traj = rollout(dyn_s, x_init_s, u0_s)
    big = jnp.asarray(jnp.inf, dtype)
    init = _OuterState(
        i=jnp.asarray(0, jnp.int32),
        x=x0_traj, u=u0_s,
        best_x=x0_traj, best_u=u0_s,
        best_cost=big, best_du_norm=big, cur_du_norm=big,
        n_not_improved=jnp.asarray(0, jnp.int32),
        n_qp_total=jnp.asarray(0, jnp.int32),
        alpha=jnp.asarray(1.0, dtype),
        iter_stats=(jnp.full((cfg.lqr_iter, 4), jnp.nan, dtype)
                    if cfg.verbose > 0 else None),
    )
    out = lax.while_loop(cond, body, init)

    best_x = sg(out.best_x)
    best_u = sg(out.best_u)
    converged = out.best_du_norm < cfg.eps

    # ---- phase 2: differentiable fixed-point layer -----------------------
    if cfg.backprop:
        x, u = fixed_point_phase(cfg, x_init, cost, dynamics, best_x,
                                 best_u, u_lower, u_upper, converged,
                                 prev_ctrl)
    else:
        x, u = best_x, best_u

    return Solution(
        x=x, u=u, costs=out.best_cost,
        full_du_norm=out.best_du_norm,
        n_iter=out.i, n_qp_iter=out.n_qp_total,
        converged=converged, alpha=out.alpha,
        iter_stats=out.iter_stats)


def fixed_point_phase(cfg: MPCConfig, x_init, cost, dynamics,
                      best_x, best_u, u_lower, u_upper, converged,
                      prev_ctrl=None):
    """Attach the differentiable KKT fixed-point layer at a converged
    trajectory (reference mpc/mpc.py:304-334: re-linearize at the best
    trajectory with diff=True, then a no_op_forward LQRStep attaches the
    graph).  ``best_x``/``best_u`` should be stop-gradiented; gradients
    flow through cost/dynamics/x_init/bounds via the custom_vjp layer.

    Standalone so a batched phase-1 solver (e.g. the fused Pallas
    kernel) can be composed with a vmapped differentiable phase 2.
    """
    T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
    dtype = x_init.dtype
    sg = lax.stop_gradient

    F, f = linearize_dynamics(dynamics, best_x, best_u, cfg.grad_method)
    C, c, _ = quadratize_cost(cost, best_x, best_u)

    if cfg.slew_rate_penalty is None:
        has_f = f is not None
        fp = make_lqr_fixed_point(
            n_state=ns, has_bounds=u_lower is not None, has_f=has_f,
            parallel=cfg.parallel_riccati,
            precision=cfg.matmul_precision)
        f_arr = f if has_f else jnp.zeros((T - 1, ns), dtype)
        lb = u_lower if u_lower is not None else jnp.zeros((T, nc), dtype)
        ub = u_upper if u_upper is not None else jnp.zeros((T, nc), dtype)
        x, u = fp(x_init, C, c, F, f_arr, lb, ub, best_x, best_u)
    else:
        sp = _augment_slew(cfg, C, c, F, f, x_init, best_x, best_u,
                           cost, dynamics, prev_ctrl)
        has_f = sp.f is not None
        fp = make_lqr_fixed_point(
            n_state=ns + nc, has_bounds=u_lower is not None, has_f=has_f,
            parallel=cfg.parallel_riccati,
            precision=cfg.matmul_precision)
        f_arr = sp.f if has_f else jnp.zeros((T - 1, ns + nc), dtype)
        lb = u_lower if u_lower is not None else jnp.zeros((T, nc), dtype)
        ub = u_upper if u_upper is not None else jnp.zeros((T, nc), dtype)
        x_aug, u = fp(sp.x_init, sp.C, sp.c, sp.F, f_arr, lb, ub,
                      sg(sp.x), best_u)
        x = x_aug[:, nc:]

    if cfg.detach_unconverged:
        # detach unconverged examples from the graph
        # (reference mpc/mpc.py:321-334)
        x = jnp.where(converged, x, sg(x))
        u = jnp.where(converged, u, sg(u))
    return x, u
