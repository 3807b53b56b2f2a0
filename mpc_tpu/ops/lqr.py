"""Core LQR machinery: Riccati recursion, line-searched rollout, exact solve.

TPU-native re-design of the reference's ``LQRStep`` (mpc/lqr_step.py):

  * the time-reversed Riccati/DP recursion (mpc/lqr_step.py:52-160) is a
    ``lax.scan`` carrying the cost-to-go ``(V, v)`` and the PNQP warm
    start, emitting per-step feedback gains ``(K, k)``;
  * the forward rollout + per-example line search
    (mpc/lqr_step.py:164-261) is a ``lax.scan`` over the horizon inside a
    ``lax.while_loop`` over line-search attempts;
  * ``lqr_solve`` is the *exact* LQR solve (optionally with zero-clamped
    controls) used by the analytic backward pass, where the reference
    recursively instantiates a 1-iteration MPC (mpc/lqr_step.py:328-340);
    since the differential problem is linear-quadratic, one Riccati pass
    is exact, so no recursion or line search is needed here.

Everything is written per problem instance (no batch axis) and composed
with ``jax.vmap``; all control flow is static or masked, so the whole
solver stays inside one compiled XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import linalg
from .pnqp import pnqp


class RiccatiOut(NamedTuple):
    K: jax.Array          # [T, n_ctrl, n_state] feedback gains
    k: jax.Array          # [T, n_ctrl] feedforward terms
    n_qp_iter: jax.Array  # total PNQP iterations (0 when unconstrained)


class ForwardOut(NamedTuple):
    new_x: jax.Array         # [T, n_state]
    new_u: jax.Array         # [T, n_ctrl]
    objs: jax.Array          # [T] per-step true objective of accepted traj
    full_du_norm: jax.Array  # scalar: ||u - new_u(alpha=1)||_2 (undamped step)
    alpha: jax.Array         # scalar: accepted line-search step size
    cost_total: jax.Array    # scalar: sum(objs)


def _pad_time(A, T):
    """Pad a [T-1, ...] time-indexed array with one zero slice to [T, ...]."""
    if A is None:
        return None
    pad = jnp.zeros((1,) + A.shape[1:], A.dtype)
    return jnp.concatenate([A, pad], axis=0)


def riccati_backward(
    C, c, F, u,
    n_state: int,
    f=None,
    u_lower=None, u_upper=None,
    u_zero_I=None,
    delta_u=None,
    pnqp_iter: int = 20,
    unroll: int = 1,
):
    """Time-reversed Riccati recursion producing (K_t, k_t).

    Mirrors ``lqr_backward`` (mpc/lqr_step.py:52-160).  ``c`` must already
    be the delta-space linear term (``C_t @ xu_t + c_t``, see
    mpc/lqr_step.py:284-295); the recursion then produces gains for the
    *delta* controls, with box bounds re-centred at the current ``u``.

    Args (single instance, time-major):
      C: [T, n_tau, n_tau]; c: [T, n_tau]; F: [T-1, n_state, n_tau];
      u: [T, n_ctrl] current nominal controls.
      u_lower/u_upper: None or [T, n_ctrl].
      u_zero_I: None or [T, n_ctrl] bool mask of controls pinned to zero.
      delta_u: None or float trust-region half-width.
    """
    T, n_tau = c.shape
    n_ctrl = n_tau - n_state
    dtype = C.dtype
    constrained = u_lower is not None

    Fp = _pad_time(F, T)  # value at t=T-1 is unused (V_T = 0)

    def step(carry, inp):
        V, v, prev_kt, first, n_qp = carry
        Ct, ct, Ft, ut, lbt, ubt, uzt, ft = inp

        FtT = Ft.T
        Qt = Ct + FtT @ V @ Ft
        qt = ct + FtT @ v
        if has_f:
            # affine-dynamics term (reference mpc/lqr_step.py:71-74);
            # inside LQRStep this never fires (delta space folds f into
            # c_back, f_back is None at mpc/lqr_step.py:296) but the
            # exact solve with explicit f needs it
            qt = qt + FtT @ (V @ ft)

        Qxx = Qt[:n_state, :n_state]
        Qxu = Qt[:n_state, n_state:]
        Qux = Qt[n_state:, :n_state]
        Quu = Qt[n_state:, n_state:]
        qx = qt[:n_state]
        qu = qt[n_state:]

        if not constrained:
            if u_zero_I is None:
                if n_ctrl == 1:
                    # reference mpc/lqr_step.py:85-86
                    Kt = -Qux / Quu[0, 0]
                    kt = -qu / Quu[0, 0]
                else:
                    # reference uses per-example pinverse for robustness to
                    # semidefinite Q_uu (mpc/lqr_step.py:89-94)
                    Kt = -linalg.solve_psd_pinv(Quu, Qux)
                    kt = -linalg.solve_psd_pinv(Quu, qu)
            else:
                # zero-clamped controls (reference mpc/lqr_step.py:99-127);
                # the masked system block-decouples, so clamped rows of K/k
                # come out exactly zero.
                free = ~uzt
                qu_m = jnp.where(uzt, 0.0, qu)
                H_m = linalg.masked_free_matrix(Quu, free)
                Qux_m = linalg.mask_rows(Qux, free)
                Kt = -linalg.solve_spd(H_m, Qux_m)
                kt = -linalg.solve_spd(H_m, qu_m)
        else:
            # box-constrained: PNQP on the delta controls
            # (reference mpc/lqr_step.py:128-148)
            lb = lbt - ut
            ub = ubt - ut
            if delta_u is not None:
                lb = jnp.maximum(lb, -delta_u)
                ub = jnp.minimum(ub, delta_u)
            # warm start with the previous step's k_t
            # (reference mpc/lqr_step.py:135-137); at the first (t=T-1)
            # step fall back to PNQP's own clamped-Newton init.
            eye = jnp.eye(n_ctrl, dtype=dtype)
            newton0 = -linalg.solve_spd(Quu + 1e-11 * eye, qu)
            x0 = jnp.where(first, newton0, prev_kt)
            res = pnqp(Quu, qu, lb, ub, x_init=x0, n_iter=pnqp_iter)
            kt = res.x
            Qux_m = linalg.mask_rows(Qux, res.free)
            Kt = -linalg.solve_spd(res.H_free, Qux_m)
            n_qp = n_qp + res.n_iter

        KtT = Kt.T
        # cost-to-go update (reference mpc/lqr_step.py:155-158)
        V_new = Qxx + Qxu @ Kt + KtT @ Qux + KtT @ Quu @ Kt
        v_new = qx + Qxu @ kt + KtT @ qu + KtT @ Quu @ kt

        carry = (V_new, v_new, kt, jnp.asarray(False), n_qp)
        return carry, (Kt, kt)

    zl = jnp.zeros((T, n_ctrl), dtype) if u_lower is None else u_lower
    zu = jnp.zeros((T, n_ctrl), dtype) if u_upper is None else u_upper
    zz = (jnp.zeros((T, n_ctrl), bool) if u_zero_I is None else u_zero_I)
    has_f = f is not None
    fp_ = _pad_time(f, T) if has_f else jnp.zeros((T, n_state), dtype)

    init = (
        jnp.zeros((n_state, n_state), dtype),
        jnp.zeros((n_state,), dtype),
        jnp.zeros((n_ctrl,), dtype),
        jnp.asarray(True),
        jnp.asarray(0, jnp.int32),
    )
    xs = (C, c, Fp, u, zl, zu, zz, fp_)
    carry, (Ks, ks) = lax.scan(step, init, xs, reverse=True, unroll=unroll)
    return RiccatiOut(Ks, ks, carry[4])


def _rollout(
    alpha, x_init, x, u, K, k,
    true_cost, true_dynamics,
    u_lower=None, u_upper=None, u_zero_I=None, delta_u=None,
    unroll: int = 1,
):
    """One forward pass at step size ``alpha``.

    Mirrors the body of the reference line-search loop
    (mpc/lqr_step.py:180-241): new_u_t = K_t dx_t + u_t + alpha k_t,
    zero-masked / clamped to bounds, stepped through the *true* dynamics,
    accumulating the *true* objective.

    ``true_cost`` is either a (C, c) tuple of arrays or a callable
    tau -> scalar; ``true_dynamics`` is either an (F, f) tuple
    (f may be None) or a callable (x, u) -> x_next.
    """
    T = u.shape[0]
    n_state = x.shape[1]
    cost_is_quad = isinstance(true_cost, tuple)
    dyn_is_lin = isinstance(true_dynamics, tuple)

    if dyn_is_lin:
        Fd, fd = true_dynamics
        Fp = _pad_time(Fd, T)
        fp = _pad_time(fd, T) if fd is not None else None
    if cost_is_quad:
        Cq, cq = true_cost

    # x shifted by one for the dx recursion (value at t=T-1 unused)
    x_next = jnp.concatenate([x[1:], jnp.zeros((1, n_state), x.dtype)], 0)

    def step(carry, inp):
        new_xt, dxt = carry
        t, Kt, kt, ut, xnt = inp

        new_ut = Kt @ dxt + ut + alpha * kt
        if u_zero_I is not None:
            new_ut = jnp.where(u_zero_I[t], 0.0, new_ut)
        if u_lower is not None:
            lb = u_lower[t]
            ub = u_upper[t]
            if delta_u is not None:
                # trust region around the current control, intersected
                # with the box (reference mpc/lqr_step.py:204-211)
                lb = jnp.maximum(ut - delta_u, lb)
                ub = jnp.minimum(ut + delta_u, ub)
            new_ut = linalg.eclamp(new_ut, lb, ub)

        new_xut = jnp.concatenate([new_xt, new_ut])
        if dyn_is_lin:
            new_xtp1 = Fp[t] @ new_xut
            if fp is not None:
                new_xtp1 = new_xtp1 + fp[t]
        else:
            new_xtp1 = true_dynamics(new_xt, new_ut)

        if cost_is_quad:
            obj = 0.5 * linalg.bquad(new_xut, Cq[t]) + linalg.bdot(new_xut, cq[t])
        else:
            obj = true_cost(new_xut)

        carry = (new_xtp1, new_xtp1 - xnt)
        return carry, (new_xt, new_ut, obj)

    ts = jnp.arange(T)
    init = (x_init, jnp.zeros_like(x_init))
    _, (new_x, new_u, objs) = lax.scan(
        step, init, (ts, K, k, u, x_next), unroll=unroll)
    return new_x, new_u, objs


def total_cost(x, u, true_cost):
    """Total true objective along a trajectory (reference mpc/util.py:129-153)."""
    tau = jnp.concatenate([x, u], axis=1)
    if isinstance(true_cost, tuple):
        Cq, cq = true_cost
        if Cq.ndim == 2:          # time-invariant shared cost
            Cq = jnp.broadcast_to(Cq, (tau.shape[0],) + Cq.shape)
        if cq.ndim == 1:
            cq = jnp.broadcast_to(cq, (tau.shape[0],) + cq.shape)
        objs = 0.5 * jnp.einsum('ti,tij,tj->t', tau, Cq, tau) + \
            jnp.einsum('ti,ti->t', tau, cq)
    else:
        objs = jax.vmap(true_cost)(tau)
    return jnp.sum(objs)


def lqr_forward(
    x_init, x, u, K, k,
    true_cost, true_dynamics,
    u_lower=None, u_upper=None, u_zero_I=None, delta_u=None,
    linesearch_decay: float = 0.2,
    max_linesearch_iter: int = 10,
    parallel_linesearch: bool = True,
    unroll: int = 1,
):
    """Line-searched forward rollout (reference mpc/lqr_step.py:164-261).

    Per-instance semantics of the reference's batched search: attempt
    alpha=1 first (its step norm is ``full_du_norm``, the outer loop's
    convergence signal, mpc/lqr_step.py:243-245); while the true cost
    exceeds the old cost and attempts remain, decay alpha and retry.  The
    final trajectory is the last one computed even if it still fails
    (reference exits the loop and keeps ``new_x``/``new_u``), and the
    reported alpha is the one used for that trajectory (the reference
    decays then un-decays, mpc/lqr_step.py:247-252).

    With ``parallel_linesearch`` (the TPU default) the deterministic
    step-size schedule 1, d, d^2, ... is rolled out in one vmapped pass
    and the first cost-decreasing candidate is selected - identical
    result to the sequential search, but one scan over the horizon
    instead of up to ``max_linesearch_iter``.
    """
    # currently unimplemented in the reference too (mpc/lqr_step.py:195)
    assert not ((delta_u is not None) and (u_lower is None))

    old_cost = total_cost(x, u, true_cost)

    roll = partial(
        _rollout, x_init=x_init, x=x, u=u, K=K, k=k,
        true_cost=true_cost, true_dynamics=true_dynamics,
        u_lower=u_lower, u_upper=u_upper, u_zero_I=u_zero_I,
        delta_u=delta_u, unroll=unroll)

    dtype = u.dtype

    if parallel_linesearch:
        alphas = jnp.asarray(linesearch_decay, dtype) ** \
            jnp.arange(max_linesearch_iter, dtype=dtype)
        nxs, nus, objss = jax.vmap(lambda a: roll(alpha=a))(alphas)
        costs = jnp.sum(objss, axis=1)
        full_du_norm = jnp.linalg.norm((u - nus[0]).ravel())
        passing = costs <= old_cost
        kidx = jnp.where(jnp.any(passing), jnp.argmax(passing),
                         max_linesearch_iter - 1)
        return ForwardOut(nxs[kidx], nus[kidx], objss[kidx],
                          full_du_norm, alphas[kidx], costs[kidx])

    new_x1, new_u1, objs1 = roll(alpha=jnp.asarray(1.0, dtype))
    full_du_norm = jnp.linalg.norm((u - new_u1).ravel())

    class LS(NamedTuple):
        alpha: jax.Array
        cost: jax.Array
        new_x: jax.Array
        new_u: jax.Array
        objs: jax.Array
        i: jax.Array

    def cond(s: LS):
        return (s.cost > old_cost) & (s.i < max_linesearch_iter)

    def body(s: LS):
        alpha = s.alpha * linesearch_decay
        nx, nu, objs = roll(alpha=alpha)
        return LS(alpha, jnp.sum(objs), nx, nu, objs, s.i + 1)

    init = LS(jnp.asarray(1.0, dtype), jnp.sum(objs1),
              new_x1, new_u1, objs1, jnp.asarray(1, jnp.int32))
    out = lax.while_loop(cond, body, init)

    return ForwardOut(out.new_x, out.new_u, out.objs,
                      full_du_norm, out.alpha, out.cost)


def lqr_step_delta(
    x_init, C, c, F, f, x, u,
    n_state: int,
    true_cost, true_dynamics,
    u_lower=None, u_upper=None, u_zero_I=None, delta_u=None,
    linesearch_decay: float = 0.2,
    max_linesearch_iter: int = 10,
    pnqp_iter: int = 20,
    parallel_linesearch: bool = True,
    parallel_riccati=False,
    unroll: int = 1,
):
    """One full LQR step in delta space: Riccati + line-searched rollout.

    Equivalent of ``LQRStepFn.forward`` without ``no_op_forward``
    (mpc/lqr_step.py:277-309): Taylor-recentre the linear cost term at
    the current trajectory (c_back = C_t @ xu_t + c_t,
    mpc/lqr_step.py:284-295), run the Riccati recursion on the
    quadratized model, then roll out with the true cost/dynamics.

    ``parallel_riccati``: False / True / 'auto'.  For *unconstrained*
    steps, True (or 'auto' with T >= 128) computes the gains with the
    O(log T)-depth associative-scan Riccati (ops/pscan.py) instead of
    the sequential scan; constrained steps always run sequentially (the
    per-step box QP is not an associative operator).
    """
    T = c.shape[0]
    tau = jnp.concatenate([x, u], axis=1)
    c_back = jnp.einsum('tij,tj->ti', C, tau) + c

    use_parallel = (parallel_riccati is True
                    or (parallel_riccati == 'auto' and T >= 128))
    if use_parallel and u_lower is None and u_zero_I is None:
        from .pscan import parallel_riccati_gains
        K, k = parallel_riccati_gains(C, c_back, F, None, n_state)
        back = RiccatiOut(K, k, jnp.asarray(0, jnp.int32))
    else:
        back = riccati_backward(
            C, c_back, F, u, n_state=n_state,
            u_lower=u_lower, u_upper=u_upper,
            u_zero_I=u_zero_I, delta_u=delta_u,
            pnqp_iter=pnqp_iter, unroll=unroll)

    fwd = lqr_forward(
        x_init, x, u, back.K, back.k,
        true_cost=true_cost, true_dynamics=true_dynamics,
        u_lower=u_lower, u_upper=u_upper, u_zero_I=u_zero_I,
        delta_u=delta_u,
        linesearch_decay=linesearch_decay,
        max_linesearch_iter=max_linesearch_iter,
        parallel_linesearch=parallel_linesearch,
        unroll=unroll)

    return fwd, back.n_qp_iter


def lqr_solve(C, c, F, f, x_init, u_zero_I=None,
              n_state: Optional[int] = None, parallel: bool = False):
    """Exact unconstrained LQR solve, optionally with zero-clamped controls.

    With ``parallel=True`` the solve runs at O(log T) depth via the
    associative-scan formulation (ops/pscan.py) - identical results,
    much faster for long horizons on TPU.

    Used by the analytic backward pass: the reference solves the
    differential KKT system by recursively instantiating a 1-iteration
    MPC on QuadCost(C, -r) / LinDx(F, None) with ``u_zero_I`` set to the
    active set (mpc/lqr_step.py:328-340).  The differential problem is
    linear-quadratic, so a single Riccati pass + rollout is exact; this
    function is also scan-based and therefore differentiable, which the
    reference's backward is not.

    Returns (x, u) trajectories of shape [T, n_state], [T, n_ctrl].
    ``parallel`` may be False / True / 'auto' (parallel when T >= 128).
    """
    if parallel == 'auto':
        parallel = c.shape[0] >= 128
    if parallel:
        from .pscan import parallel_lqr_solve
        return parallel_lqr_solve(C, c, F, f, x_init,
                                  u_zero_I=u_zero_I, n_state=n_state)

    T, n_tau = c.shape
    if n_state is None:
        n_state = F.shape[1]
    n_ctrl = n_tau - n_state

    u0 = jnp.zeros((T, n_ctrl), c.dtype)
    back = riccati_backward(
        C, c, F, u0, n_state=n_state, f=f, u_zero_I=u_zero_I)

    Fp = _pad_time(F, T)
    fp = _pad_time(f, T) if f is not None else None

    def step(xt, inp):
        t, Kt, kt = inp
        ut = Kt @ xt + kt
        if u_zero_I is not None:
            ut = jnp.where(u_zero_I[t], 0.0, ut)
        xut = jnp.concatenate([xt, ut])
        xtp1 = Fp[t] @ xut
        if fp is not None:
            xtp1 = xtp1 + fp[t]
        return xtp1, (xt, ut)

    ts = jnp.arange(T)
    _, (xs, us) = lax.scan(step, x_init, (ts, back.K, back.k))
    return xs, us
