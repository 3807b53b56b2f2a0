"""Projected-Newton box-constrained QP solver.

TPU-native re-design of the reference's batched PNQP (mpc/pnqp.py:5-82):

    min_x 0.5 x^T H x + q^T x    s.t.  lower <= x <= upper

This implementation is written for a *single* instance and composed with
``jax.vmap`` for the scenario batch; all data-dependent loops are
``lax.while_loop`` with fully masked state so shapes stay static under
``jit``.  Under ``vmap`` the while loops automatically become batched
loops that keep iterating until every lane converges while leaving
converged lanes untouched - which reproduces the reference's per-example
convergence mask ``J`` (mpc/pnqp.py:26,56-59) exactly.

Semantics intentionally preserved from the reference:
  * active set Ic = (x == lower & g > 0) | (x == upper & g < 0)
    (mpc/pnqp.py:32) - exact equality is safe because the clamp produces
    exact bound values;
  * per-instance convergence on ||dx|| < 1e-4 (mpc/pnqp.py:56);
  * Armijo line search with GAMMA=0.1, decay 0.1, at most 10 inner
    iterations, accepting the *last computed* trial point even when the
    iteration cap is hit (mpc/pnqp.py:61-78);
  * on convergence the pre-line-search x of the final iteration is
    returned together with that iteration's free-set mask and masked
    Hessian (mpc/pnqp.py:56-59), which the Riccati recursion reuses for
    the feedback-gain solve (mpc/lqr_step.py:135-148).

Documented deviation: the reference leaves 1e-11 on the clamped diagonal
of the masked Hessian; we use 1.0 (see linalg.masked_free_matrix), which
yields the same solution with far better float32 conditioning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import linalg

GAMMA = 0.1
LS_DECAY = 0.1
MAX_LS_ITER = 10
CONV_TOL = 1e-4


class PnqpResult(NamedTuple):
    x: jax.Array        # solution, shape (n,)
    H_free: jax.Array   # free-subspace-masked Hessian of the last iteration
    free: jax.Array     # bool free-set mask of the last iteration, shape (n,)
    n_iter: jax.Array   # int32 number of Newton iterations performed
    converged: jax.Array  # bool


class _State(NamedTuple):
    x: jax.Array
    H_free: jax.Array
    free: jax.Array
    i: jax.Array
    done: jax.Array


def _obj(H, q, x):
    return 0.5 * linalg.bquad(x, H) + linalg.bdot(q, x)


def pnqp_1d(H, q, lower, upper):
    """Closed-form 1-D box QP: x* = clamp(-q/H, lower, upper).

    For a single control (the pendulum/cartpole hot path) the projected
    Newton iteration is unnecessary - the scalar box QP has an exact
    solution, which is the fixed point the reference's loop converges to
    (mpc/pnqp.py with n==1).  This removes ~200 sequential VPU ops per
    Riccati step, the dominant cost on TPU where dispatch latency of tiny
    ops, not FLOPs, bounds the solver.
    """
    dtype = H.dtype
    h = H[0, 0]
    xn = -q / h
    x = jnp.clip(xn, lower, upper)
    g = h * x + q
    clamped = ((x == lower) & (g > 0)) | ((x == upper) & (g < 0))
    free = ~clamped
    H_free = linalg.masked_free_matrix(H, free)
    return PnqpResult(x, H_free, free,
                      jnp.asarray(1, jnp.int32), jnp.asarray(True))


def pnqp(H, q, lower, upper, x_init=None, n_iter=20,
         parallel_armijo: bool = True):
    """Solve a single box QP; vmap for a batch.

    Args:
      H: (n, n) symmetric PSD Hessian.
      q: (n,) linear term.
      lower, upper: (n,) box bounds (broadcast scalars before calling).
      x_init: optional (n,) warm start (e.g. the previous Riccati step's
        ``k_t``, reference mpc/lqr_step.py:135-137).
      n_iter: max Newton iterations (static).
      parallel_armijo: evaluate the whole deterministic step-size decay
        schedule at once and select the first passing trial instead of
        looping - identical result (the schedule is fixed), ~10x less
        sequential depth per Newton iteration on TPU.

    Returns:
      PnqpResult(x, H_free, free, n_iter, converged).
    """
    n = H.shape[-1]
    dtype = H.dtype
    lower = jnp.broadcast_to(jnp.asarray(lower, dtype), (n,))
    upper = jnp.broadcast_to(jnp.asarray(upper, dtype), (n,))

    if n == 1:
        return pnqp_1d(H, q, lower, upper)

    if x_init is None:
        # Newton point of the unconstrained problem, clamped
        # (reference mpc/pnqp.py:14-23).
        x_init = -linalg.solve_spd(H + 1e-11 * jnp.eye(n, dtype=dtype), q)
    x0 = linalg.eclamp(x_init, lower, upper)

    def newton_direction(x):
        g = H @ x + q
        clamped = ((x == lower) & (g > 0)) | ((x == upper) & (g < 0))
        free = ~clamped
        H_free = linalg.masked_free_matrix(H, free)
        g_free = jnp.where(clamped, 0.0, g)
        dx = -linalg.solve_spd(H_free, g_free)
        return dx, g, H_free, free

    def armijo_search_parallel(x, dx, g):
        # The reference decays alpha through the fixed schedule
        # 1, 0.1, ..., 0.1^9 until the Armijo ratio exceeds GAMMA,
        # accepting the first passing trial (or the last computed when
        # the 10-trial cap is hit, mpc/pnqp.py:61-78).  Because the
        # schedule is deterministic, all trials can be evaluated at once
        # and the first passing one selected - identical result, no
        # sequential inner loop.
        alphas = LS_DECAY ** jnp.arange(MAX_LS_ITER, dtype=dtype)
        fx = _obj(H, q, x)  # shared across all trials

        def trial(alpha):
            x_trial = linalg.eclamp(x + alpha * dx, lower, upper)
            num = fx - _obj(H, q, x_trial)
            den = linalg.bdot(g, x - x_trial)
            armijo = jnp.where(jnp.abs(den) < 1e-30,
                               jnp.asarray(GAMMA + 1e-6, dtype), num / den)
            return x_trial, armijo

        x_trials, armijos = jax.vmap(trial)(alphas)
        passing = armijos > GAMMA
        k = jnp.where(jnp.any(passing), jnp.argmax(passing),
                      MAX_LS_ITER - 1)
        return x_trials[k]

    def armijo_search_seq(x, dx, g):
        # reference-shaped sequential loop (kept for comparison/debug)
        class LS(NamedTuple):
            alpha: jax.Array
            armijo: jax.Array
            count: jax.Array
            x_trial: jax.Array

        def cond(s: LS):
            return (s.armijo <= GAMMA) & (s.count < MAX_LS_ITER)

        def body(s: LS):
            x_trial = linalg.eclamp(x + s.alpha * dx, lower, upper)
            num = _obj(H, q, x) - _obj(H, q, x_trial)
            den = linalg.bdot(g, x - x_trial)
            armijo = jnp.where(jnp.abs(den) < 1e-30,
                               jnp.asarray(GAMMA + 1e-6, dtype), num / den)
            alpha = jnp.where(armijo <= GAMMA, s.alpha * LS_DECAY, s.alpha)
            return LS(alpha, armijo, s.count + 1, x_trial)

        init = LS(jnp.asarray(1.0, dtype), jnp.asarray(GAMMA, dtype),
                  jnp.asarray(0, jnp.int32), x)
        out = lax.while_loop(cond, body, init)
        return out.x_trial

    armijo_search = (armijo_search_parallel if parallel_armijo
                     else armijo_search_seq)

    def cond(s: _State):
        return (~s.done) & (s.i < n_iter)

    def body(s: _State):
        dx, g, H_free, free = newton_direction(s.x)
        converged = jnp.linalg.norm(dx) < CONV_TOL
        x_ls = armijo_search(s.x, dx, g)
        x_new = jnp.where(converged, s.x, x_ls)
        return _State(x_new, H_free, free, s.i + 1, converged)

    init = _State(
        x=x0,
        H_free=linalg.masked_free_matrix(H, jnp.ones(n, dtype=bool)),
        free=jnp.ones(n, dtype=bool),
        i=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)
    return PnqpResult(out.x, out.H_free, out.free, out.i, out.done)
