"""Differentiable-MPC fixed-point layer.

``jax.custom_vjp`` re-design of the reference's ``LQRStepFn`` autograd
Function in ``no_op_forward`` mode (mpc/lqr_step.py:277-282, 311-407):
the forward pass just returns the converged trajectory; the backward pass
analytically differentiates through the KKT conditions of the converged
box-constrained LQR fixed point (Amos et al., NeurIPS 2018), producing
gradients w.r.t. ``x_init, C, c, F, f``.

The reference's backward recursively instantiates a fresh 1-iteration MPC
solver for the differential system (mpc/lqr_step.py:328-340); since that
differential problem is an equality-constrained (active-set-zeroed)
*linear-quadratic* problem, we call the exact scan-based ``lqr_solve``
directly - no recursion, no line search, and the backward itself stays
jittable and vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lqr

# Active-set identification tolerance at the solution
# (reference mpc/lqr_step.py:325-326).  Interacts with dtype: run f64 for
# gradient-oracle tests; in f32 the clamp produces exact bound values so
# the comparison is still reliable for genuinely active constraints.
ACTIVE_TOL = 1e-8


def make_lqr_fixed_point(n_state: int, has_bounds: bool, has_f: bool,
                         parallel: bool = False,
                         precision: str = 'float32'):
    """Build the custom-VJP fixed-point function for a given problem shape.

    Returns a function
        fp(x_init, C, c, F, f, u_lower, u_upper, x_star, u_star)
          -> (x_star, u_star)
    where ``f``, ``u_lower``, ``u_upper`` must be zero-arrays of the right
    shape when absent (static flags ``has_f`` / ``has_bounds`` say whether
    they participate).  Gradients flow to x_init, C, c, F and f only -
    matching the reference Function's signature (mpc/lqr_step.py:407).
    ``x_star``/``u_star`` are expected to be stop-gradient'd outputs of
    the non-differentiable iterative phase.

    ``precision`` pins the matmul precision of the BACKWARD trace.  A
    ``jax.default_matmul_precision`` context around the solve call does
    NOT reach here: a custom_vjp's bwd is traced during the backward
    sweep, after any caller-side context has exited, so its dot_generals
    would bind at TPU's bf16 default.  Measured at 20s/4c T=10 (round
    5): leaked-bf16 gradients sit 2.6e-4 (rel) from the f64 oracle vs
    9e-8 with the precision pinned here - the forward path was always
    safe because its primitives bind (and record their precision)
    inside the solver's context.
    """

    @jax.custom_vjp
    def fixed_point(x_init, C, c, F, f, u_lower, u_upper, x_star, u_star):
        return x_star, u_star

    def fwd(x_init, C, c, F, f, u_lower, u_upper, x_star, u_star):
        res = (C, c, F, u_lower, u_upper, x_star, u_star)
        return (x_star, u_star), res

    def bwd(res, g):
        with jax.default_matmul_precision(precision):
            return _bwd_body(res, g)

    def _bwd_body(res, g):
        C, c, F, u_lower, u_upper, x_star, u_star = res
        dl_dx, dl_du = g
        T = c.shape[0]

        # r_t = (dl/dx_t, dl/du_t)   (reference mpc/lqr_step.py:316-320)
        r = jnp.concatenate([dl_dx, dl_du], axis=1)

        # active set at the solution (reference mpc/lqr_step.py:322-326)
        if has_bounds:
            I = (jnp.abs(u_star - u_lower) <= ACTIVE_TOL) | \
                (jnp.abs(u_star - u_upper) <= ACTIVE_TOL)
        else:
            I = None

        # differential LQR solve: min 0.5 d^T C d - r^T d  s.t. dynamics,
        # d x_0 = 0, active controls pinned to zero
        # (reference mpc/lqr_step.py:327-340)
        dx0 = jnp.zeros_like(x_star[0])
        dx, du = lqr.lqr_solve(C, -r, F, None, dx0, u_zero_I=I,
                               n_state=n_state, parallel=parallel)

        dxu = jnp.concatenate([dx, du], axis=1)
        xu = jnp.concatenate([x_star, u_star], axis=1)

        # dC_t = -1/2 (dxu ⊗ xu + xu ⊗ dxu)   (reference mpc/lqr_step.py:346-351)
        dC = -0.5 * (jnp.einsum('ti,tj->tij', dxu, xu) +
                     jnp.einsum('ti,tj->tij', xu, dxu))
        dc = -dxu

        # costate recursions lambda_t / dlambda_t, reverse time
        # (reference mpc/lqr_step.py:355-385)
        Cxx = C[:, :n_state, :n_state]
        Cxu = C[:, :n_state, n_state:]
        cx = c[:, :n_state]
        FxT = jnp.swapaxes(F[:, :, :n_state], 1, 2)   # [T-1, n_state, n_state]
        FxT_p = lqr._pad_time(FxT, T)                 # value at t=T-1 unused

        def costate(carry, inp):
            prev_lam, prev_dlam, last = carry
            Cxx_t, Cxu_t, cx_t, rx_t, x_t, u_t, dx_t, du_t, FxT_t = inp
            lam = Cxx_t @ x_t + Cxu_t @ u_t + cx_t
            dlam = Cxx_t @ dx_t + Cxu_t @ du_t - rx_t
            lam = jnp.where(last, lam, lam + FxT_t @ prev_lam)
            dlam = jnp.where(last, dlam, dlam + FxT_t @ prev_dlam)
            return (lam, dlam, jnp.asarray(False)), (lam, dlam)

        init = (jnp.zeros_like(cx[0]), jnp.zeros_like(cx[0]),
                jnp.asarray(True))
        xs = (Cxx, Cxu, cx, r[:, :n_state], x_star, u_star, dx, du, FxT_p)
        _, (lams, dlams) = jax.lax.scan(costate, init, xs, reverse=True)

        # dF_t = -(dlam_{t+1} ⊗ xu_t + lam_{t+1} ⊗ dxu_t)
        # (reference mpc/lqr_step.py:387-395)
        dF = -(jnp.einsum('ti,tj->tij', dlams[1:], xu[:-1]) +
               jnp.einsum('ti,tj->tij', lams[1:], dxu[:-1]))

        df = -dlams[1:] if has_f else jnp.zeros_like(dlams[1:])
        dx_init = -dlams[0]

        zero_lb = jnp.zeros_like(u_lower)
        zero_ub = jnp.zeros_like(u_upper)
        return (dx_init, dC, dc, dF, df, zero_lb, zero_ub,
                jnp.zeros_like(x_star), jnp.zeros_like(u_star))

    fixed_point.defvjp(fwd, bwd)
    return fixed_point
