"""Transcendentals built from Pallas-lowerable primitives.

Mosaic (Pallas TPU) lowers sin/cos/exp/log/sqrt/tanh but not the
arctan family, which the pendulum/cartpole dynamics need
(reference mpc/env_dx/pendulum.py:69, cartpole.py:59).  ``atan2`` here
is the classic two-interval polynomial evaluation (the same argument
reduction used by Cephes/XLA single-precision atanf): reduce to
w = min/max in [0, 1], split at tan(pi/8) with w -> (w-1)/(w+1), apply
a degree-9 odd minimax polynomial, then undo the octant/quadrant
reductions with sign masks.  Max error ~1e-7 in float32, and it is
jnp-traceable everywhere (kernel, CPU, autodiff), so the SoA dynamics
use it on every backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TAN_PI_8 = 0.4142135623730950
_PI_4 = 0.7853981633974483
_PI_2 = 1.5707963267948966
_PI = 3.141592653589793


def atan_unit(w):
    """arctan on [-1, 1] (degree-9 odd minimax after octant split)."""
    big = jnp.abs(w) > _TAN_PI_8
    w_red = jnp.where(big, (jnp.abs(w) - 1.0) / (jnp.abs(w) + 1.0),
                      jnp.abs(w))
    z = w_red * w_red
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z
    p = (p - 3.33329491539e-1) * z * w_red + w_red
    a = jnp.where(big, p + _PI_4, p)
    return jnp.where(w < 0, -a, a)


def hard_clip(x, lo, hi):
    """Clip whose gradient is 1 ON the boundary (torch.clamp convention).

    ``jnp.clip`` lowers to min/max whose JVP splits 0.5/0.5 at exact
    ties, so d clip(u)/du = 0.5 at u == bound.  Box-constrained MPC
    saturates controls EXACTLY at the bounds (eclamp writes the bound
    value), so every bang-bang control sits on that tie and the dynamics
    Jacobian S comes out HALF the reference's - the iterates then
    diverge from mpc.pytorch (observed: 12/16 pendulum examples off by
    the full control range after 2 iterations).  This variant matches
    torch.clamp: gradient 1 inside and on the boundary, 0 strictly
    outside (reference dynamics clamp at mpc/env_dx/pendulum.py:70,
    cartpole.py:55; torch.clamp backward semantics).
    """
    return jnp.where(x < lo, lo, jnp.where(x > hi, hi, x))


def rotate_unit(cos_th, sin_th, delta):
    """Advance an angle's (cos, sin) representation by ``delta`` radians.

    Mathematically identical to ``th = atan2(sin, cos); th += delta``
    followed by re-taking cos/sin, but without the expensive in-kernel
    atan2 polynomial: plain angle addition, with a 1/hypot factor
    reproducing atan2's implicit renormalization of a drifting
    (cos, sin) pair.  The degenerate point (0, 0) follows atan2's
    convention (angle 0, i.e. treated as (1, 0)) instead of producing
    rsqrt(0) = inf -> NaN."""
    cd, sd = jnp.cos(delta), jnp.sin(delta)
    r2 = cos_th * cos_th + sin_th * sin_th
    deg = r2 < 1e-30
    c = jnp.where(deg, 1.0, cos_th)
    s = jnp.where(deg, 0.0, sin_th)
    inv_r = jax.lax.rsqrt(jnp.where(deg, 1.0, r2))
    return ((c * cd - s * sd) * inv_r, (s * cd + c * sd) * inv_r)


def atan2(y, x):
    """Four-quadrant arctangent from lowerable primitives."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    num = jnp.minimum(ax, ay)
    w = num / jnp.where(den == 0, 1.0, den)
    a = atan_unit(w)
    a = jnp.where(ay > ax, _PI_2 - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)
