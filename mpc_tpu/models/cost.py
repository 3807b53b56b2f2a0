"""Non-quadratic cost models.

The reference accepts any ``nn.Module`` cost and quadratizes it with
double autograd each outer iteration (``approximate_cost``,
mpc/mpc.py:447-487).  The TPU-native equivalent is a plain callable
``cost(tau) -> scalar`` (handled generically by
``solver.quadratize_cost``), optionally extended with the
structure-of-arrays protocol so the fused Pallas kernel can evaluate
and quadratize it in-kernel (ops/fused.py:_is_soa_cost):

  * ``soa_params() -> tuple of scalars`` - learnable/config scalars,
    shipped to the kernel through SMEM next to the dynamics params;
  * ``soa_cost(xs, us, params) -> scalar lane vector`` - the same cost
    with the state/control components as separate (8, 128) vector
    registers (batch-in-lanes layout), built only from TPU-lowerable
    ops (see ops/math.py for the atan2 caveat).

``PseudoHuberCost`` below is a complete worked example: a smooth
robust tracking cost, genuinely non-quadratic, with a diagonal
positive Hessian (well-conditioned Riccati recursions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class PseudoHuberCost:
    """Smooth robust tracking cost on tau = (x, u):

        cost(tau) = sum_i w_i * delta^2 * (sqrt(1 + ((tau_i - goal_i)
                    / delta)^2) - 1)

    Quadratic near the goal, linear in the tails (the pseudo-Huber
    loss), so it is non-quadratic everywhere except asymptotically -
    the standard robust alternative to the reference's QuadCost.
    Registered as a pytree: ``w``/``goal``/``delta`` are learnable and
    gradients flow through the solver's KKT fixed point.
    """

    def __init__(self, w, goal, delta=1.0):
        self.w = jnp.asarray(w)
        self.goal = jnp.asarray(goal)
        self.delta = jnp.asarray(delta)

    def __call__(self, tau):
        r = (tau - self.goal) / self.delta
        return jnp.sum(
            self.w * self.delta ** 2 * (jnp.sqrt(1.0 + r * r) - 1.0))

    # -- structure-of-arrays protocol (fused kernel) ----------------------
    def soa_params(self):
        n = self.w.shape[0]
        return tuple(self.w[i] for i in range(n)) + \
            tuple(self.goal[i] for i in range(n)) + (self.delta,)

    def soa_cost(self, xs, us, params):
        comps = list(xs) + (list(us) if isinstance(us, tuple) else [us])
        n = len(comps)
        w, goal, delta = params[:n], params[n:2 * n], params[2 * n]
        acc = 0.0
        for i in range(n):
            r = (comps[i] - goal[i]) / delta
            acc = acc + w[i] * delta * delta * (
                jnp.sqrt(1.0 + r * r) - 1.0)
        return acc

    def tree_flatten(self):
        return (self.w, self.goal, self.delta), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.w, obj.goal, obj.delta = children
        return obj
