"""Pendulum environment dynamics (reference mpc/env_dx/pendulum.py:18-114).

3-state (cos th, sin th, dth), 1-control pendulum with torque clamp +-2
and Euler integration; simple (g, m, l) or damped-biased (g, m, l, d, b)
parameterization.  Registered as a pytree so the physics parameters can
be learned by differentiating through the controller.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PendulumDx:
    params: jax.Array = None
    simple: bool = True

    # constants (reference pendulum.py:23-27)
    max_torque = 2.0
    dt = 0.05
    n_state = 3
    n_ctrl = 1

    # cost / solver spec carried on the env object
    # (reference pendulum.py:40-47)
    goal_state = np.array([1., 0., 0.])
    goal_weights = np.array([1., 1., 0.1])
    ctrl_penalty = 0.001
    lower, upper = -2., 2.
    mpc_eps = 1e-3
    linesearch_decay = 0.2
    max_linesearch_iter = 5

    def __post_init__(self):
        if self.params is None:
            if self.simple:
                self.params = jnp.array([10., 1., 1.])   # g, m, l
            else:
                self.params = jnp.array([10., 1., 1., 0., 0.])

    def __call__(self, x, u):
        """Euler step (reference pendulum.py:49-84). Shape-polymorphic on
        leading dims; operates on the last axis."""
        if self.simple:
            g, m, l = self.params
        else:
            g, m, l, d, b = self.params

        from ..ops.math import hard_clip
        u = hard_clip(u[..., 0], -self.max_torque, self.max_torque)
        cos_th, sin_th, dth = x[..., 0], x[..., 1], x[..., 2]
        th = jnp.arctan2(sin_th, cos_th)
        if self.simple:
            newdth = dth + self.dt * (
                -3. * g / (2. * l) * (-sin_th) + 3. * u / (m * l ** 2))
        else:
            sin_th_bias = jnp.sin(th + b)
            newdth = dth + self.dt * (
                -3. * g / (2. * l) * (-sin_th_bias) + 3. * u / (m * l ** 2)
                - d * th)
        newth = th + newdth * self.dt
        return jnp.stack(
            [jnp.cos(newth), jnp.sin(newth), newdth], axis=-1)

    # -- structure-of-arrays protocol (for the fused Pallas solver) -------
    # Inside a TPU kernel the batch lives on the vector lanes, so state
    # components are separate (8, 128) component arrays rather than a
    # trailing axis; ``soa_step`` is the same Euler step in that form.
    def soa_params(self):
        n = 3 if self.simple else 5
        return tuple(self.params[i] for i in range(n))

    def soa_step(self, xs, u, params):
        from ..ops.math import atan2, hard_clip
        if self.simple:
            g, m, l = params
        else:
            g, m, l, d, b = params
        cos_th, sin_th, dth = xs
        u = hard_clip(u, -self.max_torque, self.max_torque)
        if self.simple:
            newdth = dth + self.dt * (
                -3. * g / (2. * l) * (-sin_th) + 3. * u / (m * l ** 2))
            # angle addition instead of th = atan2(s, c); newth = th + d
            # - identical to the reference's atan2 form (pendulum.py:
            # 70-80) but without the expensive in-kernel atan2
            # polynomial (ops/math.py:rotate_unit)
            from ..ops.math import rotate_unit
            new_cos, new_sin = rotate_unit(cos_th, sin_th,
                                           newdth * self.dt)
            return (new_cos, new_sin, newdth)
        th = atan2(sin_th, cos_th)
        sin_th_bias = jnp.sin(th + b)
        newdth = dth + self.dt * (
            -3. * g / (2. * l) * (-sin_th_bias) + 3. * u / (m * l ** 2)
            - d * th)
        newth = th + newdth * self.dt
        return (jnp.cos(newth), jnp.sin(newth), newdth)

    def get_true_obj(self):
        """Diagonal quadratic swing-up objective
        (reference pendulum.py:106-114).  Returns (q, p) with
        C = diag(q), c = p."""
        q = jnp.concatenate([
            jnp.asarray(self.goal_weights),
            self.ctrl_penalty * jnp.ones(self.n_ctrl)])
        px = -jnp.sqrt(jnp.asarray(self.goal_weights)) * \
            jnp.asarray(self.goal_state)
        p = jnp.concatenate([px, jnp.zeros(self.n_ctrl)])
        return q, p

    def get_frame(self, x, ax=None):
        """Matplotlib rendering (reference pendulum.py:86-104)."""
        import matplotlib.pyplot as plt
        x = np.asarray(x).reshape(-1)
        assert len(x) == 3
        l = float(self.params[2])
        cos_th, sin_th, _ = x
        px, py = sin_th * l, cos_th * l
        if ax is None:
            fig, ax = plt.subplots(figsize=(6, 6))
        else:
            fig = ax.get_figure()
        ax.plot((0, px), (0, py), color='k')
        ax.set_xlim((-l * 1.2, l * 1.2))
        ax.set_ylim((-l * 1.2, l * 1.2))
        return fig, ax

    def tree_flatten(self):
        return (self.params,), (self.simple,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.params = children[0]
        obj.simple = aux[0]
        return obj


if __name__ == '__main__':
    # render a swing-up mp4, like the reference env's __main__
    # (mpc/env_dx/pendulum.py:117-141); the full demo lives in
    # examples/pendulum_swingup.py (shipped in the repo, not the
    # installed package)
    from mpc_tpu.models import _run_example
    _run_example('pendulum_swingup.py')
