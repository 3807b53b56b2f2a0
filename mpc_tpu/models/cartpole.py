"""Cartpole environment dynamics (reference mpc/env_dx/cartpole.py:28-124).

5-state (x, dx, cos th, sin th, dth), 1-control cartpole with force clamp
+-100 and Euler integration.  Registered as a pytree so the physics
parameters can be learned by differentiating through the controller.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CartpoleDx:
    params: jax.Array = None

    n_state = 5
    n_ctrl = 1
    force_mag = 100.
    dt = 0.05
    theta_threshold_radians = np.pi
    x_threshold = 2.4
    max_velocity = 10

    lower = -100.
    upper = 100.

    # 0  1      2        3   4
    # x dx cos(th) sin(th) dth   (reference cartpole.py:53-56)
    goal_state = np.array([0., 0., 1., 0., 0.])
    goal_weights = np.array([0.1, 0.1, 1., 1., 0.1])
    ctrl_penalty = 0.001

    mpc_eps = 1e-4
    linesearch_decay = 0.5
    max_linesearch_iter = 2

    def __post_init__(self):
        if self.params is None:
            # gravity, masscart, masspole, length (reference cartpole.py:36-38)
            self.params = jnp.array([9.8, 1.0, 0.1, 0.5])

    def __call__(self, state, u):
        """Euler step (reference cartpole.py:63-96). Shape-polymorphic on
        leading dims; operates on the last axis."""
        gravity, masscart, masspole, length = self.params
        total_mass = masspole + masscart
        polemass_length = masspole * length

        from ..ops.math import hard_clip
        u = hard_clip(u[..., 0], -self.force_mag, self.force_mag)
        x, dx, cos_th, sin_th, dth = (
            state[..., 0], state[..., 1], state[..., 2],
            state[..., 3], state[..., 4])
        th = jnp.arctan2(sin_th, cos_th)

        cart_in = (u + polemass_length * dth ** 2 * sin_th) / total_mass
        th_acc = (gravity * sin_th - cos_th * cart_in) / (
            length * (4. / 3. - masspole * cos_th ** 2 / total_mass))
        xacc = cart_in - polemass_length * th_acc * cos_th / total_mass

        x = x + self.dt * dx
        dx = dx + self.dt * xacc
        th = th + self.dt * dth
        dth = dth + self.dt * th_acc

        return jnp.stack(
            [x, dx, jnp.cos(th), jnp.sin(th), dth], axis=-1)

    # -- structure-of-arrays protocol (for the fused Pallas solver) -------
    def soa_params(self):
        return tuple(self.params[i] for i in range(4))

    def soa_step(self, xs, u, params):
        from ..ops.math import hard_clip
        gravity, masscart, masspole, length = params
        total_mass = masspole + masscart
        polemass_length = masspole * length

        u = hard_clip(u, -self.force_mag, self.force_mag)
        x, dx, cos_th, sin_th, dth = xs

        cart_in = (u + polemass_length * dth ** 2 * sin_th) / total_mass
        th_acc = (gravity * sin_th - cos_th * cart_in) / (
            length * (4. / 3. - masspole * cos_th ** 2 / total_mass))
        xacc = cart_in - polemass_length * th_acc * cos_th / total_mass

        x = x + self.dt * dx
        dx = dx + self.dt * xacc
        # angle addition instead of th = atan2(s, c); newth = th + d -
        # identical to the reference's atan2 form (cartpole.py:78/90-91)
        # but without the in-kernel atan2 polynomial
        # (ops/math.py:rotate_unit); note the integration uses the OLD
        # dth, like the reference
        from ..ops.math import rotate_unit
        new_cos, new_sin = rotate_unit(cos_th, sin_th, dth * self.dt)
        dth = dth + self.dt * th_acc
        return (x, dx, new_cos, new_sin, dth)

    def get_true_obj(self):
        """Diagonal quadratic balance objective
        (reference cartpole.py:116-124).  Returns (q, p) with
        C = diag(q), c = p."""
        q = jnp.concatenate([
            jnp.asarray(self.goal_weights),
            self.ctrl_penalty * jnp.ones(self.n_ctrl)])
        px = -jnp.sqrt(jnp.asarray(self.goal_weights)) * \
            jnp.asarray(self.goal_state)
        p = jnp.concatenate([px, jnp.zeros(self.n_ctrl)])
        return q, p

    def get_frame(self, state, ax=None):
        """Matplotlib rendering (reference cartpole.py:98-114)."""
        import matplotlib.pyplot as plt
        state = np.asarray(state).reshape(-1)
        assert len(state) == 5
        x, _, cos_th, sin_th, _ = state
        length = float(self.params[3])
        th_x, th_y = sin_th * length, cos_th * length
        if ax is None:
            fig, ax = plt.subplots(figsize=(6, 6))
        else:
            fig = ax.get_figure()
        ax.plot((x, x + th_x), (0, th_y), color='k')
        ax.set_xlim((-length * 2, length * 2))
        ax.set_ylim((-length * 2, length * 2))
        return fig, ax

    def tree_flatten(self):
        return (self.params,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.params = children[0]
        return obj


if __name__ == '__main__':
    # render a swing-up mp4, like the reference env's __main__
    # (mpc/env_dx/cartpole.py:98-152); the full demo lives in
    # examples/cartpole_swingup.py (shipped in the repo, not the
    # installed package)
    from mpc_tpu.models import _run_example
    _run_example('cartpole_swingup.py')
