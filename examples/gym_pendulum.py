#!/usr/bin/env python
"""MPC controlling a Pendulum environment with known analytic dynamics.

TPU-native equivalent of the reference's examples/gym_pendulum.py: the
controller uses the true pendulum dynamics as its model and drives the
environment through swing-up with a receding-horizon loop + shifted warm
start.

If OpenAI gym is installed, the real ``Pendulum-v1`` env is driven;
otherwise a built-in environment with the identical physics is used, so
the example runs everywhere.

Usage: python examples/gym_pendulum.py [--steps 150]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve

logging.basicConfig(level=logging.INFO,
                    format='%(asctime)s %(message)s')
logger = logging.getLogger(__name__)


class PendulumDynamics:
    """The OpenAI-gym pendulum physics as a pure function
    (reference examples/gym_pendulum.py:27-53): state (th, thdot),
    g=10, m=1, l=1, dt=0.05, torque clamp +-2, speed clamp +-8."""
    n_state = 2
    n_ctrl = 1
    max_torque = 2.0
    max_speed = 8.0
    dt = 0.05
    g, m, l = 10.0, 1.0, 1.0

    def __call__(self, state, action):
        th, thdot = state[..., 0], state[..., 1]
        u = jnp.clip(action[..., 0], -self.max_torque, self.max_torque)
        newthdot = thdot + (
            -3. * self.g / (2. * self.l) * jnp.sin(th + jnp.pi)
            + 3. / (self.m * self.l ** 2) * u) * self.dt
        newth = th + newthdot * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        return jnp.stack([angle_normalize(newth), newthdot], axis=-1)


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class FallbackPendulumEnv:
    """Drop-in for gym's Pendulum when gym is unavailable."""

    def __init__(self, seed=0):
        self._dx = PendulumDynamics()
        self._rng = np.random.RandomState(seed)
        self.state = None

    def reset(self):
        # start hanging down with a little spin (the reference manually
        # sets env.state, examples/gym_pendulum.py:68-70)
        self.state = np.array([np.pi, 0.5 * self._rng.randn()])
        return self.state.copy()

    def step(self, action):
        s = jnp.asarray(self.state, jnp.float32)[None]
        a = jnp.asarray(action, jnp.float32).reshape(1, 1)
        self.state = np.asarray(self._dx(s, a))[0]
        th = self.state[0]
        cost = th ** 2 + 0.1 * self.state[1] ** 2 + \
            0.001 * float(np.asarray(action) ** 2)
        return self.state.copy(), -cost, False, {}


def get_env(seed):
    try:
        import gym
        env = gym.make('Pendulum-v1')
        env.reset(seed=seed)
        env.unwrapped.state = np.array([np.pi, 0.0])

        class GymAdapter:
            state = property(lambda self: env.unwrapped.state)

            def reset(self):
                return env.unwrapped.state

            def step(self, action):
                out = env.step(np.asarray(action).reshape(1))
                obs, rew, done = out[0], out[1], out[2]
                return env.unwrapped.state, rew, done, {}

        logger.info('using gym Pendulum-v1')
        return GymAdapter()
    except Exception:
        logger.info('gym unavailable; using the built-in pendulum env')
        env = FallbackPendulumEnv(seed)
        env.reset()
        return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=150)
    ap.add_argument('--T', type=int, default=20, help='MPC horizon')
    ap.add_argument('--lqr-iter', type=int, default=50)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    env = get_env(args.seed)
    dx = PendulumDynamics()

    # swing-up quadratic cost from goal weights
    # (reference examples/gym_pendulum.py:72-83)
    goal_weights = jnp.array([1., 0.1])
    goal_state = jnp.array([0., 0.])
    ctrl_penalty = 0.001
    q = jnp.concatenate([goal_weights, ctrl_penalty * jnp.ones(1)])
    px = -jnp.sqrt(goal_weights) * goal_state
    p = jnp.concatenate([px, jnp.zeros(1)])
    T = args.T
    C = jnp.broadcast_to(jnp.diag(q), (T, 1, 3, 3)).astype(jnp.float32)
    c = jnp.broadcast_to(p, (T, 1, 3)).astype(jnp.float32)
    lb = jnp.full((T, 1, 1), -dx.max_torque, jnp.float32)
    ub = jnp.full((T, 1, 1), dx.max_torque, jnp.float32)

    cfg = MPCConfig(
        n_state=2, n_ctrl=1, T=T, lqr_iter=args.lqr_iter,
        grad_method=GradMethods.AUTO_DIFF, eps=1e-2,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        linesearch_decay=0.2, max_linesearch_iter=5)

    @jax.jit
    def solve(state, u_warm):
        sol = batched_solve(cfg, state, QuadCost(C, c), dx,
                            u_init=u_warm, u_lower=lb, u_upper=ub)
        u_next = jnp.concatenate(
            [sol.u[1:], jnp.zeros((1, 1, 1), jnp.float32)], axis=0)
        return sol.u[0, 0], u_next, sol.costs[0]

    u_warm = jnp.zeros((T, 1, 1), jnp.float32)
    total_reward = 0.0
    for i in range(args.steps):
        state = jnp.asarray(env.state, jnp.float32)[None]
        t0 = time.perf_counter()
        action, u_warm, cost = solve(state, u_warm)
        jax.block_until_ready(action)
        dt = time.perf_counter() - t0
        _, reward, _, _ = env.step(np.asarray(action))
        total_reward += float(reward)
        logger.info(
            f'step {i:3d}: th={float(env.state[0]):7.3f} '
            f'thdot={float(env.state[1]):7.3f} u={float(action[0]):6.3f} '
            f'reward={float(reward):8.3f} ({dt * 1e3:.1f} ms)')

    logger.info(f'total reward: {total_reward:.2f}')


if __name__ == '__main__':
    main()
