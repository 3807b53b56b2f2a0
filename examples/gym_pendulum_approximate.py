#!/usr/bin/env python
"""MPC with *learned* pendulum dynamics, trained online.

TPU-native equivalent of the reference's
examples/gym_pendulum_approximate.py: the controller's dynamics model is
an MLP (``NNDynamics``) trained on observed (state, action, next_state)
residual transitions every ``--train-every`` env steps, bootstrapped
from an initial phase of random actions.  The control loop is the same
receding-horizon solve/act/shift pattern as gym_pendulum.py.

The env is gym's Pendulum-v1 when available, else the built-in
equivalent physics.

Usage: python examples/gym_pendulum_approximate.py [--steps 300]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gym_pendulum import PendulumDynamics, get_env
from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import NNDynamics

logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s')
logger = logging.getLogger(__name__)


def make_train_step(optimizer):
    """Jitted one-epoch MSE step on residual targets
    (reference examples/gym_pendulum_approximate.py:100-147)."""

    @jax.jit
    def train_step(model: NNDynamics, opt_state, xs, us, x_nexts):
        def loss_fn(m):
            pred = jax.vmap(m)(xs, us)
            return jnp.mean((pred - x_nexts) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return train_step


def validate(model, dx, rng, n=512):
    """Model error vs the true dynamics on random states
    (reference examples/gym_pendulum_approximate.py:139-146)."""
    th = np.pi * (2 * rng.rand(n) - 1)
    thdot = 8.0 * (2 * rng.rand(n) - 1)
    u = 2.0 * (2 * rng.rand(n, 1) - 1)
    xs = jnp.asarray(np.stack([th, thdot], 1), jnp.float32)
    us = jnp.asarray(u, jnp.float32)
    true = dx(xs, us)
    pred = jax.vmap(model)(xs, us)
    return float(jnp.mean((true - pred) ** 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--bootstrap-steps', type=int, default=100)
    ap.add_argument('--train-every', type=int, default=50)
    ap.add_argument('--train-epochs', type=int, default=200)
    ap.add_argument('--T', type=int, default=20)
    ap.add_argument('--lqr-iter', type=int, default=20)
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    env = get_env(args.seed)
    true_dx = PendulumDynamics()

    model = NNDynamics.init(
        jax.random.PRNGKey(args.seed), n_state=2, n_ctrl=1,
        hidden_sizes=(args.hidden, args.hidden), activation='sigmoid',
        passthrough=True)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(model)
    train_step = make_train_step(optimizer)

    # swing-up cost (same as gym_pendulum.py)
    T = args.T
    q = jnp.array([1., 0.1, 0.001])
    p = jnp.zeros(3)
    C = jnp.broadcast_to(jnp.diag(q), (T, 1, 3, 3)).astype(jnp.float32)
    c = jnp.broadcast_to(p, (T, 1, 3)).astype(jnp.float32)
    lb = jnp.full((T, 1, 1), -2.0, jnp.float32)
    ub = jnp.full((T, 1, 1), 2.0, jnp.float32)

    cfg = MPCConfig(
        n_state=2, n_ctrl=1, T=T, lqr_iter=args.lqr_iter,
        grad_method=GradMethods.ANALYTIC,     # uses NNDynamics.grad_input
        eps=1e-2, exit_unconverged=False, detach_unconverged=False,
        backprop=False, linesearch_decay=0.2, max_linesearch_iter=5)

    @jax.jit
    def solve(model, state, u_warm):
        sol = batched_solve(cfg, state, QuadCost(C, c), model,
                            u_init=u_warm, u_lower=lb, u_upper=ub)
        u_next = jnp.concatenate(
            [sol.u[1:], sol.u[-1:]], axis=0)      # repeat-last tail
        return sol.u[0, 0], u_next

    replay = []          # (x, u, x_next) transitions
    u_warm = jnp.zeros((T, 1, 1), jnp.float32)

    for i in range(args.steps):
        state = np.asarray(env.state, np.float32)
        if i < args.bootstrap_steps:
            # bootstrap with random actions (reference :163-175)
            action = np.asarray([2.0 * (2 * rng.rand() - 1)], np.float32)
        else:
            a, u_warm = solve(model, jnp.asarray(state)[None], u_warm)
            action = np.asarray(a, np.float32)
        env.step(action)
        next_state = np.asarray(env.state, np.float32)
        replay.append((state, action, next_state))

        if (i + 1) % args.train_every == 0:
            xs = jnp.asarray(np.stack([t[0] for t in replay]))
            us = jnp.asarray(np.stack([t[1] for t in replay]))
            xn = jnp.asarray(np.stack([t[2] for t in replay]))
            for _ in range(args.train_epochs):
                model, opt_state, loss = train_step(
                    model, opt_state, xs, us, xn)
            val = validate(model, true_dx, rng)
            logger.info(
                f'step {i:3d}: trained on {len(replay)} transitions, '
                f'train mse={float(loss):.2e} val-vs-true mse={val:.2e}')

        if i >= args.bootstrap_steps and i % 10 == 0:
            th = float(env.state[0])
            logger.info(f'step {i:3d}: th={th:7.3f} '
                        f'thdot={float(env.state[1]):7.3f} '
                        f'u={float(action[0]):6.3f}')

    th = float(env.state[0])
    logger.info(f'final: th={th:.3f} (0 is upright)')


if __name__ == '__main__':
    main()
