#!/usr/bin/env python
"""Receding-horizon MPC demo runner (CLI).

TPU-native equivalent of the reference's demo runner
(mpc/env_dx/control.py:25-106): pick an environment, run a receding-
horizon loop -- solve a T-step MPC from the current state, apply the
first control, shift the control sequence as the next warm start --
and optionally render each frame to a video.

Unlike the reference (which re-creates the controller object each step),
the compiled solve is built once and reused every step; only the data
(state, warm start) changes, so there is a single XLA compilation.

Usage:
  python examples/control.py --env pendulum --n-batch 4 --steps 100
  python examples/control.py --env cartpole --save-video /tmp/cartpole
"""

import argparse
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
from mpc_tpu.models import CartpoleDx, PendulumDx


def make_env(name):
    if name == 'pendulum':
        dx = PendulumDx()
        # uniformly random initial angles, zero velocity
        # (reference env_dx/control.py:33-37)
        def init_state(rng, n_batch):
            th = np.pi * (2 * rng.rand(n_batch) - 1)
            return np.stack([np.cos(th), np.sin(th), np.zeros(n_batch)], 1)
        T = 20
    elif name == 'cartpole':
        dx = CartpoleDx()
        # near-upright with small perturbations
        # (reference env_dx/control.py:38-44)
        def init_state(rng, n_batch):
            th = 0.5 * (2 * rng.rand(n_batch) - 1)
            return np.stack([
                0.5 * (2 * rng.rand(n_batch) - 1),
                0.5 * (2 * rng.rand(n_batch) - 1),
                np.cos(th), np.sin(th),
                0.5 * (2 * rng.rand(n_batch) - 1)], 1)
        T = 25
    else:
        raise ValueError(f'unknown env {name!r}')
    return dx, init_state, T


def build_solver(dx, T, n_batch, lqr_iter, dtype=jnp.float32):
    """One jitted receding-horizon step: (state, u_warm) -> (u*, x*)."""
    ns, nc = dx.n_state, dx.n_ctrl
    n_tau = ns + nc
    q, p = dx.get_true_obj()
    C = jnp.broadcast_to(jnp.diag(q).astype(dtype), (T, n_batch, n_tau, n_tau))
    c = jnp.broadcast_to(jnp.asarray(p, dtype), (T, n_batch, n_tau))
    lb = jnp.full((T, n_batch, nc), dx.lower, dtype)
    ub = jnp.full((T, n_batch, nc), dx.upper, dtype)

    cfg = MPCConfig(
        n_state=ns, n_ctrl=nc, T=T, lqr_iter=lqr_iter,
        grad_method=GradMethods.AUTO_DIFF,
        eps=dx.mpc_eps,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        linesearch_decay=dx.linesearch_decay,
        max_linesearch_iter=dx.max_linesearch_iter)

    @jax.jit
    def step(state, u_warm):
        sol = batched_solve(cfg, state, QuadCost(C, c), dx,
                            u_init=u_warm, u_lower=lb, u_upper=ub)
        act = sol.u[0]
        next_state = dx(state, act)
        # shift warm start with a zero tail (reference
        # examples/gym_pendulum.py:100)
        u_next = jnp.concatenate(
            [sol.u[1:], jnp.zeros((1, n_batch, nc), dtype)], axis=0)
        return next_state, u_next, act, sol.costs

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--env', default='pendulum',
                    choices=('pendulum', 'cartpole'))
    ap.add_argument('--n-batch', type=int, default=8)
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--lqr-iter', type=int, default=10)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--save-video', default=None, metavar='DIR',
                    help='write per-step frames (batch element 0) as PNGs '
                         'and an mp4 if ffmpeg is available')
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    dx, init_state, T = make_env(args.env)
    state = jnp.asarray(init_state(rng, args.n_batch), jnp.float32)
    u_warm = jnp.zeros((T, args.n_batch, dx.n_ctrl), jnp.float32)

    step = build_solver(dx, T, args.n_batch, args.lqr_iter)

    if args.save_video:
        os.makedirs(args.save_video, exist_ok=True)

    t_solve = 0.0
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, u_warm, act, costs = step(state, u_warm)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        if i > 0:            # first call pays compilation
            t_solve += dt
        print(f'step {i:3d}: mean cost {float(jnp.mean(costs)):10.4f} '
              f'mean |u0| {float(jnp.mean(jnp.abs(act))):8.4f} '
              f'({dt * 1e3:.1f} ms)')
        if args.save_video:
            import matplotlib
            matplotlib.use('Agg')
            fig, ax = dx.get_frame(np.asarray(state[0]))
            fig.savefig(os.path.join(args.save_video, f'{i:03d}.png'))
            import matplotlib.pyplot as plt
            plt.close(fig)

    if args.steps > 1:
        print(f'mean solve+step time: {t_solve / (args.steps - 1) * 1e3:.2f} '
              f'ms (batch {args.n_batch})')

    if args.save_video:
        # best effort mp4 (reference env_dx/pendulum.py:135-141)
        vid = os.path.join(args.save_video, f'{args.env}.mp4')
        code = os.system(
            f'ffmpeg -y -loglevel error -r 16 -i '
            f'{args.save_video}/%03d.png {vid}')
        if code == 0:
            print(f'wrote {vid}')


if __name__ == '__main__':
    main()
