#!/usr/bin/env python
"""Batched pendulum swing-up (notebook equivalent).

Script equivalent of the reference's "Pendulum Control" notebook:
a batch of pendulums starting at random angles, driven to upright by a
receding-horizon MPC with box torque constraints, optionally rendered to
an mp4 grid.

Usage: python examples/pendulum_swingup.py [--n-batch 16] [--save-video DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np

import jax
import jax.numpy as jnp

from control import build_solver          # shared receding-horizon step
from mpc_tpu.models import PendulumDx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-batch', type=int, default=16)
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--T', type=int, default=20)
    ap.add_argument('--lqr-iter', type=int, default=50)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--save-video', default=None, metavar='DIR')
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    dx = PendulumDx()
    B = args.n_batch
    th = np.pi * (2 * rng.rand(B) - 1)
    state = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), jnp.float32)
    u_warm = jnp.zeros((args.T, B, 1), jnp.float32)

    step = build_solver(dx, args.T, B, args.lqr_iter)

    frames = []
    for i in range(args.steps):
        state, u_warm, act, costs = step(state, u_warm)
        upright = float(jnp.mean(state[:, 0]))
        print(f'step {i:3d}: mean cos(th) {upright:7.4f} '
              f'mean cost {float(jnp.mean(costs)):10.4f}')
        if args.save_video:
            frames.append(np.asarray(state))

    if args.save_video:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(args.save_video, exist_ok=True)
        n_row = int(np.ceil(np.sqrt(B)))
        for i, sf in enumerate(frames):
            fig, axs = plt.subplots(n_row, n_row, figsize=(3 * n_row,
                                                           3 * n_row))
            axs = np.atleast_1d(axs).ravel()
            for b in range(B):
                dx.get_frame(sf[b], ax=axs[b])
                axs[b].set_axis_off()
            fig.savefig(os.path.join(args.save_video, f'{i:03d}.png'))
            plt.close(fig)
        vid = os.path.join(args.save_video, 'pendulum.mp4')
        if os.system(f'ffmpeg -y -loglevel error -r 16 -i '
                     f'{args.save_video}/%03d.png {vid}') == 0:
            print(f'wrote {vid}')


if __name__ == '__main__':
    main()
