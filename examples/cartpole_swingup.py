#!/usr/bin/env python
"""Batched cartpole stabilization (notebook equivalent).

Script equivalent of the reference's "Cartpole Control" notebook: a
batch of perturbed cartpoles stabilized to upright by receding-horizon
MPC with box force constraints.

Usage: python examples/cartpole_swingup.py [--n-batch 8] [--save-video DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np

import jax
import jax.numpy as jnp

from control import build_solver
from mpc_tpu.models import CartpoleDx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-batch', type=int, default=8)
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--T', type=int, default=25)
    ap.add_argument('--lqr-iter', type=int, default=50)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--save-video', default=None, metavar='DIR')
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    dx = CartpoleDx()
    B = args.n_batch
    th = 0.5 * (2 * rng.rand(B) - 1)
    state = jnp.asarray(np.stack([
        0.5 * (2 * rng.rand(B) - 1),
        0.5 * (2 * rng.rand(B) - 1),
        np.cos(th), np.sin(th),
        0.5 * (2 * rng.rand(B) - 1)], 1), jnp.float32)
    u_warm = jnp.zeros((args.T, B, 1), jnp.float32)

    step = build_solver(dx, args.T, B, args.lqr_iter)

    frames = []
    for i in range(args.steps):
        state, u_warm, act, costs = step(state, u_warm)
        upright = float(jnp.mean(state[:, 2]))
        print(f'step {i:3d}: mean cos(th) {upright:7.4f} '
              f'mean cost {float(jnp.mean(costs)):10.4f}')
        if args.save_video:
            frames.append(np.asarray(state))

    if args.save_video:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(args.save_video, exist_ok=True)
        for i, sf in enumerate(frames):
            fig, ax = dx.get_frame(sf[0])
            fig.savefig(os.path.join(args.save_video, f'{i:03d}.png'))
            plt.close(fig)
        vid = os.path.join(args.save_video, 'cartpole.mp4')
        if os.system(f'ffmpeg -y -loglevel error -r 16 -i '
                     f'{args.save_video}/%03d.png {vid}') == 0:
            print(f'wrote {vid}')


if __name__ == '__main__':
    main()
