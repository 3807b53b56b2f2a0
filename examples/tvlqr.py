#!/usr/bin/env python
"""Batched time-varying linear-quadratic control.

Script equivalent of the reference's "Time Varying Linear-Quadratic
Control" notebook (and the memory test setup at
tests/test_mpc.py:864-936): random TVLQR instances with random
PSD-regularized quadratic costs and random linear dynamics, solved
batched in one compiled program.

Usage: python examples/tvlqr.py [--n-batch 128] [--T 5]
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

from mpc_tpu import LinDx, MPC, QuadCost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-batch', type=int, default=128)
    ap.add_argument('--n-state', type=int, default=3)
    ap.add_argument('--n-ctrl', type=int, default=4)
    ap.add_argument('--T', type=int, default=5)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    ns, nc, T, B = args.n_state, args.n_ctrl, args.T, args.n_batch
    n_tau = ns + nc
    alpha = 0.2

    # random PSD quadratic cost and slightly-contracting linear dynamics
    # (the notebook's construction)
    C = np.stack([np.stack([
        np.eye(n_tau) + 0.1 * (lambda A: A @ A.T)(rng.randn(n_tau, n_tau))
        for _ in range(B)]) for _ in range(T)]).astype(np.float32)
    c = rng.randn(T, B, n_tau).astype(np.float32)
    F = np.tile(
        (np.eye(ns, n_tau) +
         alpha * rng.randn(ns, n_tau)).astype(np.float32), (T - 1, B, 1, 1))
    f = rng.randn(T - 1, B, ns).astype(np.float32)
    x_init = rng.randn(B, ns).astype(np.float32)

    ctrl = MPC(ns, nc, T, lqr_iter=20, backprop=False,
               exit_unconverged=False, eps=1e-4)

    t0 = time.perf_counter()
    x, u, objs = ctrl(jnp.asarray(x_init),
                      QuadCost(jnp.asarray(C), jnp.asarray(c)),
                      LinDx(jnp.asarray(F), jnp.asarray(f)))
    jax.block_until_ready(u)
    t1 = time.perf_counter()
    x, u, objs = ctrl(jnp.asarray(x_init),
                      QuadCost(jnp.asarray(C), jnp.asarray(c)),
                      LinDx(jnp.asarray(F), jnp.asarray(f)))
    jax.block_until_ready(u)
    t2 = time.perf_counter()

    print(f'solved {B} TVLQR instances (T={T}, n_state={ns}, n_ctrl={nc})')
    print(f'mean objective: {float(jnp.mean(objs)):.4f}')
    print(f'compile+solve: {t1 - t0:.2f}s, cached solve: {(t2 - t1) * 1e3:.1f}ms')


if __name__ == '__main__':
    main()
