#!/usr/bin/env python
"""Data-parallel imitation learning over a device mesh, with
checkpointing.

Learns the quadratic cost that makes the MPC controller imitate expert
pendulum swing-up controls, by backpropagating through the
controller's KKT fixed point (the differentiable-MPC objective of
Amos et al.; mirrors the reference's backward tests,
/root/reference/tests/test_mpc.py:560-649, scaled out).

The scenario batch is sharded over ALL local devices with
``learning.make_sharded_train_step``: each device solves its local
shard through the fused TPU kernels (forward iLQR + KKT backward), and
ONE pmean reduces the gradient - the only collective. On a multi-host
pod, initialize ``mpc_tpu.parallel.distributed`` first and pass its
(hosts, chips) mesh instead.

Run (any device count; CPU works via
XLA_FLAGS=--xla_force_host_platform_device_count=8):
    python examples/pod_imitation.py --steps 30
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--horizon', type=int, default=15)
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--checkpoint', default=None,
                    help='directory to save the final TrainState')
    ap.add_argument('--resume', default=None,
                    help='checkpoint directory to resume from')
    ap.add_argument('--platform', default=None,
                    help='pin the jax backend (e.g. cpu for the '
                         'virtual 8-device mesh; this rig\'s '
                         'sitecustomize overrides env JAX_PLATFORMS, '
                         'so pin through jax.config)')
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpc_tpu import GradMethods, MPCConfig, QuadCost
    from mpc_tpu.learning import (TrainState, batched_solve,
                                  make_sharded_train_step)
    from mpc_tpu.models import PendulumDx
    from mpc_tpu.parallel import make_mesh
    from mpc_tpu.utils import load_checkpoint, save_checkpoint

    B, T = args.batch, args.horizon
    mesh = make_mesh()
    n_dev = mesh.devices.size
    B -= B % n_dev                       # even shards
    print(f'devices: {n_dev}, global batch: {B}, horizon: {T}')

    dtype = jnp.float32
    dx = PendulumDx()
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1),
                     dtype)

    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=5,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    linesearch_decay=0.2, max_linesearch_iter=3)

    # expert: the TRUE cost (the objective the learner must recover)
    q, p = dx.get_true_obj()
    true_cost = QuadCost(jnp.diag(q).astype(dtype),
                         jnp.asarray(p, dtype))
    expert = batched_solve(cfg, x0, true_cost, dx,
                           u_lower=-2.0, u_upper=2.0)
    u_expert = jax.lax.stop_gradient(expert.u)

    # learner: diagonal cost, wrong init
    theta0 = {'q_log': jnp.log(jnp.asarray(q, dtype) * 0.2 + 0.3),
              'p': jnp.zeros_like(jnp.asarray(p, dtype))}

    def make_cost(theta):
        # batch-shared layout: local-shard-size agnostic under
        # shard_map, and rides the fused kernel's SMEM fast path
        return QuadCost(jnp.diag(jnp.exp(theta['q_log'])), theta['p'])

    opt = optax.adam(5e-2)
    train_step = make_sharded_train_step(cfg, mesh, opt, make_cost,
                                         lambda t: dx,
                                         u_lower=-2.0, u_upper=2.0)

    state = TrainState(theta0, opt.init(theta0), jnp.asarray(0))
    if args.resume:
        state = load_checkpoint(args.resume, state)
        print(f'resumed from {args.resume} at step {int(state.step)}')

    # shard the batch over the mesh; parameters replicate
    bspec = NamedSharding(mesh, P(None, mesh.axis_names))
    xspec = NamedSharding(mesh, P(mesh.axis_names))
    x0 = jax.device_put(x0, xspec)
    u_expert = jax.device_put(u_expert, bspec)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    with mesh:
        for i in range(args.steps):
            state, loss = train_step(state, x0, u_expert)
            if i % 5 == 0 or i == args.steps - 1:
                print(f'step {int(state.step):4d}  loss {float(loss):.6f}')

    if args.checkpoint:
        out = save_checkpoint(args.checkpoint, jax.device_get(state))
        print(f'saved TrainState to {out}')


if __name__ == '__main__':
    main()
