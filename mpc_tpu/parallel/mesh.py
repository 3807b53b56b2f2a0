"""Device-mesh scale-out for the MPC solver.

The reference is single-device (tensor-device polymorphism only, no
torch.distributed anywhere - SURVEY.md section 2.3).  The TPU-native
scale-out story is simple and collective-free: every MPC instance is
independent, so the scenario batch is sharded across the mesh with
``jax.sharding`` and each chip solves its shard inside one jitted
program.  Collectives appear only in training loops (loss/grad
reductions), which use a plain ``psum`` via ``shard_map`` or jit-of-grad
with sharded batches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver import solve_single
from ..types import LinDx, QuadCost, Solution


def make_mesh(devices=None, axis_name: str = 'batch') -> Mesh:
    """A 1-D mesh over all (or the given) devices; the MPC scenario batch
    is sharded along it."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, batch_axis_by_rank=None,
                axis_name: str = 'batch'):
    """Place a pytree of batched arrays on the mesh, sharding the batch
    axis.  Arrays with batch at axis 1 (time-major [T, B, ...]) get
    P(None, axis) specs; batch-major arrays get P(axis).

    ``batch_axis_by_rank``: dict rank->axis overriding the default rule
    (default: axis 1 if ndim >= 3 else axis 0)."""
    def spec_for(a):
        a = jnp.asarray(a)
        if batch_axis_by_rank is not None and a.ndim in batch_axis_by_rank:
            ax = batch_axis_by_rank[a.ndim]
        else:
            ax = 1 if a.ndim >= 3 else 0
        parts = [None] * a.ndim
        parts[ax] = axis_name
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), spec_for(a)), tree)


def solve_sharded(cfg, mesh: Mesh, x_init, cost, dynamics,
                  u_init=None, u_lower=None, u_upper=None,
                  axis_name: str = 'batch') -> Solution:
    """Solve a sharded scenario batch on a device mesh.

    ``x_init`` is batch-major [B, n_state]; QuadCost / LinDx / bounds /
    u_init arrays are time-major [T, B, ...].  The batch is sharded over
    the mesh and each device runs the identical vmapped solver on its
    shard - embarrassingly parallel, zero collectives (SURVEY.md
    section 2.3 and BASELINE north star).
    """
    n_batch = x_init.shape[0]
    n_dev = mesh.devices.size
    assert n_batch % n_dev == 0, (
        f'batch {n_batch} must divide evenly over {n_dev} devices')

    args = {'x_init': x_init, 'cost': cost, 'dynamics': dynamics,
            'u_init': u_init, 'u_lower': u_lower, 'u_upper': u_upper}
    arrays = {k: v for k, v in args.items() if v is not None and
              not callable(v) or isinstance(v, (QuadCost, LinDx))}

    sharded = {}
    for k, v in args.items():
        if v is None or (callable(v) and not isinstance(v, (QuadCost, LinDx))):
            sharded[k] = v
        else:
            sharded[k] = shard_batch(v, mesh, axis_name=axis_name)

    def one(x_init_i, cost_i, dyn_i, u_init_i, lb_i, ub_i):
        return solve_single(cfg, x_init_i, cost_i, dyn_i,
                            u_init=u_init_i, u_lower=lb_i, u_upper=ub_i)

    in_axes = (
        0,
        1 if isinstance(cost, QuadCost) else None,
        1 if isinstance(dynamics, LinDx) else None,
        1 if u_init is not None else None,
        1 if u_lower is not None else None,
        1 if u_upper is not None else None,
    )
    out_axes = Solution(x=1, u=1, costs=0, full_du_norm=0, n_iter=0,
                        n_qp_iter=0, converged=0, mean_alpha=0)
    batched = jax.vmap(one, in_axes=in_axes, out_axes=out_axes)

    with mesh:
        fn = jax.jit(batched)
        return fn(sharded['x_init'], sharded['cost'], sharded['dynamics'],
                  sharded['u_init'], sharded['u_lower'], sharded['u_upper'])
