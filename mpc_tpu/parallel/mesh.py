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


_SHARDED_CACHE = {}


def solve_sharded(cfg, mesh: Mesh, x_init, cost, dynamics,
                  u_init=None, u_lower=None, u_upper=None,
                  axis_name: str = 'batch') -> Solution:
    """Solve a sharded scenario batch on a device mesh.

    ``x_init`` is batch-major [B, n_state]; QuadCost / LinDx / bounds /
    u_init arrays are time-major [T, B, ...] (batch-shared cost arrays
    and scalar bounds are replicated).  The batch is sharded over the
    mesh with ``shard_map`` and each device runs the identical LOCAL
    solver - including the fused Pallas kernel when in scope - on its
    shard: embarrassingly parallel, zero collectives (SURVEY.md
    section 2.3 and BASELINE north star).

    The jitted sharded program is cached on (cfg, mesh, problem
    structure), so receding-horizon loops that call this repeatedly
    reuse the compiled executable.
    """
    from ..learning import batched_solve

    n_batch = x_init.shape[0]
    n_dev = mesh.devices.size
    assert n_batch % n_dev == 0, (
        f'batch {n_batch} must divide evenly over {n_dev} devices')

    # Every array leaf is a positional operand: batch-axis arrays get
    # sharded specs, batch-shared arrays/scalars replicate.  Only
    # callables (and None) are closed over, so the cache never freezes
    # stale data.
    operands = [jnp.asarray(x_init)]
    specs = [P(axis_name)]
    slots = {}

    def add(name, a, batch_axis):
        a = jnp.asarray(a)
        slots[name] = len(operands)
        operands.append(a)
        parts = [None] * a.ndim
        if batch_axis is not None:
            parts[batch_axis] = axis_name
        specs.append(P(*parts))

    def batch_ax(a, batched_ndim):
        return 1 if jnp.ndim(a) == batched_ndim else None

    is_qc = isinstance(cost, QuadCost)
    is_lin = isinstance(dynamics, LinDx)
    if is_qc:
        add('C', cost.C, batch_ax(cost.C, 4))
        add('c', cost.c, batch_ax(cost.c, 3))
    if is_lin:
        add('F', dynamics.F, batch_ax(dynamics.F, 4))
        if dynamics.f is not None:
            add('f', dynamics.f, batch_ax(dynamics.f, 3))
    if u_init is not None:
        add('u_init', u_init, batch_ax(u_init, 3))
    # python-number bounds become static closure constants (no per-call
    # host->device transfer - through a tunneled runtime each tiny
    # transfer costs ~ms); array bounds are operands
    static_bounds = (u_lower is not None
                     and isinstance(u_lower, (int, float))
                     and isinstance(u_upper, (int, float)))
    if u_lower is not None and not static_bounds:
        add('lb', u_lower, batch_ax(u_lower, 3))
        add('ub', u_upper, batch_ax(u_upper, 3))

    cost_key = None if is_qc else id(cost)
    dyn_key = None if is_lin else id(dynamics)
    bounds_key = (float(u_lower), float(u_upper)) if static_bounds else None
    # include each operand's rank: the in_specs depend on whether an
    # operand is batched or batch-shared, so layouts must not collide
    shape_key = tuple((name, operands[i].ndim)
                      for name, i in sorted(slots.items()))
    key = (cfg, mesh, axis_name, shape_key, cost_key, dyn_key, bounds_key)
    if key in _SHARDED_CACHE:
        return _SHARDED_CACHE[key][0](*operands)

    def local(*arrs):
        def pick(name):
            return arrs[slots[name]] if name in slots else None

        cost_l = QuadCost(pick('C'), pick('c')) if is_qc else cost
        dyn_l = LinDx(pick('F'), pick('f')) if is_lin else dynamics
        lb_l = u_lower if static_bounds else pick('lb')
        ub_l = u_upper if static_bounds else pick('ub')
        return batched_solve(
            cfg, arrs[0], cost_l, dyn_l,
            u_init=pick('u_init'),
            u_lower=lb_l, u_upper=ub_l)

    out_specs = Solution(
        x=P(None, axis_name), u=P(None, axis_name),
        costs=P(axis_name), full_du_norm=P(axis_name),
        n_iter=P(axis_name), n_qp_iter=P(axis_name),
        converged=P(axis_name), mean_alpha=P(axis_name))

    # check_vma=False: Pallas kernel outputs carry no varying-mesh-axes
    # metadata, and the local solve is per-shard independent anyway
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=tuple(specs), out_specs=out_specs,
        check_vma=False))
    # keep cost/dynamics referenced so their ids stay valid for the key
    _SHARDED_CACHE[key] = (fn, cost, dynamics)
    return fn(*operands)
