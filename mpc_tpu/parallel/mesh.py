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


from collections import OrderedDict

_SHARDED_CACHE = OrderedDict()
_SHARDED_CACHE_MAX = 128


def _as_static_scalar(v):
    """float(v) when ``v`` is a concrete 0-d value (python number, numpy
    scalar, 0-d array); None for arrays and tracers."""
    if v is None or isinstance(v, jax.core.Tracer):
        return None
    try:
        if jnp.ndim(v) == 0:
            return float(v)
    except TypeError:
        pass
    return None


def _pytree_operands(obj):
    """(leaves, treedef) when ``obj`` is a data pytree (all leaves are
    arrays/scalars, e.g. a registered model like PendulumDx); None for
    plain callables (their own leaf), which must be closed over."""
    leaves, treedef = jax.tree_util.tree_flatten(obj)
    if any(l is obj for l in leaves):
        return None
    return [jnp.asarray(l) for l in leaves], treedef


def solve_sharded(cfg, mesh: Mesh, x_init, cost, dynamics,
                  u_init=None, u_lower=None, u_upper=None,
                  u_zero_I=None, prev_ctrl=None,
                  axis_name: str = 'batch') -> Solution:
    """Solve a sharded scenario batch on a device mesh.

    ``x_init`` is batch-major [B, n_state]; QuadCost / LinDx / bounds /
    u_init arrays are time-major [T, B, ...] (batch-shared cost arrays
    and scalar bounds are replicated).  ``u_zero_I`` is [T, n_ctrl]
    shared or [T, B, n_ctrl] batched; ``prev_ctrl`` is [n_ctrl] or
    [B, n_ctrl] - the same feature surface as ``learning.batched_solve``
    (reference knobs mpc/mpc.py:79-80,141).  The batch is sharded over
    the mesh with ``shard_map`` and each device runs the identical LOCAL
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
    # non-QuadCost / non-LinDx data pytrees (registered models with array
    # params, e.g. PendulumDx) pass their leaves as replicated operands,
    # so in-place param updates are never frozen into a cached program;
    # only plain callables are closed over (and must stay immutable)
    cost_tree = None if is_qc else _pytree_operands(cost)
    dyn_tree = None if is_lin else _pytree_operands(dynamics)
    if cost_tree is not None:
        for i, leaf in enumerate(cost_tree[0]):
            add(f'cost_leaf{i}', leaf, None)
    if dyn_tree is not None:
        for i, leaf in enumerate(dyn_tree[0]):
            add(f'dyn_leaf{i}', leaf, None)
    if u_init is not None:
        add('u_init', u_init, batch_ax(u_init, 3))
    # concrete scalar bounds (python numbers, numpy scalars, 0-d arrays)
    # become static closure constants (no per-call host->device transfer
    # - through a tunneled runtime each tiny transfer costs ~ms); array
    # bounds are operands
    lb_static = _as_static_scalar(u_lower)
    ub_static = _as_static_scalar(u_upper)
    static_bounds = lb_static is not None and ub_static is not None
    if u_lower is not None and not static_bounds:
        add('lb', u_lower, batch_ax(u_lower, 3))
        add('ub', u_upper, batch_ax(u_upper, 3))
    if u_zero_I is not None:
        add('uz', jnp.asarray(u_zero_I, bool), batch_ax(u_zero_I, 3))
    if prev_ctrl is not None:
        add('pc', prev_ctrl,
            0 if jnp.ndim(prev_ctrl) == 2 else None)

    if cost_tree is not None:
        cost_key = ('tree', cost_tree[1])
    else:
        cost_key = None if is_qc else id(cost)
    if dyn_tree is not None:
        dyn_key = ('tree', dyn_tree[1])
    else:
        dyn_key = None if is_lin else id(dynamics)
    bounds_key = (lb_static, ub_static) if static_bounds else None
    # include each operand's rank: the in_specs depend on whether an
    # operand is batched or batch-shared, so layouts must not collide
    shape_key = tuple((name, operands[i].ndim)
                      for name, i in sorted(slots.items()))
    key = (cfg, mesh, axis_name, shape_key, cost_key, dyn_key, bounds_key)
    if key in _SHARDED_CACHE:
        _SHARDED_CACHE.move_to_end(key)
        return _SHARDED_CACHE[key][0](*operands)

    n_cost_leaves = len(cost_tree[0]) if cost_tree is not None else 0
    n_dyn_leaves = len(dyn_tree[0]) if dyn_tree is not None else 0

    def local(*arrs):
        def pick(name):
            return arrs[slots[name]] if name in slots else None

        if is_qc:
            cost_l = QuadCost(pick('C'), pick('c'))
        elif cost_tree is not None:
            cost_l = jax.tree_util.tree_unflatten(
                cost_tree[1],
                [pick(f'cost_leaf{i}') for i in range(n_cost_leaves)])
        else:
            cost_l = cost
        if is_lin:
            dyn_l = LinDx(pick('F'), pick('f'))
        elif dyn_tree is not None:
            dyn_l = jax.tree_util.tree_unflatten(
                dyn_tree[1],
                [pick(f'dyn_leaf{i}') for i in range(n_dyn_leaves)])
        else:
            dyn_l = dynamics
        lb_l = lb_static if static_bounds else pick('lb')
        ub_l = ub_static if static_bounds else pick('ub')
        sol = batched_solve(
            cfg, arrs[0], cost_l, dyn_l,
            u_init=pick('u_init'),
            u_lower=lb_l, u_upper=ub_l,
            u_zero_I=pick('uz'), prev_ctrl=pick('pc'))
        # the per-iteration verbose history is a host-logging aid; it
        # has no sharded consumer and would need its own out_spec
        return sol._replace(iter_stats=None)

    out_specs = Solution(
        x=P(None, axis_name), u=P(None, axis_name),
        costs=P(axis_name), full_du_norm=P(axis_name),
        n_iter=P(axis_name), n_qp_iter=P(axis_name),
        converged=P(axis_name), alpha=P(axis_name))

    # check_vma=False: Pallas kernel outputs carry no varying-mesh-axes
    # metadata, and the local solve is per-shard independent anyway
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=tuple(specs), out_specs=out_specs,
        check_vma=False))
    # keep cost/dynamics referenced so their ids stay valid for the key;
    # bound the cache (fresh closure callables would otherwise pin
    # entries forever)
    _SHARDED_CACHE[key] = (fn, cost, dynamics)
    if len(_SHARDED_CACHE) > _SHARDED_CACHE_MAX:
        _SHARDED_CACHE.popitem(last=False)
    return fn(*operands)
