"""Multi-host (multi-process) scale-out.

The reference is strictly single-device (no torch.distributed anywhere -
SURVEY.md section 2.3); the TPU-native multi-host story is the north
star's: initialize the JAX distributed runtime, build a (hosts, chips)
mesh whose host axis rides DCN and chip axis rides ICI, shard the
scenario batch over *all* devices, and let XLA insert the only
collectives the workload needs (loss/gradient reductions in training
loops).  The solver itself stays embarrassingly parallel per scenario.

Works on real pods (one process per host) and in multi-process CPU mode
for hardware-free testing (tests/test_multiprocess.py runs 2 processes
x 2 virtual CPU devices through this module).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kw) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    Thin wrapper over ``jax.distributed.initialize`` that also accepts
    the standard environment variables (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) so pod launchers can
    configure processes without code changes.  On Cloud TPU pods with
    one process per host, calling this with no arguments autodetects
    everything.
    """
    # idempotence check that must NOT touch the XLA backend
    # (jax.process_count() would initialize it)
    from jax._src import distributed as _dist_state
    if _dist_state.global_state.client is not None:
        return
    coordinator_address = coordinator_address or \
        os.environ.get('JAX_COORDINATOR_ADDRESS')
    if num_processes is None and 'JAX_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and 'JAX_PROCESS_ID' in os.environ:
        process_id = int(os.environ['JAX_PROCESS_ID'])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id, **kw)


def make_pod_mesh(axis_names: Sequence[str] = ('hosts', 'chips'),
                  devices=None) -> Mesh:
    """A (hosts, chips) mesh over all devices of all processes.

    The host axis maps across processes (DCN); the chip axis maps across
    each process's local devices (ICI).  For the MPC workload the batch
    is sharded over BOTH axes - see ``pod_batch_spec`` - so scenario
    solves never communicate; only training-loss reductions cross DCN.
    """
    if devices is None:
        devices = jax.devices()
    n_proc = max(d.process_index for d in devices) + 1
    per_host = [d for d in devices if d.process_index == 0]
    n_local = len(per_host)
    assert len(devices) == n_proc * n_local, (
        'uneven device counts per process are not supported')
    grid = np.empty((n_proc, n_local), dtype=object)
    # stable fill: sort within each process by device id
    by_proc = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    for p, ds in by_proc.items():
        ds = sorted(ds, key=lambda d: d.id)
        for i, d in enumerate(ds):
            grid[p][i] = d
    return Mesh(grid, tuple(axis_names))


def pod_batch_spec(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Sharding that splits a batch axis over every mesh axis (hosts x
    chips): the pure data-parallel layout of BASELINE config 5."""
    parts = [None] * (batch_axis + 1)
    parts[batch_axis] = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(*parts))


def shard_global_batch(tree, mesh: Mesh, batch_axis_by_rank=None):
    """Build GLOBAL arrays for a pytree of per-process local batch
    shards (batch sharded over all mesh axes, everything else
    replicated).  Each process passes its own slice of the batch; the
    result is addressable-shard-backed global jax.Arrays usable inside
    jit under the mesh.

    Default batch axis: 1 for rank >= 3 (time-major [T, B, ...]), else 0
    - override per rank via ``batch_axis_by_rank``.
    """
    axes = tuple(mesh.axis_names)

    def one(a):
        a = np.asarray(a)
        if batch_axis_by_rank is not None and a.ndim in batch_axis_by_rank:
            ax = batch_axis_by_rank[a.ndim]
        else:
            ax = 1 if a.ndim >= 3 else 0
        parts = [None] * a.ndim
        parts[ax] = axes
        sharding = NamedSharding(mesh, P(*parts))
        return jax.make_array_from_process_local_data(sharding, a)

    return jax.tree_util.tree_map(one, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. learnable parameters) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)), tree)
