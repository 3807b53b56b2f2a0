"""Multi-chip / multi-host scale-out: mesh construction, batch-sharded
solving, and the distributed (multi-process) runtime helpers."""

from .mesh import make_mesh, shard_batch, solve_sharded
from .distributed import (initialize, make_pod_mesh, pod_batch_spec,
                          replicate, shard_global_batch)

__all__ = ['make_mesh', 'shard_batch', 'solve_sharded',
           'initialize', 'make_pod_mesh', 'pod_batch_spec',
           'shard_global_batch', 'replicate']
