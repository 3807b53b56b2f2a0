"""Training-state checkpointing (orbax-backed).

The reference has no checkpoint subsystem; its role is played by
warm-start mechanisms (SURVEY.md section 5, "Checkpoint / resume"),
which this framework reproduces (``u_init`` / ``prev_ctrl`` / pnqp
warm starts).  What the reference does NOT have is a training loop;
this framework does (``learning.TrainState`` + the train-step
factories), so long-running imitation / sysid runs need durable
parameter + optimizer-state snapshots.  SURVEY section 5 names orbax
as the plan for exactly this.

Any pytree works (TrainState is a NamedTuple of pytrees).  Restore
passes the abstract structure of ``like`` so dtypes/shapes and the
tree layout round-trip exactly; sharded arrays restore with their
shardings when a mesh context matches.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> str:
    """Write ``state`` (any pytree, e.g. ``learning.TrainState``) to
    ``path`` (a directory; created if needed).  Returns the absolute
    path.  ``force=True`` overwrites an existing checkpoint."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)
    return path


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by ``save_checkpoint``.

    ``like`` is a template pytree (e.g. a freshly-built TrainState)
    whose structure/dtypes/shapes the restore must match; without it
    the checkpoint restores as nested dicts of arrays."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, abstract)
