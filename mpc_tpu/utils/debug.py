"""Numerical debugging helpers (the TPU-native sanitizer analog).

The reference has no sanitizer story (single-threaded eager torch);
SURVEY.md section 5 plans NaN debugging via JAX's machinery instead.
Three layers, from cheapest to most invasive:

  * ``finite_mask(sol)`` - jittable per-example finiteness diagnostic
    (composes with the per-example convergence masks);
  * ``assert_finite(tree)`` - host-side check of any pytree, raising
    with the offending leaf paths;
  * ``nan_checks()`` - context manager enabling ``jax_debug_nans``,
    which re-runs the offending primitive un-jitted and points at it
    (the jit-compatible analog of torch.autograd.set_detect_anomaly).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def finite_mask(solution):
    """[B] bool: True where every field of the per-example Solution is
    finite.  Jittable; combine with ``solution.converged`` to gate
    downstream consumers of a batched solve."""
    masks = []
    for name, leaf in zip(solution._fields, solution):
        # iter_stats is NaN-padded by design (verbose history), not a
        # numerical-health signal
        if leaf is None or name == 'iter_stats' or not jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            continue
        a = jnp.asarray(leaf)
        # batch axis: 1 for time-major [T, B, ...] fields, else 0
        ax = 1 if a.ndim >= 2 and name in ('x', 'u') else 0
        reduce_axes = tuple(i for i in range(a.ndim) if i != ax)
        masks.append(jnp.all(jnp.isfinite(a), axis=reduce_axes))
    return jnp.all(jnp.stack(masks, 0), axis=0)


def assert_finite(tree, name='value'):
    """Host-side finiteness check of any pytree; raises FloatingPointError
    naming the offending leaves."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = jnp.asarray(leaf)
        if jnp.issubdtype(a.dtype, jnp.floating) and \
                not bool(jnp.all(jnp.isfinite(a))):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            f'{name} contains non-finite values at: {", ".join(bad)}')
    return tree


@contextlib.contextmanager
def nan_checks(enabled: bool = True):
    """Enable ``jax_debug_nans`` for the enclosed computation: any NaN
    produced under jit de-optimizes and re-raises at the producing
    primitive.  Expensive - use to localize a failure, not in
    production loops."""
    prev = jax.config.jax_debug_nans
    jax.config.update('jax_debug_nans', enabled)
    try:
        yield
    finally:
        jax.config.update('jax_debug_nans', prev)
