"""AOT export: serialize compiled solver programs for Python-less serving.

The reference's deployment story is "run the Python module" — it has no
serving or artifact subsystem at all (SURVEY.md §5).  On TPU the natural
deployment unit is an ahead-of-time-lowered XLA program: ``jax.export``
turns the traced solver into a self-contained, versioned StableHLO
artifact.  The fused Pallas kernels ride along as ``tpu_custom_call``
payloads — a target on jax.export's guaranteed-stable serialization
list — so one byte string captures the exact controller (outer iLQR
loop, in-kernel PNQP, line search, warm-start protocol) that was
validated, independent of the Python solver stack that produced it.
Any PJRT runtime can load it: this process later, a different host, or
C++ serving via the PJRT C API.

Three layers:

``export_fn`` / ``load_fn``
    Generic: export any jittable callable at example (or symbolic)
    arguments; load the artifact back into a compiled callable.

``export_solve``
    The canonical batched MPC solve as a serving artifact with runtime
    inputs ``(x_init, C, c[, F, f][, u_lower, u_upper][, u_init])``
    (``F``/``f`` when dynamics is a LinDx) and outputs
    ``(x, u, costs)`` — the reference's return triple (mpc/mpc.py:337).

``export_closed_loop``
    The fully on-device receding-horizon rollout (closed_loop.py) as a
    single artifact: ``x_init -> {'xs', 'us', 'costs'}``.

Batch-polymorphic export (one artifact serving every batch size) is
supported for the jnp path via jax.export symbolic shapes
(``polymorphic_batch=True``).  The fused Pallas path specializes its
grid to the batch tile count, so polymorphic export forces
``use_fused='never'``; export one artifact per served batch size to
keep the kernel path.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..types import MPCConfig, QuadCost


def export_fn(fn, *example_args, platforms: Optional[Sequence[str]] = None,
              **example_kwargs) -> bytes:
    """Serialize ``fn`` traced at the given example arguments.

    ``example_args`` may be concrete arrays or ``jax.ShapeDtypeStruct``
    specs (symbolic shapes included).  ``platforms`` defaults to the
    current backend; pass e.g. ``['tpu', 'cpu']`` for a multi-platform
    artifact.  Returns the serialized artifact bytes.
    """
    exported = jax.export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms is not None else None,
    )(*example_args, **example_kwargs)
    return bytes(exported.serialize())


def load_fn(data: bytes):
    """Load an artifact produced by :func:`export_fn` into a compiled
    callable.  The returned function executes the serialized program
    (jitted, so repeat calls hit the executable cache); the Python code
    that exported it is not needed."""
    exported = jax.export.deserialize(bytearray(data))
    return jax.jit(exported.call)


def _sym_batch(shape, axis, b):
    """Replace ``axis`` of a concrete shape with the symbolic dim."""
    s = list(shape)
    s[axis] = b
    return tuple(s)


def _dispatch_for_platforms(cfg: MPCConfig, platforms, cost, dynamics,
                            u_lower, dtype, n_batch) -> MPCConfig:
    """Pin the fused-vs-jnp dispatch to the EXPORT TARGET platforms.

    The runtime dispatch in ``learning.batched_solve`` keys on the
    trace-time backend (``jax.default_backend() == 'tpu'``), which is
    the wrong question at export time: an artifact built on a CPU host
    for ``platforms=['tpu']`` would silently bake the jnp path into the
    TPU program, and an artifact built on a TPU host for a platform
    list that includes ``cpu`` would trace the Pallas ``tpu_custom_call``
    into a program the CPU lowering cannot run.  Decide from
    ``platforms`` instead (Mosaic lowering does not need a physical TPU,
    so tpu-only artifacts keep the kernel from any host).
    """
    from ..ops import fused

    plats = ([str(p).lower() for p in platforms] if platforms is not None
             else [jax.default_backend()])
    if any(p != 'tpu' for p in plats):
        if cfg.use_fused == 'always':
            raise ValueError(
                "use_fused='always' but platforms includes a non-tpu "
                f"backend ({plats}): the Pallas kernel only lowers for "
                "tpu — export a tpu-only artifact to keep the kernel")
        if 'tpu' in plats and cfg.use_fused == 'auto':
            warnings.warn(
                'multi-platform artifact: the fused kernel is disabled '
                'so every listed platform can run it; the tpu lowering '
                'executes the jnp path (export platforms=["tpu"] '
                'separately to keep the kernel)', stacklevel=3)
        return dataclasses.replace(cfg, use_fused='never')
    # tpu-only artifact: keep the kernel even when the exporting host's
    # backend is not TPU (where batched_solve's on_tpu check would lose)
    if cfg.use_fused == 'auto' and jax.default_backend() != 'tpu':
        cfg1 = dataclasses.replace(cfg, backprop=False)
        if fused.supports(cfg1, cost, dynamics, u_lower=u_lower,
                          dtype=dtype, n_batch=n_batch):
            return dataclasses.replace(cfg, use_fused='always')
    return cfg


def _pad_to_batch(a, axis, b_max):
    """Pad a symbolically-batched array to the static ``b_max`` along
    ``axis``, filling with example 0 (a well-conditioned problem, like
    the fused kernel's own edge padding of partial tiles) and writing
    the real examples over it."""
    first = jax.lax.dynamic_slice_in_dim(a, 0, 1, axis)
    base = jnp.broadcast_to(
        first, a.shape[:axis] + (b_max,) + a.shape[axis + 1:])
    return jax.lax.dynamic_update_slice(base, a, (0,) * a.ndim)


def export_solve(cfg: MPCConfig, dynamics, cost: QuadCost, x_init,
                 u_lower=None, u_upper=None, u_init=None,
                 polymorphic_batch: bool = False,
                 max_batch: Optional[int] = None,
                 platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export the batched MPC solve as a serving artifact.

    ``cost``/``x_init``/bounds/``u_init`` are EXAMPLES fixing the
    runtime-input shapes, dtypes, and layouts (batch-shared vs batched
    cost, scalar vs array bounds); ``cfg`` is baked into the program.
    The artifact's callable takes, in order, the arguments that were
    given as arrays — always ``(x_init, C, c)``, then ``(F[, f])`` if
    ``dynamics`` is a :class:`LinDx` (fresh linearizations per request,
    the TVLQR serving shape), then ``(u_lower, u_upper)`` if array
    bounds were given, then ``u_init`` if given — and returns
    ``(x, u, costs)``, the reference's triple (mpc/mpc.py:337).

    Callable (nonlinear) dynamics are baked into the program — their
    parameters are compile-time constants, so re-export after training.
    Scalar (python float) bounds are baked as constants, matching the
    reference's scalar-bounds broadcast (mpc/mpc.py:127-130).

    With ``polymorphic_batch=True`` the batch axis is exported
    symbolically: one artifact serves any batch size, on the jnp path
    (the fused kernel's grid is batch-specialized, so it is disabled).

    With ``polymorphic_batch=True, max_batch=N`` the artifact KEEPS the
    fused kernel: the program pads any runtime batch b <= N to the
    static N (filling with copies of example 0, matching the kernel's
    own edge padding of partial tiles), solves at the fixed grid, and
    slices the outputs back to b — one kernel artifact serves variable
    load (round-3 VERDICT weak #5).  Throughput is that of the N-batch
    solve regardless of b, so pick N near the expected peak load.
    """
    from ..learning import batched_solve
    from ..types import LinDx

    x_init = jnp.asarray(x_init)
    C, c = jnp.asarray(cost.C), jnp.asarray(cost.c)
    is_lindx = isinstance(dynamics, LinDx)
    has_f = is_lindx and dynamics.f is not None

    if (u_lower is None) != (u_upper is None):
        # one-sided bounds silently clamp against 0.0 downstream
        # (ops/lqr.py substitutes zeros); match the MPC guard
        # (mpc.py: assert (u_lower is None) == (u_upper is None))
        raise ValueError('u_lower and u_upper must both be given or '
                         'both be None (the reference has no one-sided '
                         'box, mpc/mpc.py:127-130)')

    if polymorphic_batch and max_batch is None:
        cfg = dataclasses.replace(cfg, use_fused='never')
    else:
        cfg = _dispatch_for_platforms(
            cfg, platforms, QuadCost(C, c),
            LinDx(jnp.asarray(dynamics.F),
                  jnp.asarray(dynamics.f) if has_f else None)
            if is_lindx else dynamics,
            u_lower, x_init.dtype,
            max_batch if polymorphic_batch else x_init.shape[0])

    def _is_array_bound(b):
        return b is not None and hasattr(b, 'shape') and jnp.ndim(b) > 0

    array_bounds = _is_array_bound(u_lower)
    if array_bounds != _is_array_bound(u_upper):
        raise ValueError(
            'u_lower and u_upper must both be arrays (runtime inputs) '
            'or both be scalars/None (baked constants); got '
            f'{type(u_lower).__name__} / {type(u_upper).__name__}')
    sig = ['x_init', 'C', 'c']
    if is_lindx:
        sig.append('F')
        if has_f:
            sig.append('f')
    if array_bounds:
        sig += ['u_lower', 'u_upper']
    if u_init is not None:
        sig.append('u_init')

    def fn(*args):
        kw = dict(zip(sig, args))
        dyn = LinDx(kw['F'], kw.get('f')) if is_lindx else dynamics
        sol = batched_solve(cfg, kw['x_init'],
                            QuadCost(kw['C'], kw['c']), dyn,
                            u_init=kw.get('u_init'),
                            u_lower=kw.get('u_lower', u_lower),
                            u_upper=kw.get('u_upper', u_upper))
        return sol.x, sol.u, sol.costs

    ex = {'x_init': x_init, 'C': C, 'c': c}
    if is_lindx:
        ex['F'] = jnp.asarray(dynamics.F)
        if has_f:
            ex['f'] = jnp.asarray(dynamics.f)
    if array_bounds:
        ex['u_lower'] = jnp.asarray(u_lower)
        ex['u_upper'] = jnp.asarray(u_upper)
    if u_init is not None:
        ex['u_init'] = jnp.asarray(u_init)

    if polymorphic_batch:
        if max_batch is not None:
            b, = jax.export.symbolic_shape(
                'b', constraints=[f'b <= {int(max_batch)}'])
        else:
            b, = jax.export.symbolic_shape('b')
        # batch axes: x_init[B, ns]; batched-layout cost/dynamics/
        # bounds/u_init carry the batch on axis 1 ([T, B, ...],
        # reference layout mpc/mpc.py:185-186); batch-shared leaves
        # have one fewer dim, no batch axis, and stay concrete.
        ndim_batched = {'x_init': 2, 'C': 4, 'c': 3, 'F': 4, 'f': 3,
                        'u_lower': 3, 'u_upper': 3, 'u_init': 3}
        batch_axis = {name: (0 if name == 'x_init' else 1)
                      if ex[name].ndim == ndim_batched[name] else None
                      for name in sig}
        specs = []
        for name in sig:
            a = ex[name]
            if batch_axis[name] is not None:
                specs.append(jax.ShapeDtypeStruct(
                    _sym_batch(a.shape, batch_axis[name], b), a.dtype))
            else:
                specs.append(jax.ShapeDtypeStruct(a.shape, a.dtype))
        if max_batch is None:
            return export_fn(fn, *specs, platforms=platforms)

        bmax = int(max_batch)

        def fn_padded(*args):
            nb = args[0].shape[0]           # symbolic runtime batch
            padded = [
                _pad_to_batch(a, batch_axis[name], bmax)
                if batch_axis[name] is not None else a
                for name, a in zip(sig, args)]
            x, u, costs = fn(*padded)
            return x[:, :nb], u[:, :nb], costs[:nb]

        return export_fn(fn_padded, *specs, platforms=platforms)
    return export_fn(fn, *(ex[name] for name in sig), platforms=platforms)


def export_closed_loop(cfg: MPCConfig, cost, dynamics, x_init,
                       n_steps: int, env_dynamics=None,
                       u_lower=None, u_upper=None,
                       platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export the on-device receding-horizon rollout
    (:func:`mpc_tpu.make_closed_loop`) as one artifact:
    ``x_init -> {'xs', 'us', 'costs'}`` for a fixed ``n_steps``.
    Everything else — controller config, cost, internal model, true
    environment dynamics, bounds, the shift-left warm-start protocol —
    is baked into the program."""
    from ..closed_loop import make_closed_loop

    x_init = jnp.asarray(x_init)
    cfg = _dispatch_for_platforms(cfg, platforms, cost, dynamics, u_lower,
                                  x_init.dtype, x_init.shape[0])
    roll = make_closed_loop(cfg, cost, dynamics,
                            env_dynamics=env_dynamics,
                            u_lower=u_lower, u_upper=u_upper)
    return export_fn(lambda x0: roll(x0, n_steps), x_init,
                     platforms=platforms)
