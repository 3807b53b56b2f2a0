"""Fused single-kernel iLQR solver (Pallas, TPU).

The jnp solver (solver.py + ops/lqr.py) expresses one outer iLQR
iteration as ~10^3 small XLA ops over [B, 3..8, 3..8] tensors; on TPU
the solve is bound by per-op dispatch and HBM round-trips between those
tiny ops, not by FLOPs (each op moves KBs and does tens of FLOPs per
lane).  This module fuses the ENTIRE solve - initial rollout,
linearization, Riccati recursion, box-QP inner solver, line-searched
forward rollouts, per-example best-solution tracking and stopping -
into ONE Pallas kernel, with the scenario batch laid out on the vector
lanes:

  * a batch tile of 1024 examples is viewed as an (8, 128) VPU tile;
  * every scalar of the small per-example matrices (V, Q, K, L, ...)
    becomes one (8, 128) vector register covering the whole tile;
  * the small-dimension loops (n_state/n_ctrl <= ~8, horizon T) are
    unrolled in Python, so each kernel instruction is a full-width VPU
    op and all intermediates stay in registers/VMEM - zero HBM traffic
    between the phases of an iteration;
  * the grid runs over batch tiles.

Scope (dispatch falls back to the jnp path otherwise - see
``supports``): quadratic cost, or non-quadratic cost in
structure-of-arrays form (``soa_cost``/``soa_params``, quadratized
in-kernel each outer iteration with nested jvp - the in-kernel analog
of the reference's ``approximate_cost``, mpc/mpc.py:447-487); dynamics
either in structure-of-arrays
form (``soa_step``/``soa_params`` on the model, Jacobians extracted
in-kernel with ``jax.linearize``) or ``LinDx``; float32; horizons up to
128 (unrolled in-kernel); delta_u trust regions, ``u_zero_I`` zero-pin
masks (in-kernel masked solves) and slew-rate penalties (host-side
state augmentation, ``_fused_slew_solve``) supported.  The
box-constrained control solve is the
closed-form 1-D QP for n_ctrl == 1 (ops/pnqp.py:pnqp_1d) and an
in-kernel projected-Newton QP with masked unrolled Cholesky solves for
n_ctrl > 1 (same semantics as ops/pnqp.py: clamped-start, active-set
masking, parallel Armijo on the deterministic 0.1-decay schedule,
||dx|| < 1e-4 convergence with frozen lanes).  The unconstrained
multi-control solve uses Cholesky instead of the reference's
per-example pinverse (documented deviation, SURVEY.md section 7).

Inputs may be batched ([T, B, ...] - streamed through VMEM) or
batch-shared ([T, ...] / [...] and scalar bounds - kept in SMEM as
scalars, skipping the broadcast + relayout + streaming entirely).

Semantics match solver.solve_single with one documented deviation: the
outer loop runs per-example ("freeze converged lanes") instead of the
reference's batch-global stopping (max over examples, mpc/mpc.py:299);
with a fixed iteration budget (eps=0) the two are identical, and
otherwise per-example stopping only stops examples that already
satisfied the same criterion.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import LinDx, QuadCost, Solution

SUB, LANE = 8, 128
TILE = SUB * LANE            # batch examples per kernel program

PNQP_GAMMA = 0.1
PNQP_LS_DECAY = 0.1
PNQP_MAX_LS = 10
PNQP_CONV_TOL = 1e-4


def _is_soa(dynamics):
    return hasattr(dynamics, 'soa_step') and hasattr(dynamics, 'soa_params')


# SoA params ride SMEM as individual scalars and every use unrolls into
# kernel instructions; beyond this many scalars COMBINED across
# dynamics and cost, Mosaic compile time and register pressure outweigh
# the fusion win - dispatch falls back to jnp.  Models that implement
# the param-STREAMING protocol (``soa_stream_step``/``soa_stream_jac``,
# e.g. NNDynamics single-hidden MLPs - including the reference's
# default hidden=100, mpc/dynamics.py:9-13) escape this cap: the kernel
# reads their weights from SMEM with dynamic indices inside a
# lax.fori_loop over hidden units, so neither compile time nor register
# pressure scales with the parameter count; only SMEM capacity bounds
# them (_MAX_STREAM_PARAMS).
_MAX_SOA_PARAMS = 512
_MAX_STREAM_PARAMS = 16384

# Unrolled-instruction-volume gates.  The kernels emit lane-vector
# instructions from Python loops, and Mosaic compile time grows
# superlinearly with the emitted count.  The short kernel's trace is
# ~T * ntau^3 ops per outer iteration (Qt assembly dominates); the
# fori-loop kernel traces its horizon body ONCE, so its trace is
# ~ntau^3.  Measured on one chip (LinDx box problems, T=20,
# lqr_iter=3): ntau=4 compiles in ~28s, ntau=7 ~80s, ntau=13 exceeds
# 7 minutes on the short kernel.  Problems whose T * ntau^3 exceeds
# _UNROLL_VOLUME_LIMIT route through the fori-loop kernel; above
# _BODY_VOLUME_LIMIT (ntau > 28) even the once-traced body is too
# large and dispatch falls back to the XLA path, whose batched linalg
# handles medium-size matrices without per-scalar unrolling.  The body
# limit is hardware-calibrated: ntau=20 (16s/4c, T=20) compiles in ~18s
# and runs 10.7x the jnp path; ntau=22 (18s/4c) in ~71s at 213k
# solves/s (B=1024) and ntau=23 (19s/4c) in ~92s at 200k solves/s,
# both exactly matching the jnp path.  Round 5 (probe_ntau24 with the
# 40MB scoped stack): ntau=24 (20s/4c, was the round-3 OOM on the
# DEFAULT 16MB stack) compiles in ~20s and runs 5.7x the jnp path at
# B=1024, 8.9x at B=2050 (G=3); ntau=26 (22s/4c) ~24s, 4.8x; ntau=28
# (24s/4c) ~45s, 5.1x.  Fused-vs-jnp differences at these dims are
# ~1.6e-4 max - MUTUAL f32 iterate divergence, not kernel error: both
# paths sit equidistant (1.37e-4 vs 1.38e-4 max) from the f64 oracle.
# Past ntau=28 the VMEM gate takes over anyway (ntau=29 at T=20
# estimates ~19MB single-tile); the body gate stays as the
# compile-time backstop at the validated ntau<=28.
_UNROLL_VOLUME_LIMIT = 8_000    # T * ntau^3 budget, unrolled kernel
_BODY_VOLUME_LIMIT = 21_952    # ntau^3 budget, fori-loop kernel body (ntau<=28)


def _dyn_streams(dynamics, n_dyn_p):
    """Whether the dynamics runs the param-streaming kernel path:
    streaming form available AND big enough that the tuple unroll would
    hurt (small models keep the faster fully-unrolled path)."""
    return (getattr(dynamics, 'soa_streaming', False)
            and n_dyn_p > _UNROLL_PARAM_LIMIT)


def _soa_param_count(obj):
    """Number of SoA scalars, preferring a shape-based count
    (``soa_param_count``) over materializing ``soa_params()``.
    A custom ``soa_param_count`` MUST equal ``len(soa_params())``:
    dispatch (supports) and kernel routing (fused_batched_solve) both
    use this function, so the gates stay consistent either way, but a
    lying count mis-routes the problem."""
    try:
        n = getattr(obj, 'soa_param_count', None)
        if n is not None:
            return int(n())
        return len(obj.soa_params())
    except Exception:
        return 1 << 30


def _is_soa_cost(cost):
    """Non-quadratic cost in structure-of-arrays form: a callable
    ``cost(tau)`` (for the jnp path / phase-2 quadratization) that also
    provides ``soa_cost(xs, us, params)`` -> scalar lane vector and
    ``soa_params()`` (mirroring the dynamics SoA protocol).  The kernel
    quadratizes it in-place each outer iteration with nested ``jax.jvp``
    (the in-kernel analog of the reference's ``approximate_cost``,
    mpc/mpc.py:447-487) and evaluates the TRUE cost in the line search
    (reference mpc/lqr_step.py:230-236)."""
    return (hasattr(cost, 'soa_cost') and hasattr(cost, 'soa_params')
            and callable(cost))


def supports(cfg, cost, dynamics, u_zero_I=None, prev_ctrl=None,
             u_lower=None, dtype=jnp.float32, n_batch=None) -> bool:
    """Static dispatch check for the fused path.

    ``n_batch`` (the scenario batch size, when the caller knows it)
    tightens the fori-loop kernel's VMEM gate: batches over one
    (8, 128) tile run a multi-program grid whose blocked operands
    Mosaic double-buffers, shrinking the admissible working set (see
    ``_long_vmem_bytes``).  ``None`` assumes the multi-tile regime.
    """
    n_dyn_p = 0
    if isinstance(dynamics, LinDx):
        # F and f layouts are INDEPENDENT, like the reference's
        # per-param expandParam broadcasts (mpc/util.py:21-27): mixed
        # shared/batched pairs are normalized to batched at dispatch
        # (_normalize_mixed_layouts)
        dyn_ok = getattr(dynamics.F, 'ndim', 0) in (3, 4) and (
            dynamics.f is None
            or getattr(dynamics.f, 'ndim', 0) in (2, 3))
    else:
        dyn_ok = _is_soa(dynamics)
        if dyn_ok:
            n_dyn_p = _soa_param_count(dynamics)
    n_cost_p = (_soa_param_count(cost)
                if _is_soa_cost(cost) and not isinstance(cost, QuadCost)
                else 0)
    # the kernel unrolls dynamics + cost scalars from ONE SMEM row, so
    # the budget applies to their sum; param-streaming dynamics escape
    # the unroll budget (only cost params still unroll) and are bounded
    # by SMEM capacity instead
    if _dyn_streams(dynamics, n_dyn_p):
        if n_dyn_p > _MAX_STREAM_PARAMS or n_cost_p > _MAX_SOA_PARAMS:
            return False
    elif n_dyn_p + n_cost_p > _MAX_SOA_PARAMS:
        return False
    # the fori-loop kernel runs for T > 128, param-heavy SoA models, or
    # compile-volume-heavy state dims (see fused_batched_solve); its
    # VMEM gate applies in all cases
    ns_eff = cfg.n_state + (cfg.n_ctrl if cfg.slew_rate_penalty
                            is not None else 0)
    ntau = ns_eff + cfg.n_ctrl
    if ntau ** 3 > _BODY_VOLUME_LIMIT:
        return False
    multi = n_batch is None or n_batch > SUB * LANE
    long_kernel = _routes_long(
        cfg.T, ns_eff, cfg.n_ctrl, n_dyn_p + n_cost_p, multi,
        _layout_flags(cfg, cost, dynamics, u_lower, u_zero_I))
    return (
        # slew runs through the host-side state augmentation (see
        # fused_batched_solve); non-quadratic costs are out of scope
        # anyway, so any in-scope problem can be augmented
        # delta_u requires bounds, like the reference (mpc/lqr_step.py:195)
        (cfg.delta_u is None or u_lower is not None)
        # u_zero_I: [T, n_ctrl] shared or [T, B, n_ctrl] batched masks
        and (u_zero_I is None or getattr(u_zero_I, 'ndim', 0) in (2, 3))
        and (prev_ctrl is None or getattr(prev_ctrl, 'ndim', 1) in (1, 2))
        and not cfg.backprop
        and cfg.verbose <= 0
        and (
            (isinstance(cost, QuadCost)
             # batched [T, B, ...] (VMEM) or batch-shared [T, ...]/[...]
             # (SMEM); C and c layouts are independent like the
             # reference's per-param broadcasts (mpc/mpc.py:205-226) -
             # a mixed pair (e.g. shared weights C + per-example goal
             # vectors c) is normalized to batched at dispatch
             and getattr(cost.C, 'ndim', 0) in (2, 3, 4)
             and getattr(cost.c, 'ndim', 0) in (1, 2, 3))
            # non-quadratic SoA cost: quadratized in-kernel each outer
            # iteration; slew + non-quadratic cost is an error upstream
            # (reference mpc/mpc.py:451-457)
            or (_is_soa_cost(cost) and not isinstance(cost, QuadCost)
                and cfg.slew_rate_penalty is None))
        and dyn_ok
        and dtype == jnp.float32
        # the fori-loop kernel (_make_kernel_long) is bounded by the
        # VMEM budget; beyond that the jnp path handles it
        and (not long_kernel or _long_fits(cfg, cost, dynamics, u_lower,
                                           u_zero_I, n_batch=n_batch))
    )


def _short_blocked_vmem_bytes(T, ns, nc, *, cost_smem, dyn_smem,
                              bounds_smem, uz_smem, has_uz, has_bounds,
                              has_f, lindx, multi_tile=True,
                              c_batched=False):
    """Scoped-VMEM footprint (bytes) of the UNROLLED kernel's blocked
    operands.  Unlike the fori-loop kernel, the short kernel takes
    batched per-t operands (C, c, F, f, bounds, u_zero_I) as
    grid-blocked VMEM inputs, whose per-program block buffers land on
    the same Mosaic 16MB scoped stack as the outputs - and are
    double-buffered when the grid has more than one program.  Observed
    cliff: batched (C, c, F, f) at T=125 ns=3/nc=1 (inside the
    unroll-volume budget) lowers to a 39.01M scoped allocation at
    B=2048 and fails.  Problems past this budget route to the
    fori-loop kernel, which streams batched operands from HBM through
    constant-size buffers instead.
    """
    ntau = ns + nc
    blocked = ns + T * nc + T * ns + T * nc + 5   # x0, u0, xs, us, stats
    if not cost_smem:
        blocked += T * (ntau * ntau + ntau)
    elif c_batched:
        # split layout: C on SMEM, per-example c blocked in VMEM
        blocked += T * ntau
    if lindx and not dyn_smem:
        blocked += (T - 1) * ns * ntau + ((T - 1) * ns if has_f else 0)
    if has_bounds and not bounds_smem:
        blocked += 2 * T * nc
    if has_uz and not uz_smem:
        blocked += T * nc
    if multi_tile:
        blocked *= 2
    # live registers of the unrolled Riccati body (same working set as
    # the fori-loop body)
    const = ns * ns + ntau * ntau + 2 * nc * nc + 4 * ntau
    return (blocked + const) * SUB * LANE * 4


def _short_fits(T, ns, nc, multi_tile, **layout) -> bool:
    """Whether the unrolled kernel's blocked operands fit the scoped
    stack; past this the problem routes to the streaming fori-loop
    kernel (same limits as ``_long_fits``)."""
    return _short_blocked_vmem_bytes(
        T, ns, nc, multi_tile=multi_tile, **layout) <= (
            _LONG_T_VMEM_LIMIT_MULTI if multi_tile else _LONG_T_VMEM_LIMIT)


def _routes_long(T, ns_eff, nc, route_count, multi, layout) -> bool:
    """THE short-vs-long routing predicate, shared by supports(), the
    dispatch in fused_batched_solve, and _split_routes_short so the
    three can never drift (a split operand set reaching the fori-loop
    kernel would mis-read c's rank).  ``route_count`` is the unrolled
    SMEM-scalar param count (SoA dynamics + SoA cost params)."""
    ntau = ns_eff + nc
    return (T > 128
            or route_count > _UNROLL_PARAM_LIMIT
            or T * ntau ** 3 > _UNROLL_VOLUME_LIMIT
            # batched per-t operands past the unrolled kernel's
            # blocked-VMEM budget stream through the fori-loop kernel
            # instead (see _short_blocked_vmem_bytes)
            or not _short_fits(T, ns_eff, nc, multi, **layout))


def _layout_flags(cfg, cost, dynamics, u_lower, u_zero_I):
    """SMEM-vs-batched layout booleans shared by the dispatch gates
    (mirrors fused_batched_solve's operand preparation).

    A MIXED QuadCost with shared C and per-example c (the reference's
    independent expandParam broadcasts, mpc/util.py:21-27 - e.g.
    shared weights + per-example goal vectors) runs the short kernel in
    a SPLIT layout: C stays on SMEM (keeping the literal-zero folding
    and skipping the [T, B, ntau, ntau] broadcast entirely) while c is
    a blocked VMEM operand (``c_batched=True``).  When the problem
    routes to the fori-loop kernel instead (T, volume, params, or the
    blocked-VMEM budget), the pair resolves to fully batched -
    _normalize_mixed_layouts broadcasts C - so the long-kernel gates
    here stay accurate.
    """
    lindx = isinstance(dynamics, LinDx)
    is_qc = isinstance(cost, QuadCost)
    C_shared = not is_qc or getattr(cost.C, 'ndim', 0) < 4
    c_shared = not is_qc or getattr(cost.c, 'ndim', 0) < 3
    flags = dict(
        cost_smem=C_shared and c_shared,
        c_batched=False,
        dyn_smem=(lindx and getattr(dynamics.F, 'ndim', 0) == 3
                  and (dynamics.f is None
                       or getattr(dynamics.f, 'ndim', 0) == 2)),
        bounds_smem=u_lower is None or jnp.ndim(u_lower) < 3,
        uz_smem=u_zero_I is None or getattr(u_zero_I, 'ndim', 0) < 3,
        has_uz=u_zero_I is not None,
        has_bounds=u_lower is not None,
        has_f=lindx and dynamics.f is not None,
        lindx=lindx)
    if is_qc and C_shared and not c_shared:
        split = dict(flags, cost_smem=True, c_batched=True)
        if _split_routes_short(cfg, dynamics, split):
            flags = split
    return flags


def _split_routes_short(cfg, dynamics, split_flags):
    """Whether a split-layout (shared-C / batched-c) problem is certain
    to run the UNROLLED kernel - the shared `_routes_long` predicate,
    conservatively in the multi-tile VMEM regime so a kept split always
    fits the actual grid.  Streaming / param-heavy SoA dynamics route
    long, so they disqualify the split; so does a slew-rate penalty
    (the host-side augmentation in _fused_slew_solve builds the
    augmented cost from a layout-matched pair - the recursive solve
    re-resolves the augmented cost's own layout, so ns here is always
    the plain n_state)."""
    if cfg.slew_rate_penalty is not None:
        return False
    n_dyn_p = 0
    if not isinstance(dynamics, LinDx) and _is_soa(dynamics):
        n_dyn_p = _soa_param_count(dynamics)
        if _dyn_streams(dynamics, n_dyn_p):
            return False
    return not _routes_long(cfg.T, cfg.n_state, cfg.n_ctrl, n_dyn_p,
                            True, split_flags)


def _long_fits(cfg, cost, dynamics, u_lower, u_zero_I,
               n_batch=None) -> bool:
    """Whether the long-horizon kernel's VMEM working set fits.

    ``n_batch`` picks the grid regime: one (8, 128) tile (G=1) or
    multiple grid programs, whose blocked operands Mosaic
    double-buffers (see ``_long_vmem_bytes``).  ``None`` (batch size
    unknown to the caller) conservatively assumes multi-tile.
    """
    ns, nc = cfg.n_state, cfg.n_ctrl
    if cfg.slew_rate_penalty is not None:
        ns += nc           # host-side augmentation enlarges the state
    multi = n_batch is None or n_batch > SUB * LANE
    return _long_vmem_bytes(
        cfg.T, ns, nc, multi_tile=multi,
        **_layout_flags(cfg, cost, dynamics, u_lower, u_zero_I)) <= (
            _LONG_T_VMEM_LIMIT_MULTI if multi else _LONG_T_VMEM_LIMIT)


# ---------------------------------------------------------------------------
# small-matrix helpers over nested lists of (8, 128) vector registers
# ---------------------------------------------------------------------------

def _mat(n, m):
    return [[None] * m for _ in range(n)]


# Literal-zero folding: when the batch-shared quadratic cost is a
# concrete array at trace time (the common closure-constant case - e.g.
# a diagonal goal-weight C), its zero entries are baked into the
# unrolled kernel as Python 0.0 literals and these helpers DROP the
# corresponding products/adds from the emitted code instead of issuing
# vector ops that multiply by zero (Mosaic does not fold them).  Every
# helper is an exact no-op on traced operands, and skipping a
# `+ 0.0 * x` term is exact for finite x; the only observable drift is
# ulp-scale, from the backend contracting the REMAINING chain into
# different fused multiply-adds (measured 2.4e-7 on XLA:CPU interpret;
# bitwise-equal on the TPU Mosaic path in the round-5 hardware A/B,
# which also measured the win: 12.96 -> 14.70M headline solves/s).

def _is_lit0(v):
    return isinstance(v, (int, float)) and v == 0.0


def _const_zero_pattern(a, shape):
    """Zero pattern of a trace-time-CONCRETE array broadcast to
    ``shape``, or None when the value is a tracer (jit argument /
    learned parameter) or has no zeros.  The f32 cast matches the
    kernel's operand dtype so the pattern agrees with the SMEM values
    the kernel would otherwise load."""
    if a is None or isinstance(a, jax.core.Tracer):
        return None
    try:
        # device arrays transfer to host here (16-64 floats); folding is
        # an optimization, so any transfer failure just disables it
        arr = np.asarray(a, np.float32)
    except Exception:
        return None
    # broadcast_to returns a read-only view (and ascontiguousarray is a
    # no-op when the input already has the full shape); callers edit the
    # pattern in place, so always materialize a writable copy
    pat = np.array(np.broadcast_to(arr == 0.0, shape))
    return pat if pat.any() else None


def _addz(a, b):
    if _is_lit0(a):
        return b
    if _is_lit0(b):
        return a
    return a + b


def _mulz(a, b):
    if _is_lit0(a) or _is_lit0(b):
        return 0.0
    if isinstance(a, float) and a == 1.0:
        return b
    if isinstance(b, float) and b == 1.0:
        return a
    return a * b


def _subz(a, b):
    if _is_lit0(b):
        return a
    if _is_lit0(a):
        return -b
    return a - b


def _nmulz(a, b):
    """-a * b with literal-zero folding."""
    if _is_lit0(a) or _is_lit0(b):
        return 0.0
    return -a * b


def _dotz(coeffs, xs):
    """sum_j coeffs[j] * xs[j], dropping literal-zero terms."""
    acc = 0.0
    for cf, xv in zip(coeffs, xs):
        acc = _addz(acc, _mulz(cf, xv))
    return acc


def _quad_lin_cost(Ct, ct, tau):
    """0.5 tau^T C tau + c^T tau for one t (lists of lane-vectors)."""
    n = len(tau)
    acc = 0.0
    for i in range(n):
        s = _dotz(Ct[i], tau)
        term = _addz(_mulz(0.5, s), ct[i])
        acc = _addz(acc, _mulz(term, tau[i]))
    return acc


def _cholesky(A, n, jitter=0.0):
    """Unrolled lane-wise Cholesky of an SPD n x n (lists of vectors).
    The upper triangle is filled with zeros so the factor is a complete
    pytree (it rides a fori_loop carry in the in-kernel PNQP)."""
    L = _mat(n, n)
    z = A[0][0] * 0.0
    for i in range(n):
        for j in range(i + 1, n):
            L[i][j] = z
    for j in range(n):
        s = A[j][j] + jitter
        for k in range(j):
            s = _subz(s, _mulz(L[j][k], L[j][k]))
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s2 = A[i][j]
            for k in range(j):
                s2 = _subz(s2, _mulz(L[i][k], L[j][k]))
            L[i][j] = _mulz(s2, inv)
    return L


def _chol_solve(L, b, n):
    """Solve (L L^T) x = b with the unrolled factor."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = _subz(s, _mulz(L[i][k], y[k]))
        y[i] = 0.0 if _is_lit0(s) else s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = _subz(s, _mulz(L[k][i], x[k]))
        x[i] = 0.0 if _is_lit0(s) else s / L[i][i]
    return x


def _masked_free_chol(H, free, n):
    """Cholesky of the free-subspace-masked Hessian: clamped rows/cols
    zeroed, unit diagonal on clamped entries (ops/linalg.py:
    masked_free_matrix - the 1.0 diagonal is the documented deviation
    from the reference's 1e-11, mpc/pnqp.py:48)."""
    Hm = _mat(n, n)
    for i in range(n):
        for j in range(n):
            both = free[i] & free[j]
            Hm[i][j] = (0.0 if _is_lit0(H[i][j])
                        else jnp.where(both, H[i][j], 0.0))
        Hm[i][i] = jnp.where(free[i], H[i][i], 1.0)
    return _cholesky(Hm, n)


def _pnqp_kernel(H, q, lo, hi, x0, n, n_iter):
    """In-kernel batched projected-Newton box QP (ops/pnqp.py:pnqp with
    parallel Armijo), lists-of-lane-vectors form.

    Returns (x, L_free, free, n_iter_mask_sum) where L_free is the
    Cholesky factor of the final free-masked Hessian (used for the
    feedback-gain solve, reference mpc/lqr_step.py:135-148).
    """
    zero = x0[0] * 0.0
    one = zero + 1.0
    x = [jnp.clip(x0[i], lo[i], hi[i]) for i in range(n)]

    def obj(z):
        acc = 0.0
        for i in range(n):
            s = _dotz(H[i], z)
            acc = _addz(acc, _mulz(_addz(_mulz(0.5, s), q[i]), z[i]))
        return acc

    def body(_, st):
        x, done_f, _L, _free_f, iters = st
        done = done_f > 0.5
        g = [_addz(_dotz(H[i], x), q[i]) for i in range(n)]
        clamped = [((x[i] == lo[i]) & (g[i] > 0)) |
                   ((x[i] == hi[i]) & (g[i] < 0)) for i in range(n)]
        free = [~clamped[i] for i in range(n)]
        g_ = [jnp.where(clamped[i], 0.0, g[i]) for i in range(n)]
        L_free = _masked_free_chol(H, free, n)
        # literal-zero folds (H entries baked as 0.0) must not ride the
        # fori_loop carry: anchor them to lane vectors so the carry
        # pytree keeps a uniform (8, 128) structure
        L_free = [[zero if _is_lit0(e) else e for e in row]
                  for row in L_free]
        dx = [-d for d in _chol_solve(L_free, g_, n)]

        dx2 = 0.0
        for i in range(n):
            dx2 = dx2 + dx[i] * dx[i]
        conv = jnp.sqrt(dx2) < PNQP_CONV_TOL
        done_new = done | conv

        # parallel Armijo over the deterministic decay schedule
        # (first trial with ratio > GAMMA, else the last computed)
        ox = obj(x)
        found = None
        sel = None
        for k in range(PNQP_MAX_LS):
            a = PNQP_LS_DECAY ** k
            xt = [jnp.clip(x[i] + a * dx[i], lo[i], hi[i])
                  for i in range(n)]
            num = ox - obj(xt)
            den = sum(g[i] * (x[i] - xt[i]) for i in range(n))
            armijo = jnp.where(jnp.abs(den) < 1e-30, PNQP_GAMMA + 1e-6,
                               num / den)
            if k == 0:
                sel = xt
                found = armijo > PNQP_GAMMA
            else:
                take = ~found
                sel = [jnp.where(take, xt[i], sel[i]) for i in range(n)]
                found = found | (take & (armijo > PNQP_GAMMA))

        x_new = [jnp.where(done_new, x[i], sel[i]) for i in range(n)]
        iters_new = iters + jnp.where(done, 0.0, 1.0)
        free_f = [jnp.where(free[i], one, zero) for i in range(n)]
        return (x_new, jnp.where(done_new, one, zero), L_free, free_f,
                iters_new)

    eye0 = _mat(n, n)
    for i in range(n):
        for j in range(n):
            eye0[i][j] = one if i == j else zero
    init = (x, zero, eye0, [one for _ in range(n)], zero)
    x, _, L_free, free_f, iters = lax.fori_loop(0, n_iter, body, init,
                                                unroll=False)
    free = [f > 0.5 for f in free_f]
    return x, L_free, free, iters


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(*, T, ns, nc, has_bounds, dyn_mode, soa_step, n_params,
                 has_f, lqr_iter, pnqp_iter, eps, best_cost_eps,
                 not_improved_lim, linesearch_decay, max_linesearch_iter,
                 delta_u=None, cost_smem=False, bounds_smem=False,
                 dyn_smem=False, has_uz=False, uz_smem=False,
                 cost_mode='quad', soa_cost=None, n_cost_params=0,
                 C_zero=None, c_zero=None, c_batched=False):
    ntau = ns + nc
    alphas = [linesearch_decay ** k for k in range(max_linesearch_iter)]

    def kernel(params_ref, C_ref, c_ref, F_ref, f_ref, x0_ref, u0_ref,
               lb_ref, ub_ref, uz_ref, xout_ref, uout_ref, stats_ref):
        x0 = [x0_ref[i, 0] for i in range(ns)]
        u0 = [[u0_ref[t, j, 0] for j in range(nc)] for t in range(T)]
        if cost_mode != 'quad':
            C = c = None
        elif cost_smem:
            # batch-shared quadratic cost: scalars from SMEM, broadcast
            # lazily against the lane vectors (saves the [T, B, n, n]
            # materialization + relayout + VMEM streaming entirely).
            # Entries the dispatcher proved zero at trace time
            # (C_zero/c_zero - the cost was a concrete closure constant)
            # become literal 0.0 so the _dotz/_addz sites below drop
            # their products from the emitted code entirely (a diagonal
            # C skips ~3/4 of every quadratic form).
            C = [[[(0.0 if C_zero is not None and C_zero[t][i][j]
                    else C_ref[t, i * ntau + j]) for j in range(ntau)]
                  for i in range(ntau)] for t in range(T)]
            if c_batched:
                # split layout (shared C + per-example c, the
                # goal-tracking shape): c rides a blocked VMEM operand
                # like the fully-batched path
                c = [[c_ref[t, i, 0] for i in range(ntau)]
                     for t in range(T)]
            else:
                c = [[(0.0 if c_zero is not None and c_zero[t][i]
                       else c_ref[t, i]) for i in range(ntau)]
                     for t in range(T)]
        else:
            C = [[[C_ref[t, i, j, 0] for j in range(ntau)]
                  for i in range(ntau)] for t in range(T)]
            c = [[c_ref[t, i, 0] for i in range(ntau)] for t in range(T)]
        if has_bounds:
            if bounds_smem:
                lb = [[lb_ref[t, j] for j in range(nc)] for t in range(T)]
                ub = [[ub_ref[t, j] for j in range(nc)] for t in range(T)]
            else:
                lb = [[lb_ref[t, j, 0] for j in range(nc)]
                      for t in range(T)]
                ub = [[ub_ref[t, j, 0] for j in range(nc)]
                      for t in range(T)]
        if has_uz:
            # zero-pin masks as floats (1.0 = control pinned to zero)
            if uz_smem:
                uz = [[uz_ref[t, j] for j in range(nc)] for t in range(T)]
            else:
                uz = [[uz_ref[t, j, 0] for j in range(nc)]
                      for t in range(T)]

        if dyn_mode == 'soa':
            params = tuple(params_ref[k, 0] for k in range(n_params))

            # SoA models with nc == 1 take the control as a bare vector
            if nc == 1:
                def step(xs, us):
                    return soa_step(tuple(xs), us[0], params)
            else:
                def step(xs, us):
                    return soa_step(tuple(xs), tuple(us), params)
        else:
            if dyn_smem:
                Fm = [[[F_ref[t, i * ntau + j] for j in range(ntau)]
                       for i in range(ns)] for t in range(T - 1)]
                fv = ([[f_ref[t, i] for i in range(ns)]
                       for t in range(T - 1)] if has_f else None)
            else:
                Fm = [[[F_ref[t, i, j, 0] for j in range(ntau)]
                       for i in range(ns)] for t in range(T - 1)]
                fv = ([[f_ref[t, i, 0] for i in range(ns)]
                       for t in range(T - 1)] if has_f else None)

        def dyn_step(t, xs, us):
            """True dynamics x_{t+1} = f(x_t, u_t)."""
            if dyn_mode == 'soa':
                return list(step(xs, us))
            tau = list(xs) + list(us)
            out = []
            for i in range(ns):
                s = 0.0
                for j in range(ntau):
                    s = s + Fm[t][i][j] * tau[j]
                if fv is not None:
                    s = s + fv[t][i]
                out.append(s)
            return out

        # derive the loop-carry constants from loaded data: literal
        # constants get a lane-replicated register layout, and Mosaic
        # cannot reconcile that with the computed (non-replicated) loop
        # body outputs at the fori_loop carry join.
        zero = x0[0] * 0.0
        one = zero + 1.0
        big = zero + jnp.float32(3.0e38)

        if cost_mode == 'soa':
            cparams = tuple(params_ref[n_params + k, 0]
                            for k in range(n_cost_params))
            if nc == 1:
                def cost_eval(xs, us):
                    return soa_cost(tuple(xs), us[0], cparams)
            else:
                def cost_eval(xs, us):
                    return soa_cost(tuple(xs), tuple(us), cparams)

        def stage_cost(t, xs, us):
            """True stage cost (reference util.get_cost, mpc/util.py:129)."""
            if cost_mode == 'soa':
                return cost_eval(xs, us)
            return _quad_lin_cost(C[t], c[t], list(xs) + list(us))

        def cost_quad(xs, us):
            """Gradient + Hessian of the SoA cost at (xs, us) via nested
            jvp over the small tau basis - the in-kernel analog of the
            reference's double-autograd ``approximate_cost``
            (mpc/mpc.py:470-478).  In delta space the recentred linear
            term is exactly the gradient (c_t = g - H tau  =>
            C tau + c = g), so only (H, g) are needed."""
            prim = tuple(xs) + tuple(us)

            def f(*tau):
                return cost_eval(tau[:ns], tau[ns:ntau])

            g = [None] * ntau
            H = _mat(ntau, ntau)
            for j in range(ntau):
                tang = tuple(one if i == j else zero for i in range(ntau))

                def gj(*tau_, _tang=tang):
                    return jax.jvp(f, tau_, _tang)[1]

                gv, lin = jax.linearize(gj, *prim)
                g[j] = gv
                for i in range(j, ntau):
                    basis = tuple(one if kk == i else zero
                                  for kk in range(ntau))
                    Hij = lin(*basis)
                    H[j][i] = Hij
                    H[i][j] = Hij
            return H, g

        def rollout_init(u_seq):
            xs = [x0]
            for t in range(T - 1):
                xs.append(dyn_step(t, xs[t], u_seq[t]))
            return xs

        def traj_cost(x_seq, u_seq):
            acc = 0.0
            for t in range(T):
                acc = _addz(acc, stage_cost(t, x_seq[t], u_seq[t]))
            return acc

        x_init_traj = rollout_init(u0)

        def outer(it, s):
            (x, u, best_x, best_u, best_cost, best_du, cur_du,
             nni, n_qp, alpha_sel, active_f, n_it) = s
            active = active_f > 0.5

            # ---- linearize + Taylor-recentred linear term ----------------
            # (reference mpc/mpc.py:255 + mpc/lqr_step.py:284-295)
            if dyn_mode == 'soa':
                F = []
                ones_v = one
                zeros_v = zero
                for t in range(T - 1):
                    # the primal control is the WHOLE tuple u[t]; ``step``
                    # itself unwraps the nc == 1 scalar (passing u[t][0]
                    # here would make step's us[0] slice off sublane row
                    # 0 and broadcast the first 128 examples' controls to
                    # the whole tile - wrong Jacobians for every sublane
                    # but the first)
                    prim = (tuple(x[t]), tuple(u[t]))
                    _, lin = jax.linearize(step, *prim)
                    Ft = _mat(ns, ntau)
                    for j in range(ns):
                        tang_x = tuple(ones_v if i == j else zeros_v
                                       for i in range(ns))
                        col = lin(tang_x,
                                  tuple(zeros_v for _ in range(nc)))
                        for i in range(ns):
                            Ft[i][j] = col[i]
                    for j in range(nc):
                        col = lin(tuple(zeros_v for _ in range(ns)),
                                  tuple(ones_v if i == j else zeros_v
                                        for i in range(nc)))
                        for i in range(ns):
                            Ft[i][ns + j] = col[i]
                    F.append(Ft)
            else:
                F = Fm

            if cost_mode == 'soa':
                # quadratize the cost at the current trajectory
                # (reference mpc/mpc.py:261 -> approximate_cost); the
                # recentred delta-space linear term IS the gradient
                Cq = [None] * T
                cb = [None] * T
                for t in range(T):
                    Cq[t], cb[t] = cost_quad(x[t], u[t])
            else:
                Cq = C
                cb = []
                for t in range(T):
                    tau = x[t] + u[t]
                    cb.append([_addz(_dotz(C[t][i], tau), c[t][i])
                               for i in range(ntau)])

            # ---- Riccati backward recursion ------------------------------
            # (reference mpc/lqr_step.py:52-160; delta-space gains)
            K = [None] * T      # K[t][j][i], j in nc rows, i in ns cols
            k = [None] * T      # k[t][j]
            Vm = None
            vv = None
            qp_cnt = zero
            prev_kt = None
            for t in range(T - 1, -1, -1):
                if t == T - 1:
                    Qt = Cq[t]
                    qt = cb[t]
                else:
                    Ft = F[t]
                    W = _mat(ns, ntau)
                    for i in range(ns):
                        for j in range(ntau):
                            W[i][j] = _dotz(Vm[i],
                                            [Ft[kk][j] for kk in range(ns)])
                    Qt = _mat(ntau, ntau)
                    for a in range(ntau):
                        for b in range(a, ntau):
                            Qt[a][b] = _addz(
                                Cq[t][a][b],
                                _dotz([Ft[kk][a] for kk in range(ns)],
                                      [W[kk][b] for kk in range(ns)]))
                            Qt[b][a] = Qt[a][b]
                    qt = [_addz(cb[t][a],
                                _dotz([Ft[kk][a] for kk in range(ns)], vv))
                          for a in range(ntau)]

                Quu = [[Qt[ns + i][ns + j] for j in range(nc)]
                       for i in range(nc)]
                Qux = [[Qt[ns + i][j] for j in range(ns)]
                       for i in range(nc)]
                qu = [qt[ns + i] for i in range(nc)]

                if not has_bounds:
                    if has_uz:
                        # zero-pinned controls: masked free-subspace
                        # solve, pinned rows of K/k exactly zero
                        # (reference mpc/lqr_step.py:99-127; same
                        # construction as the jnp path's
                        # masked_free_matrix + mask_rows)
                        free = [(uz[t][i] + zero) < 0.5
                                for i in range(nc)]
                        if nc == 1:
                            inv = 1.0 / Quu[0][0]
                            kt = [0.0 if _is_lit0(qu[0]) else
                                  jnp.where(free[0], -qu[0] * inv, 0.0)]
                            Kt = [[0.0 if _is_lit0(Qux[0][j]) else
                                   jnp.where(free[0], -Qux[0][j] * inv,
                                             0.0) for j in range(ns)]]
                        else:
                            qu_m = [0.0 if _is_lit0(qu[i]) else
                                    jnp.where(free[i], qu[i], 0.0)
                                    for i in range(nc)]
                            L_f = _masked_free_chol(Quu, free, nc)
                            kt = [-v if not _is_lit0(v) else 0.0
                                  for v in _chol_solve(L_f, qu_m, nc)]
                            cols = [_chol_solve(
                                L_f,
                                [0.0 if _is_lit0(Qux[i][j]) else
                                 jnp.where(free[i], Qux[i][j], 0.0)
                                 for i in range(nc)], nc)
                                for j in range(ns)]
                            Kt = [[-cols[j][i] if not _is_lit0(cols[j][i])
                                   else 0.0 for j in range(ns)]
                                  for i in range(nc)]
                    elif nc == 1:
                        inv = 1.0 / Quu[0][0]
                        kt = [_nmulz(qu[0], inv)]
                        Kt = [[_nmulz(Qux[0][j], inv) for j in range(ns)]]
                    else:
                        # Cholesky with jitter instead of the
                        # reference's per-example pinverse
                        # (mpc/lqr_step.py:89-94; SURVEY.md section 7)
                        L = _cholesky(Quu, nc, jitter=1e-11)
                        kt = [-v if not _is_lit0(v) else 0.0
                              for v in _chol_solve(L, qu, nc)]
                        cols = [_chol_solve(
                            L, [Qux[i][j] for i in range(nc)], nc)
                            for j in range(ns)]
                        Kt = [[-cols[j][i] if not _is_lit0(cols[j][i])
                               else 0.0 for j in range(ns)]
                              for i in range(nc)]
                else:
                    lo = [lb[t][j] - u[t][j] for j in range(nc)]
                    hi = [ub[t][j] - u[t][j] for j in range(nc)]
                    if delta_u is not None:
                        # trust region on the delta controls
                        # (reference mpc/lqr_step.py:132-134)
                        lo = [jnp.maximum(v, -delta_u) for v in lo]
                        hi = [jnp.minimum(v, delta_u) for v in hi]
                    if nc == 1:
                        # closed-form 1-D box QP (ops/pnqp.py:pnqp_1d)
                        Quu_s = Quu[0][0]
                        inv = 1.0 / Quu_s
                        kf = _nmulz(qu[0], inv)
                        kv = jnp.clip(kf, lo[0], hi[0])
                        g = _addz(Quu_s * kv, qu[0])
                        clamped = ((kv == lo[0]) & (g > 0)) | \
                            ((kv == hi[0]) & (g < 0))
                        kt = [kv]
                        Kt = [[0.0 if _is_lit0(Qux[0][j]) else
                               jnp.where(clamped, 0.0, -Qux[0][j] * inv)
                               for j in range(ns)]]
                        qp_cnt = qp_cnt + 1.0
                    else:
                        # warm start with the previous step's k_t
                        # (reference mpc/lqr_step.py:135-137)
                        if prev_kt is None:
                            L0 = _cholesky(Quu, nc, jitter=1e-11)
                            x_init = [-v for v in _chol_solve(L0, qu, nc)]
                        else:
                            x_init = prev_kt
                        kt, L_free, free, qp_it = _pnqp_kernel(
                            Quu, qu, lo, hi, x_init, nc, pnqp_iter)
                        qp_cnt = qp_cnt + qp_it
                        cols = [_chol_solve(
                            L_free,
                            [0.0 if _is_lit0(Qux[i][j]) else
                             jnp.where(free[i], Qux[i][j], 0.0)
                             for i in range(nc)], nc)
                            for j in range(ns)]
                        Kt = [[-cols[j][i] if not _is_lit0(cols[j][i])
                               else 0.0 for j in range(ns)]
                              for i in range(nc)]
                    prev_kt = kt
                K[t] = Kt
                k[t] = kt

                # cost-to-go update (reference mpc/lqr_step.py:155-158)
                # V = Qxx + Qxu K + K^T Qux + K^T Quu K ; likewise v
                QK = _mat(ns, ns)     # Qxu @ K
                for i in range(ns):
                    for j in range(ns):
                        QK[i][j] = _dotz([Qt[i][ns + m] for m in range(nc)],
                                         [Kt[m][j] for m in range(nc)])
                KQuu = _mat(nc, ns)   # Quu @ K  (transposed use)
                for m in range(nc):
                    for j in range(ns):
                        KQuu[m][j] = _dotz(Quu[m],
                                           [Kt[mm][j] for mm in range(nc)])
                Vn = _mat(ns, ns)
                for i in range(ns):
                    for j in range(i, ns):
                        kqk = _dotz([Kt[m][i] for m in range(nc)],
                                    [KQuu[m][j] for m in range(nc)])
                        Vn[i][j] = _addz(_addz(Qt[i][j], QK[i][j]),
                                         _addz(QK[j][i], kqk))
                        Vn[j][i] = Vn[i][j]
                Quuk = [_dotz(Quu[m], kt) for m in range(nc)]
                vn = [_addz(
                          _addz(qt[i],
                                _dotz([Qt[i][ns + m] for m in range(nc)],
                                      kt)),
                          _dotz([Kt[m][i] for m in range(nc)],
                                [_addz(qu[m], Quuk[m])
                                 for m in range(nc)]))
                      for i in range(ns)]
                Vm, vv = Vn, vn

            # ---- line-searched forward rollout ---------------------------
            # masked first-passing-else-last selection, identical to the
            # parallel schedule in ops/lqr.py:lqr_forward
            old_cost = traj_cost(x, u)

            found = zero > one          # all-False
            sel_x = None
            sel_u = None
            sel_cost = None
            sel_alpha = None
            full_du = None
            for ki, a in enumerate(alphas):
                nx = [x0]
                nu = []
                cost_a = 0.0
                for t in range(T):
                    dxt = [nx[t][i] - x[t][i] for i in range(ns)]
                    ut = []
                    for m in range(nc):
                        v = _addz(_dotz(K[t][m], dxt),
                                  _addz(u[t][m], _mulz(a, k[t][m])))
                        if has_uz:
                            # zero-mask before the clamp, like the
                            # reference (mpc/lqr_step.py:197-213)
                            v = jnp.where((uz[t][m] + zero) > 0.5,
                                          0.0, v)
                        if has_bounds:
                            lo_f, hi_f = lb[t][m], ub[t][m]
                            if delta_u is not None:
                                # trust region around the nominal control,
                                # intersected with the box (reference
                                # mpc/lqr_step.py:204-211)
                                lo_f = jnp.maximum(u[t][m] - delta_u, lo_f)
                                hi_f = jnp.minimum(u[t][m] + delta_u, hi_f)
                            v = jnp.clip(v, lo_f, hi_f)
                        ut.append(v)
                    nu.append(ut)
                    cost_a = _addz(cost_a, stage_cost(t, nx[t], ut))
                    if t < T - 1:
                        nx.append(dyn_step(t, nx[t], ut))
                if ki == 0:
                    du2 = 0.0
                    for t in range(T):
                        for m in range(nc):
                            d = u[t][m] - nu[t][m]
                            du2 = du2 + d * d
                    full_du = jnp.sqrt(du2)
                    sel_x, sel_u = nx, nu
                    sel_cost = cost_a
                    sel_alpha = zero + a
                    found = cost_a <= old_cost
                else:
                    take = ~found
                    sel_x = [[jnp.where(take, nx[t][i], sel_x[t][i])
                              for i in range(ns)] for t in range(T)]
                    sel_u = [[jnp.where(take, nu[t][m], sel_u[t][m])
                              for m in range(nc)] for t in range(T)]
                    sel_cost = jnp.where(take, cost_a, sel_cost)
                    sel_alpha = jnp.where(take, a, sel_alpha)
                    found = found | (take & (cost_a <= old_cost))

            # ---- best tracking + per-lane stopping -----------------------
            # (reference mpc/mpc.py:271-301 / solver._OuterState)
            first = it == 0
            improved = sel_cost <= best_cost + best_cost_eps
            take_best = active & (first | improved)
            nni_new = jnp.where(active,
                                jnp.where(improved & jnp.logical_not(first),
                                          0.0, nni + 1.0), nni)

            x_new = [[jnp.where(active, sel_x[t][i], x[t][i])
                      for i in range(ns)] for t in range(T)]
            u_new = [[jnp.where(active, sel_u[t][m], u[t][m])
                      for m in range(nc)] for t in range(T)]
            best_x_new = [[jnp.where(take_best, sel_x[t][i], best_x[t][i])
                           for i in range(ns)] for t in range(T)]
            best_u_new = [[jnp.where(take_best, sel_u[t][m], best_u[t][m])
                           for m in range(nc)] for t in range(T)]
            best_cost_new = jnp.where(take_best, sel_cost, best_cost)
            best_du_new = jnp.where(take_best, full_du, best_du)
            cur_du_new = jnp.where(active, full_du, cur_du)
            n_qp_new = n_qp + jnp.where(active, qp_cnt, 0.0)
            alpha_new = jnp.where(active, sel_alpha, alpha_sel)
            n_it_new = n_it + jnp.where(active, 1.0, 0.0)

            keep = (cur_du_new >= eps) & (nni_new <= not_improved_lim)
            active_new = jnp.where(active & keep, one, zero)

            return (x_new, u_new, best_x_new, best_u_new, best_cost_new,
                    best_du_new, cur_du_new, nni_new, n_qp_new, alpha_new,
                    active_new, n_it_new)

        init = (
            x_init_traj,
            [list(ut) for ut in u0],
            x_init_traj,
            [list(ut) for ut in u0],
            big,                 # best_cost = +inf
            big,                 # best_du
            big,                 # cur_du
            zero,                # n_not_improved
            zero,                # n_qp
            one,                 # alpha
            one,                 # active mask (1.0 = still iterating)
            zero,                # n_iter
        )
        out = lax.fori_loop(0, lqr_iter, outer, init, unroll=False)
        (_, _, best_x, best_u, best_cost, best_du, _, _, n_qp, alpha,
         _, n_it) = out

        for t in range(T):
            for i in range(ns):
                xout_ref[t, i, 0] = best_x[t][i]
            for m in range(nc):
                uout_ref[t, m, 0] = best_u[t][m]
        stats_ref[0, 0] = best_cost
        stats_ref[1, 0] = best_du
        stats_ref[2, 0] = n_it
        stats_ref[3, 0] = n_qp
        stats_ref[4, 0] = alpha

    return kernel


# ---------------------------------------------------------------------------
# long-horizon kernel: fori_loop over t with per-t state in VMEM scratch
# ---------------------------------------------------------------------------

def _make_kernel_long(*, T, ns, nc, has_bounds, dyn_mode, soa_step,
                      n_params, has_f, lqr_iter, pnqp_iter, eps,
                      best_cost_eps, not_improved_lim, linesearch_decay,
                      max_linesearch_iter, delta_u=None, cost_smem=True,
                      bounds_smem=True, dyn_smem=True, has_uz=False,
                      uz_smem=True, t_unroll=1,
                      cost_mode='quad', soa_cost=None, n_cost_params=0,
                      cost_stream=False, dyn_stream=False,
                      soa_stream_step=None, soa_stream_jac=None,
                      soa_stream_step_multi=None,
                      C_zero_ti=None, c_zero_ti=None):
    """Same solver as ``_make_kernel`` but with the horizon as a
    ``lax.fori_loop`` instead of a Python unroll, so T is bounded by the
    VMEM budget (see ``_long_vmem_bytes``) instead of Mosaic compile
    time.  Per-t state (trajectory, gains, best trajectory) lives in
    VMEM scratch/output refs indexed dynamically on the leading dim;
    only the small-dimension loops stay Python-unrolled.

    The line search evaluates the deterministic alpha schedule with
    cost-only rollouts (nothing stored), then re-rolls once with the
    per-lane selected alpha to commit - trading one extra rollout for
    O(T) trial-trajectory storage.  Semantics match ``_make_kernel``
    exactly (same selection rule, masks, and accumulation order), except
    ``old_cost`` is carried from the previous accepted cost instead of
    recomputed (bit-identical: both are the same stage-order sum).
    """
    ntau = ns + nc
    alphas = [linesearch_decay ** k for k in range(max_linesearch_iter)]

    def kernel(params_ref, C_ref, c_ref, F_ref, f_ref, x0_ref, u0_ref,
               lb_ref, ub_ref, uz_ref, xout_ref, uout_ref, stats_ref,
               x_ref, u_ref, K_ref, k_ref, *stream_refs):
        x0 = [x0_ref[i, 0] for i in range(ns)]
        zero = x0[0] * 0.0
        one = zero + 1.0
        big = zero + jnp.float32(3.0e38)

        # ---- dynamic-t accessors ----------------------------------------
        # Batched per-example cost at long T cannot fit VMEM (T * ntau^2
        # lane tiles); it stays in HBM (pl.ANY) and each read DMAs the
        # one [ntau, ntau] (or [ntau]) t-slice into a small VMEM scratch
        # (synchronous copy - correctness first; the Riccati/rollout
        # loops hide part of the latency by touching each t once)
        srefs = list(stream_refs)
        if cost_stream or dyn_stream:
            gi = pl.program_id(0)
        if cost_stream:
            Cbuf_ref, Csem = srefs[:2]
            srefs = srefs[2:]
        if dyn_stream:
            Fbuf_ref, Fsem = srefs[:2]

        # Streamed (C_t, c_t) / (F_t, f_t) ride a 2-slot VMEM scratch
        # keyed by t % 2, DOUBLE-BUFFERED: every loop starts the
        # adjacent step's copy BEFORE waiting on the current one, so
        # the DMA overlaps that step's compute.  The host packs c as
        # row ntau of the C block (f as column ntau of F) - one DMA per
        # operand per t - and lays the grid axis in FRONT so the slice
        # uses leading indices only (a mid-axis dynamic index hangs
        # Mosaic's DMA lowering).  All loops touch t in unit steps, so
        # parity slots never collide, and every started copy is waited
        # before its loop exits (guarded by pl.when at the edges).
        if cost_stream:
            def C_dma(t, slot):
                return pltpu.make_async_copy(
                    C_ref.at[gi, t], Cbuf_ref.at[slot], Csem.at[slot])

            def C_load(slot):
                Ct = [[Cbuf_ref[slot, i, j] for j in range(ntau)]
                      for i in range(ntau)]
                ct = [Cbuf_ref[slot, ntau, j] for j in range(ntau)]
                return Ct, ct

        def read_Cc(t):
            """Synchronous streamed read (slot 0) - fallback for loops
            without a prefetch schedule."""
            cp = C_dma(t, 0)
            cp.start()
            cp.wait()
            return C_load(0)

        def read_C(t, fold=False):
            # batched (non-SMEM) quadratic cost always streams in the
            # long kernel (fused_batched_solve sets cost_stream), so
            # only the SMEM layout reaches here.  ``fold=True`` bakes
            # TIME-INVARIANT literal-zero entries (C_zero_ti - zero at
            # EVERY t, so valid under the dynamic t index) as 0.0 for
            # the _dotz/_addz folding sites; only the stage-cost path
            # opts in, so no literal ever enters the Riccati fori
            # carries (see read_cost_data).
            return [[(0.0 if fold and C_zero_ti is not None
                      and C_zero_ti[i][j]
                      else C_ref[t, i * ntau + j]) for j in range(ntau)]
                    for i in range(ntau)]

        def read_c(t, fold=False):
            return [(0.0 if fold and c_zero_ti is not None
                     and c_zero_ti[i] else c_ref[t, i])
                    for i in range(ntau)]

        def read_bounds(t):
            if bounds_smem:
                return ([lb_ref[t, j] for j in range(nc)],
                        [ub_ref[t, j] for j in range(nc)])
            return ([lb_ref[t, j, 0] for j in range(nc)],
                    [ub_ref[t, j, 0] for j in range(nc)])

        def read_uz(t):
            if uz_smem:
                return [uz_ref[t, j] for j in range(nc)]
            return [uz_ref[t, j, 0] for j in range(nc)]

        def read_x(t):
            return [x_ref[t, i] for i in range(ns)]

        def read_u(t):
            return [u_ref[t, m] for m in range(nc)]

        def read_K(t):
            return [[K_ref[t, m * ns + j] for j in range(ns)]
                    for m in range(nc)]

        def read_k(t):
            return [k_ref[t, m] for m in range(nc)]

        # ---- dynamics ----------------------------------------------------
        if dyn_mode == 'soa_stream':
            # param-streaming SoA model: the model itself loops over
            # hidden units with lax.fori_loop, reading each weight from
            # SMEM via ``pread`` (dynamic index) and fusing the step
            # with its analytic input Jacobian - O(1) live registers
            # and O(1) compiled instructions regardless of the
            # parameter count (vs the tuple path's one-instruction-per-
            # weight unroll).  The Jacobian replaces jax.linearize (the
            # in-kernel analog of the reference's grad_input,
            # mpc/dynamics.py:81-130).
            def pread(i):
                return params_ref[i, 0]

            if nc == 1:
                def step(xs, us):
                    return soa_stream_step(tuple(xs), us[0], pread)

                def jac(xs, us):
                    return soa_stream_jac(tuple(xs), us[0], pread)
            else:
                def step(xs, us):
                    return soa_stream_step(tuple(xs), tuple(us), pread)

                def jac(xs, us):
                    return soa_stream_jac(tuple(xs), tuple(us), pread)

            def read_dyn_data(t):
                return None

            def dyn_step_from(data, xs, us):
                return list(step(xs, us))

            def dyn_step_multi(pts):
                """Step at one point per trial alpha in ONE weight
                sweep (see NNDynamics.soa_stream_step_multi): the SMEM
                read stream is shared across alphas, so the fused
                line-search loop stops paying n_alpha weight sweeps."""
                if nc == 1:
                    outs = soa_stream_step_multi(
                        [(tuple(xs), us[0]) for xs, us in pts], pread)
                else:
                    outs = soa_stream_step_multi(
                        [(tuple(xs), tuple(us)) for xs, us in pts],
                        pread)
                return [list(o) for o in outs]

            def dyn_step(t, xs, us):
                return list(step(xs, us))

            def dyn_F(t, xs, us):
                Jt = jac(xs, us)
                # broadcast any scalar entries (slew passthrough rows)
                # to lane tiles so the Riccati carry types stay uniform
                return [[Jt[i][j] + zero for j in range(ntau)]
                        for i in range(ns)]
        elif dyn_mode == 'soa':
            params = tuple(params_ref[k, 0] for k in range(n_params))

            if nc == 1:
                def step(xs, us):
                    return soa_step(tuple(xs), us[0], params)
            else:
                def step(xs, us):
                    return soa_step(tuple(xs), tuple(us), params)

            def read_dyn_data(t):
                return None

            def dyn_step_from(data, xs, us):
                return list(step(xs, us))

            def dyn_step(t, xs, us):
                return list(step(xs, us))

            def dyn_F(t, xs, us):
                ones_v, zeros_v = one, zero
                # whole-tuple primal; ``step`` unwraps nc == 1 itself
                # (see the short kernel's linearize block for why)
                prim = (tuple(xs), tuple(us))
                _, lin = jax.linearize(step, *prim)
                Ft = _mat(ns, ntau)
                for j in range(ns):
                    tang_x = tuple(ones_v if i == j else zeros_v
                                   for i in range(ns))
                    col = lin(tang_x,
                              tuple(zeros_v for _ in range(nc)))
                    for i in range(ns):
                        Ft[i][j] = col[i]
                for j in range(nc):
                    col = lin(tuple(zeros_v for _ in range(ns)),
                              tuple(ones_v if i == j else zeros_v
                                    for i in range(nc)))
                    for i in range(ns):
                        Ft[i][ns + j] = col[i]
                return Ft
        else:
            if dyn_stream:
                def F_dma(t, slot):
                    return pltpu.make_async_copy(
                        F_ref.at[gi, t], Fbuf_ref.at[slot],
                        Fsem.at[slot])

                def F_load(slot):
                    Ft = [[Fbuf_ref[slot, i, j] for j in range(ntau)]
                          for i in range(ns)]
                    fv = ([Fbuf_ref[slot, i, ntau] for i in range(ns)]
                          if has_f else None)
                    return Ft, fv

            def read_Ff(t):
                """Synchronous streamed read (slot 0) - fallback for
                loops without a prefetch schedule."""
                cp = F_dma(t, 0)
                cp.start()
                cp.wait()
                return F_load(0)

            def read_F(t):
                if dyn_stream:
                    return read_Ff(t)[0]
                # batched LinDx always streams in the long kernel, so
                # only the SMEM layout reaches here
                return [[F_ref[t, i * ntau + j] for j in range(ntau)]
                        for i in range(ns)]

            def read_f(t):
                if not has_f:
                    return None
                return [f_ref[t, i] for i in range(ns)]

            def read_dyn_data(t):
                # t is clamped by callers to [0, T-2]
                if dyn_stream:
                    return read_Ff(t)
                return read_F(t), read_f(t)

            def dyn_step_from(data, xs, us):
                Ft, fv = data
                tau = list(xs) + list(us)
                out = []
                for i in range(ns):
                    s = 0.0
                    for j in range(ntau):
                        s = s + Ft[i][j] * tau[j]
                    if fv is not None:
                        s = s + fv[i]
                    out.append(s)
                return out

            def dyn_step(t, xs, us):
                return dyn_step_from(read_dyn_data(t), xs, us)

            def dyn_F(t, xs, us):
                return read_F(t)

        if cost_mode == 'soa':
            cparams = tuple(params_ref[n_params + k, 0]
                            for k in range(n_cost_params))
            if nc == 1:
                def cost_eval(xs, us):
                    return soa_cost(tuple(xs), us[0], cparams)
            else:
                def cost_eval(xs, us):
                    return soa_cost(tuple(xs), tuple(us), cparams)

        def read_cost_data(t):
            if cost_mode == 'soa':
                return None
            if cost_stream:
                return read_Cc(t)
            # stage-cost evaluations (the line-search trial rollouts'
            # O(ntau^2)-per-t quadratic forms) fold time-invariant
            # zeros; a diagonal C drops ~(ntau^2 - ntau)/ntau^2 of the
            # products per stage per trial
            return read_C(t, fold=True), read_c(t, fold=True)

        def stage_cost_from(data, xs, us):
            if cost_mode == 'soa':
                return cost_eval(xs, us)
            Ct, ct = data
            return _quad_lin_cost(Ct, ct, list(xs) + list(us))

        def stage_cost(t, xs, us):
            return stage_cost_from(read_cost_data(t), xs, us)

        def cost_quad(xs, us):
            """(H, g) of the SoA cost at (xs, us); see the short
            kernel's cost_quad (same nested-jvp construction)."""
            prim = tuple(xs) + tuple(us)

            def f(*tau):
                return cost_eval(tau[:ns], tau[ns:ntau])

            g = [None] * ntau
            H = _mat(ntau, ntau)
            for j in range(ntau):
                tang = tuple(one if i == j else zero for i in range(ntau))

                def gj(*tau_, _tang=tang):
                    return jax.jvp(f, tau_, _tang)[1]

                gv, lin = jax.linearize(gj, *prim)
                g[j] = gv
                for i in range(j, ntau):
                    basis = tuple(one if kk == i else zero
                                  for kk in range(ntau))
                    Hij = lin(*basis)
                    H[j][i] = Hij
                    H[i][j] = Hij
            return H, g

        # ---- control solve at one t (shared by peel + loop) --------------
        def ctrl_solve(t, Qt, qt, prev_kt):
            """Returns (kt, Kt, qp_inc); prev_kt None only at the peeled
            t = T-1 step (static branch).  Same three regimes as
            ``_make_kernel``."""
            Quu = [[Qt[ns + i][ns + j] for j in range(nc)]
                   for i in range(nc)]
            Qux = [[Qt[ns + i][j] for j in range(ns)]
                   for i in range(nc)]
            qu = [qt[ns + i] for i in range(nc)]
            qp_inc = zero

            if not has_bounds:
                if has_uz:
                    uzt = read_uz(t)
                    free = [(uzt[i] + zero) < 0.5 for i in range(nc)]
                    if nc == 1:
                        inv = 1.0 / Quu[0][0]
                        kt = [jnp.where(free[0], -qu[0] * inv, 0.0)]
                        Kt = [[jnp.where(free[0], -Qux[0][j] * inv, 0.0)
                               for j in range(ns)]]
                    else:
                        qu_m = [jnp.where(free[i], qu[i], 0.0)
                                for i in range(nc)]
                        L_f = _masked_free_chol(Quu, free, nc)
                        kt = [-v for v in _chol_solve(L_f, qu_m, nc)]
                        cols = [_chol_solve(
                            L_f,
                            [jnp.where(free[i], Qux[i][j], 0.0)
                             for i in range(nc)], nc)
                            for j in range(ns)]
                        Kt = [[-cols[j][i] for j in range(ns)]
                              for i in range(nc)]
                elif nc == 1:
                    inv = 1.0 / Quu[0][0]
                    kt = [-qu[0] * inv]
                    Kt = [[-Qux[0][j] * inv for j in range(ns)]]
                else:
                    L = _cholesky(Quu, nc, jitter=1e-11)
                    kt = [-v for v in _chol_solve(L, qu, nc)]
                    cols = [_chol_solve(
                        L, [Qux[i][j] for i in range(nc)], nc)
                        for j in range(ns)]
                    Kt = [[-cols[j][i] for j in range(ns)]
                          for i in range(nc)]
            else:
                lbt, ubt = read_bounds(t)
                ut = read_u(t)
                lo = [lbt[j] - ut[j] for j in range(nc)]
                hi = [ubt[j] - ut[j] for j in range(nc)]
                if delta_u is not None:
                    lo = [jnp.maximum(v, -delta_u) for v in lo]
                    hi = [jnp.minimum(v, delta_u) for v in hi]
                if nc == 1:
                    Quu_s = Quu[0][0]
                    inv = 1.0 / Quu_s
                    kf = -qu[0] * inv
                    kv = jnp.clip(kf, lo[0], hi[0])
                    g = Quu_s * kv + qu[0]
                    clamped = ((kv == lo[0]) & (g > 0)) | \
                        ((kv == hi[0]) & (g < 0))
                    kt = [kv]
                    Kt = [[jnp.where(clamped, 0.0, -Qux[0][j] * inv)
                           for j in range(ns)]]
                    qp_inc = qp_inc + 1.0
                else:
                    if prev_kt is None:
                        L0 = _cholesky(Quu, nc, jitter=1e-11)
                        x_init = [-v for v in _chol_solve(L0, qu, nc)]
                    else:
                        x_init = prev_kt
                    kt, L_free, free, qp_it = _pnqp_kernel(
                        Quu, qu, lo, hi, x_init, nc, pnqp_iter)
                    qp_inc = qp_inc + qp_it
                    cols = [_chol_solve(
                        L_free,
                        [jnp.where(free[i], Qux[i][j], 0.0)
                         for i in range(nc)], nc)
                        for j in range(ns)]
                    Kt = [[-cols[j][i] for j in range(ns)]
                          for i in range(nc)]
            return kt, Kt, qp_inc

        def vv_update(Qt, qt, Kt, kt):
            """Cost-to-go update (reference mpc/lqr_step.py:155-158)."""
            Quu = [[Qt[ns + i][ns + j] for j in range(nc)]
                   for i in range(nc)]
            qu = [qt[ns + i] for i in range(nc)]
            QK = _mat(ns, ns)
            for i in range(ns):
                for j in range(ns):
                    QK[i][j] = sum(Qt[i][ns + m] * Kt[m][j]
                                   for m in range(nc))
            KQuu = _mat(nc, ns)
            for m in range(nc):
                for j in range(ns):
                    KQuu[m][j] = sum(Quu[m][mm] * Kt[mm][j]
                                     for mm in range(nc))
            Vn = _mat(ns, ns)
            for i in range(ns):
                for j in range(i, ns):
                    kqk = sum(Kt[m][i] * KQuu[m][j] for m in range(nc))
                    Vn[i][j] = Qt[i][j] + QK[i][j] + QK[j][i] + kqk
                    Vn[j][i] = Vn[i][j]
            Quuk = [sum(Quu[m][mm] * kt[mm] for mm in range(nc))
                    for m in range(nc)]
            vn = [qt[i]
                  + sum(Qt[i][ns + m] * kt[m] for m in range(nc))
                  + sum(Kt[m][i] * (qu[m] + Quuk[m]) for m in range(nc))
                  for i in range(ns)]
            return Vn, vn

        def write_gains(t, Kt, kt):
            # gains computed purely from SMEM scalars (batch-shared
            # cost/dynamics, unconstrained solve) are 0-d; broadcast to
            # the lane tile before storing
            for m in range(nc):
                k_ref[t, m] = kt[m] + zero
                for j in range(ns):
                    K_ref[t, m * ns + j] = Kt[m][j] + zero

        def recentred(t, Cc=None):
            xt = read_x(t)
            ut = read_u(t)
            if cost_mode == 'soa':
                # quadratize at the current trajectory point; the
                # delta-space recentred linear term is the gradient
                Ht, gt = cost_quad(xt, ut)
                return Ht, gt, xt, ut
            if cost_stream:
                Ct, ct = Cc if Cc is not None else read_Cc(t)
            else:
                Ct = read_C(t)
                ct = read_c(t)
            tau = xt + ut
            cb = [sum(Ct[i][j] * tau[j] for j in range(ntau)) + ct[i]
                  for i in range(ntau)]
            return Ct, cb, xt, ut

        def riccati():
            """Reverse DP over the horizon; gains land in K_ref/k_ref.
            Returns total in-kernel QP iterations (lane vector)."""
            # double-buffered prologue: C[T-1] for the peel, plus the
            # first body step's (C, F)[T-2] in flight during the peel
            if cost_stream:
                C_dma(T - 1, (T - 1) % 2).start()
            if T >= 2:
                if cost_stream:
                    C_dma(T - 2, (T - 2) % 2).start()
                if dyn_stream:
                    F_dma(T - 2, (T - 2) % 2).start()
            Cc_peel = None
            if cost_stream:
                C_dma(T - 1, (T - 1) % 2).wait()
                Cc_peel = C_load((T - 1) % 2)
            # peel t = T-1 (V_T = 0, so Q = C)
            Ct, cb, _, _ = recentred(T - 1, Cc_peel)
            kt, Kt, qp0 = ctrl_solve(T - 1, Ct, cb, None)
            write_gains(T - 1, Kt, kt)
            V, v = vv_update(Ct, cb, Kt, kt)
            # fori carry types must match: with lane-valued dynamics
            # Jacobians (SoA / batched LinDx) the loop body produces
            # lane-tile V while the unconstrained peel above can stay
            # 0-d (SMEM-scalar quadratic cost => scalar Kt) - broadcast
            # the peeled carry.  The all-SMEM LinDx case is scalar on
            # both sides and must stay scalar (the TVLQR fast path).
            if ((dyn_mode != 'lindx' or not dyn_smem)
                    and cost_mode == 'quad' and cost_smem
                    and not has_bounds and not has_uz):
                V = [[V[i][j] + zero for j in range(ns)]
                     for i in range(ns)]
                v = [vi + zero for vi in v]
                kt = [ki + zero for ki in kt]

            def rstep(i, carry):
                V, v, prev_kt, qp = carry
                t = T - 2 - i
                slot = lax.rem(t, 2)
                if cost_stream or dyn_stream:
                    # start step t-1's copies before waiting on t's
                    @pl.when(t >= 1)
                    def _():
                        if cost_stream:
                            C_dma(t - 1, 1 - slot).start()
                        if dyn_stream:
                            F_dma(t - 1, 1 - slot).start()
                Cc = None
                if cost_stream:
                    C_dma(t, slot).wait()
                    Cc = C_load(slot)
                Ct, cb, xt, ut = recentred(t, Cc)
                if dyn_stream:
                    F_dma(t, slot).wait()
                    Ft = F_load(slot)[0]
                else:
                    Ft = dyn_F(t, xt, ut)
                W = _mat(ns, ntau)
                for a in range(ns):
                    for b in range(ntau):
                        W[a][b] = sum(V[a][kk] * Ft[kk][b]
                                      for kk in range(ns))
                Qt = _mat(ntau, ntau)
                for a in range(ntau):
                    for b in range(a, ntau):
                        Qt[a][b] = Ct[a][b] + sum(
                            Ft[kk][a] * W[kk][b] for kk in range(ns))
                        Qt[b][a] = Qt[a][b]
                qt = [cb[a] + sum(Ft[kk][a] * v[kk] for kk in range(ns))
                      for a in range(ntau)]
                kt, Kt, qp_inc = ctrl_solve(t, Qt, qt, prev_kt)
                write_gains(t, Kt, kt)
                Vn, vn = vv_update(Qt, qt, Kt, kt)
                return (Vn, vn, kt, qp + qp_inc)

            out = lax.fori_loop(0, T - 1, rstep, (V, v, kt, qp0),
                                unroll=t_unroll)
            return out[3]

        def _ctrl_from(Kt, kt, lbt, ubt, uzt, dxt, u_old, alpha):
            ut = []
            for m in range(nc):
                v = (sum(Kt[m][j] * dxt[j] for j in range(ns))
                     + u_old[m] + alpha * kt[m])
                if has_uz:
                    v = jnp.where((uzt[m] + zero) > 0.5, 0.0, v)
                if has_bounds:
                    lo_f, hi_f = lbt[m], ubt[m]
                    if delta_u is not None:
                        lo_f = jnp.maximum(u_old[m] - delta_u, lo_f)
                        hi_f = jnp.minimum(u_old[m] + delta_u, hi_f)
                    v = jnp.clip(v, lo_f, hi_f)
                ut.append(v)
            return ut

        def new_ctrl(t, dxt, u_old, alpha):
            Kt = read_K(t)
            kt = read_k(t)
            uzt = read_uz(t) if has_uz else None
            lbt, ubt = read_bounds(t) if has_bounds else (None, None)
            return _ctrl_from(Kt, kt, lbt, ubt, uzt, dxt, u_old, alpha)

        n_a = len(alphas)
        # fuse the per-alpha trial rollouts into one horizon loop when
        # the dynamics evaluation is cheap (LinDx / few-param SoA):
        # sharing the loop amortizes per-t reads/DMAs and gives the VPU
        # n_a independent chains (+28% streamed LinDx, +14% T=256
        # pendulum).  Param-heavy MLP dynamics on the TUPLE path spill
        # registers when evaluated n_a times per body, so they keep one
        # loop per alpha; param-STREAMING dynamics fuse through
        # dyn_step_multi (one weight sweep for all alphas, P * ns live
        # accumulators) as long as the alpha count and any unrolled
        # cost params stay modest.
        stream_multi_ok = (dyn_mode == 'soa_stream'
                           and soa_stream_step_multi is not None
                           and n_a <= 6
                           and n_cost_params <= _UNROLL_PARAM_LIMIT)
        fuse_alphas = (dyn_mode == 'lindx' or stream_multi_ok
                       or n_params + n_cost_params <= _UNROLL_PARAM_LIMIT)
        dyn_multi = stream_multi_ok and fuse_alphas

        def fwd_prologue():
            """Start the t=0 copies for a forward (t ascending) loop."""
            if cost_stream:
                C_dma(0, 0).start()
            if dyn_stream:
                F_dma(0, 0).start()

        def fwd_fetch(t, need_cost=True):
            """Double-buffered (cdata, ddata) for forward loops: start
            t+1's copies, wait t's, load from slot t % 2.  Dynamics
            indices clamp to T-2 (the t = T-1 step re-copies the same
            slice into the other slot, keeping the schedule uniform)."""
            slot = lax.rem(t, 2)
            if (cost_stream and need_cost) or dyn_stream:
                @pl.when(t + 1 < T)
                def _():
                    if cost_stream and need_cost:
                        C_dma(t + 1, 1 - slot).start()
                    if dyn_stream:
                        F_dma(jnp.minimum(t + 1, T - 2),
                              1 - slot).start()
            if cost_stream and need_cost:
                C_dma(t, slot).wait()
                cdata = C_load(slot)
            else:
                cdata = read_cost_data(t) if need_cost else None
            if dyn_stream:
                F_dma(jnp.minimum(t, T - 2), slot).wait()
                ddata = F_load(slot)
            else:
                ddata = read_dyn_data(jnp.minimum(t, T - 2))
            return cdata, ddata

        def rollout_cost_all():
            """All line-search trial rollouts in ONE horizon loop (see
            ``fuse_alphas``).  Per-alpha accumulation order matches the
            one-rollout-per-alpha form exactly.  Returns (costs per
            alpha, ||du||^2 at alpha_0)."""
            fwd_prologue()

            def fstep(t, carry):
                xts, costs, du2 = carry
                x_old = read_x(t)
                u_old = read_u(t)
                Kt = read_K(t)
                kt = read_k(t)
                uzt = read_uz(t) if has_uz else None
                lbt, ubt = read_bounds(t) if has_bounds else (None, None)
                cdata, ddata = fwd_fetch(t)
                uts = []
                new_costs = []
                for ai, a in enumerate(alphas):
                    dxt = [xts[ai][i] - x_old[i] for i in range(ns)]
                    ut = _ctrl_from(Kt, kt, lbt, ubt, uzt, dxt, u_old, a)
                    uts.append(ut)
                    new_costs.append(
                        costs[ai] + stage_cost_from(cdata, xts[ai], ut))
                    if ai == 0:
                        for m in range(nc):
                            d = u_old[m] - ut[m]
                            du2 = du2 + d * d
                if dyn_multi:
                    new_xts = dyn_step_multi(
                        [(xts[ai], uts[ai]) for ai in range(n_a)])
                else:
                    new_xts = [dyn_step_from(ddata, xts[ai], uts[ai])
                               for ai in range(n_a)]
                return (new_xts, new_costs, du2)

            init = ([list(x0) for _ in range(n_a)], [zero] * n_a, zero)
            _, costs, du2 = lax.fori_loop(0, T, fstep, init,
                                          unroll=t_unroll)
            return costs, du2

        def rollout_cost_one(alpha):
            """Single-alpha trial rollout (the non-fused form)."""
            def fstep(t, carry):
                xt, cost, du2 = carry
                x_old = read_x(t)
                u_old = read_u(t)
                dxt = [xt[i] - x_old[i] for i in range(ns)]
                ut = new_ctrl(t, dxt, u_old, alpha)
                cost = cost + stage_cost(t, xt, ut)
                for m in range(nc):
                    d = u_old[m] - ut[m]
                    du2 = du2 + d * d
                xn = dyn_step(jnp.minimum(t, T - 2), xt, ut)
                return (xn, cost, du2)

            out = lax.fori_loop(0, T, fstep, (list(x0), zero, zero),
                                unroll=t_unroll)
            return out[1], out[2]

        def rollout_costs():
            if fuse_alphas:
                return rollout_cost_all()
            costs = []
            du2 = None
            for ki, a in enumerate(alphas):
                cost_a, d2 = rollout_cost_one(a)
                costs.append(cost_a)
                if ki == 0:
                    du2 = d2
            return costs, du2

        def rollout_commit(alpha, active, take_best):
            """Re-roll with the per-lane selected alpha, merging into the
            current (active lanes) and best (take_best lanes) refs."""
            if dyn_stream:
                F_dma(0, 0).start()

            def fstep(t, carry):
                (xt,) = carry
                x_old = read_x(t)
                u_old = read_u(t)
                dxt = [xt[i] - x_old[i] for i in range(ns)]
                ut = new_ctrl(t, dxt, u_old, alpha)
                for i in range(ns):
                    xm = jnp.where(active, xt[i], x_old[i])
                    x_ref[t, i] = xm
                    xout_ref[t, i, 0] = jnp.where(
                        take_best, xm, xout_ref[t, i, 0])
                for m in range(nc):
                    um = jnp.where(active, ut[m], u_old[m])
                    u_ref[t, m] = um
                    uout_ref[t, m, 0] = jnp.where(
                        take_best, um, uout_ref[t, m, 0])
                if dyn_stream:
                    _, ddata = fwd_fetch(t, need_cost=False)
                    xn = dyn_step_from(ddata, xt, ut)
                else:
                    xn = dyn_step(jnp.minimum(t, T - 2), xt, ut)
                return (xn,)

            lax.fori_loop(0, T, fstep, (list(x0),), unroll=t_unroll)

        # ---- init: u <- u0, x <- rollout(u0), best <- initial traj -------
        def istep(t, carry):
            xt, cost = carry
            ut = [u0_ref[t, m, 0] for m in range(nc)]
            for m in range(nc):
                u_ref[t, m] = ut[m]
                uout_ref[t, m, 0] = ut[m]
            for i in range(ns):
                x_ref[t, i] = xt[i]
                xout_ref[t, i, 0] = xt[i]
            cdata, ddata = fwd_fetch(t)
            cost = cost + stage_cost_from(cdata, xt, ut)
            xn = dyn_step_from(ddata, xt, ut)
            return (xn, cost)

        fwd_prologue()
        _, init_cost = lax.fori_loop(0, T, istep, (list(x0), zero),
                                     unroll=t_unroll)

        # ---- outer iLQR loop ---------------------------------------------
        def outer(it, s):
            (best_cost, best_du, cur_du, nni, n_qp, alpha_sel, active_f,
             n_it, cost_cur) = s
            active = active_f > 0.5

            qp_cnt = riccati()
            old_cost = cost_cur

            costs_all, du2 = rollout_costs()
            full_du = jnp.sqrt(du2)
            sel_alpha = zero + alphas[0]
            sel_cost = costs_all[0]
            found = costs_all[0] <= old_cost
            for ki in range(1, n_a):
                take = ~found
                sel_alpha = jnp.where(take, alphas[ki], sel_alpha)
                sel_cost = jnp.where(take, costs_all[ki], sel_cost)
                found = found | (take & (costs_all[ki] <= old_cost))

            first = it == 0
            improved = sel_cost <= best_cost + best_cost_eps
            take_best = active & (first | improved)
            rollout_commit(sel_alpha, active, take_best)

            nni_new = jnp.where(active,
                                jnp.where(improved & jnp.logical_not(first),
                                          0.0, nni + 1.0), nni)
            best_cost_new = jnp.where(take_best, sel_cost, best_cost)
            best_du_new = jnp.where(take_best, full_du, best_du)
            cur_du_new = jnp.where(active, full_du, cur_du)
            n_qp_new = n_qp + jnp.where(active, qp_cnt, 0.0)
            alpha_new = jnp.where(active, sel_alpha, alpha_sel)
            n_it_new = n_it + jnp.where(active, 1.0, 0.0)
            cost_cur_new = jnp.where(active, sel_cost, cost_cur)

            keep = (cur_du_new >= eps) & (nni_new <= not_improved_lim)
            active_new = jnp.where(active & keep, one, zero)

            return (best_cost_new, best_du_new, cur_du_new, nni_new,
                    n_qp_new, alpha_new, active_new, n_it_new,
                    cost_cur_new)

        init = (big, big, big, zero, zero, one, one, zero, init_cost)
        out = lax.fori_loop(0, lqr_iter, outer, init, unroll=False)
        (best_cost, best_du, _, _, n_qp, alpha, _, n_it, _) = out

        stats_ref[0, 0] = best_cost
        stats_ref[1, 0] = best_du
        stats_ref[2, 0] = n_it
        stats_ref[3, 0] = n_qp
        stats_ref[4, 0] = alpha

    return kernel


def _long_vmem_bytes(T, ns, nc, *, cost_smem, dyn_smem, bounds_smem,
                     uz_smem, has_uz, has_bounds, has_f, lindx,
                     multi_tile=True, c_batched=False):
    # c_batched (the short kernel's split cost layout) never reaches the
    # long kernel: _layout_flags resolves a mixed pair to fully batched
    # whenever the problem routes long, so the flag is accepted for
    # signature compatibility and ignored here
    """Conservative VMEM estimate (bytes) for the long-horizon kernel:
    per-t lane tiles for u0+outputs+scratch plus any batched (VMEM)
    operands, plus the Riccati body's LIVE REGISTERS (V, Qt, the
    factor, work vectors) which Mosaic allocates on the same 16MB
    scoped-VMEM stack.  u0 is input/output-aliased with uout, so
    counted once.  Batched cost is NOT T-scaled: it stays in HBM and
    is DMA-streamed through a constant-size scratch slice (see
    ``cost_stream``).

    ``multi_tile``: when the batch needs more than one (8, 128) grid
    program, Mosaic DOUBLE-BUFFERS the grid-blocked operands (xout,
    uout/u0) to overlap program g's compute with g+1's block DMA, so
    the T-scaled blocked tensors cost a second slot.  This is a
    hardware-observed cliff, not a refinement: pendulum T=256 runs at
    B=1024 (G=1) but OOMs Mosaic's 16MB scoped-VMEM stack at B=2048
    (G=2, observed 18.06M); 19s/4c T=20 runs at B=1024 but OOMs at
    B=2048 (observed 17.54M).  Callers that don't know the batch size
    must assume multi_tile.

    The body-register term was calibrated against the observed Mosaic
    stack boundary on the DEFAULT 16MB stack: ntau=20/22/23 (16s/4c,
    18s/4c, 19s/4c at T=20, shared LinDx box) lowered and ran at G=1
    while ntau=24 (20s/4c, estimate 14.62MB) overflowed it by ~4KB.
    With the 40MB stack request (round 4) the estimates stay the
    yardstick: round-5 boundary validation ran 20s/4c at G=1 AND G=3
    (est 16.50MB multi), 22s/4c and 24s/4c at G=1 (est 16.31/18.06MB).
    _LONG_T_VMEM_LIMIT / _LONG_T_VMEM_LIMIT_MULTI sit between the
    validated-admitted and rejected estimates of their regime.
    """
    ntau = ns + nc
    tiles = 2 * ns + 2 * nc + nc * ns + nc   # xout,x + uout(=u0),u + K,k
    if multi_tile:
        tiles += ns + nc                     # second slots: xout, uout
    const_tiles = 0
    if not cost_smem:
        const_tiles += ntau * ntau + ntau    # streamed per-t slice
    if lindx and not dyn_smem:
        const_tiles += ns * ntau + (ns if has_f else 0)   # streamed
    if has_bounds and not bounds_smem:
        tiles += 2 * nc
    if has_uz and not uz_smem:
        tiles += nc
    # live body registers: cost-to-go V (ns^2), assembled Qt (ntau^2),
    # the control-block factor + PNQP state (~2 nc^2), work vectors
    const_tiles += ns * ns + ntau * ntau + 2 * nc * nc + 4 * ntau
    return (T * tiles + const_tiles) * SUB * LANE * 4


# Hardware-calibrated, per grid regime (see _long_vmem_bytes).
# Round-3 bracketed Mosaic's DEFAULT 16MB scoped-VMEM stack (14.62MB
# estimate OOM'd by ~4KB; G>1 under-predicted by ~1.9MB).  Round 4
# raises the requested stack to _LONG_SCOPED_VMEM via CompilerParams
# (v5e VMEM is 128MB) and re-calibrates against runs with it:
# - single tile: pendulum T=384 (est 18.2MB) lowers and runs, exact
#   dispatch behavior vs jnp; T=512 (est 24.2MB) exceeded the remote
#   compile helper's budget on this rig (not a VMEM OOM) - the limit
#   sits at the validated point.
# - multi tile: pendulum T=256 at G=2 (est 16.2MB - the config that
#   OOM'd the 16MB default stack in round 3) now lowers and runs
#   (est 16.2MB, so the multi limit sits just above it).
_LONG_T_VMEM_LIMIT = 19 * 2 ** 20
_LONG_T_VMEM_LIMIT_MULTI = 17 * 2 ** 20

# Scoped-VMEM limit REQUESTED from Mosaic for the fori-loop kernel
# (pltpu.CompilerParams.vmem_limit_bytes).  Mosaic's default scoped
# stack is 16MB, which the calibrations above bracketed; v5e VMEM is
# 128MB, so raising the request extends the long kernel's T / ntau
# reach without changing the kernel.  The admission limits above are
# re-calibrated against this raised stack (round 4).
_LONG_SCOPED_VMEM = 40 * 2 ** 20

# SoA models with more scalar params than this compile through the
# long (fori-loop) kernel even at T <= 128 (see fused_batched_solve)
_UNROLL_PARAM_LIMIT = 64


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _normalize_mixed_layouts(cfg, cost, dynamics, B,
                             u_lower=None, u_zero_I=None):
    """Broadcast MIXED shared/batched QuadCost / LinDx pairs to the
    fully-batched layout - EXCEPT the shared-C / batched-c QuadCost
    direction when the short kernel can run it split.

    The reference broadcasts every cost/dynamics leaf independently
    (mpc/mpc.py:205-226; util.expandParam, mpc/util.py:21-27), so C may
    be batch-shared while c is per-example (shared weights +
    per-example goals) and F shared while f is batched.  The kernel
    keys most layouts per PAIR, so a mixed pair is resolved to batched:
    the batched leaf already forces the VMEM/streaming path, the
    broadcast only adds layout, not information.  The one exception is
    the canonical goal-tracking shape (shared C, per-example c) on the
    unrolled kernel, which reads C from SMEM (with literal-zero
    folding) and c as a blocked VMEM operand (``c_batched`` in
    _layout_flags) - no [T, B, ntau, ntau] broadcast at all.
    Both-shared pairs are untouched and keep the full SMEM fast path.
    """
    T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
    ntau = ns + nc
    if isinstance(cost, QuadCost):
        C, c = jnp.asarray(cost.C), jnp.asarray(cost.c)
        if (C.ndim == 4) != (c.ndim == 3):
            if C.ndim < 4 and _layout_flags(
                    cfg, cost, dynamics, u_lower, u_zero_I)['c_batched']:
                pass          # split layout: dispatch keeps C shared
            elif C.ndim < 4:
                C = C[None, None] if C.ndim == 2 else C[:, None]
                C = jnp.broadcast_to(C, (T, B, ntau, ntau))
                cost = QuadCost(C, c)
            else:
                c = c[None, None] if c.ndim == 1 else c[:, None]
                c = jnp.broadcast_to(c, (T, B, ntau))
                cost = QuadCost(C, c)
    if isinstance(dynamics, LinDx) and dynamics.f is not None:
        F, f = jnp.asarray(dynamics.F), jnp.asarray(dynamics.f)
        if (F.ndim == 4) != (f.ndim == 3):
            if F.ndim == 3:
                F = jnp.broadcast_to(F[:, None], (T - 1, B, ns, ntau))
            else:
                f = jnp.broadcast_to(f[:, None], (T - 1, B, ns))
            dynamics = LinDx(F, f)
    return cost, dynamics


def fused_batched_solve(cfg, x_init, cost: QuadCost, dynamics,
                        u_init=None, u_lower=None, u_upper=None,
                        u_zero_I=None, prev_ctrl=None,
                        interpret: bool = False) -> Solution:
    """Batched solve through the fused kernel.

    Layouts match learning.batched_solve: x_init [B, ns]; bounds/u_init
    time-major [T, B, ...].  Cost / LinDx / bounds may be batched
    (streamed through VMEM) or batch-shared / scalar (kept in SMEM);
    mixed shared/batched pairs are normalized to batched.
    Returns a batched Solution (out_axes matching the vmapped path).
    """
    cost, dynamics = _normalize_mixed_layouts(
        cfg, cost, dynamics, x_init.shape[0],
        u_lower=u_lower, u_zero_I=u_zero_I)
    if cfg.slew_rate_penalty is not None:
        # slew + non-quadratic cost is rejected upstream (supports();
        # reference mpc/mpc.py:451-457)
        assert isinstance(cost, QuadCost)
        return _fused_slew_solve(cfg, x_init, cost, dynamics,
                                 u_init=u_init, u_lower=u_lower,
                                 u_upper=u_upper, u_zero_I=u_zero_I,
                                 prev_ctrl=prev_ctrl, interpret=interpret)

    T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
    ntau = ns + nc
    B = x_init.shape[0]
    dtype = jnp.float32
    has_bounds = u_lower is not None

    G = -(-B // TILE)
    Bp = G * TILE
    pad = Bp - B

    def prep(a, batch_axis):
        a = jnp.asarray(a, dtype)
        if pad:
            widths = [(0, 0)] * a.ndim
            widths[batch_axis] = (0, pad)
            a = jnp.pad(a, widths, mode='edge')
        a = jnp.moveaxis(a, batch_axis, -1)
        return a.reshape(a.shape[:-1] + (G, SUB, LANE))

    dummy_smem = jnp.zeros((1, 1), dtype)
    C_zero = c_zero = C_zero_ti = c_zero_ti = None

    # ---- cost -------------------------------------------------------------
    if isinstance(cost, QuadCost):
        cost_mode = 'quad'
        soa_cost_fn = None
        cplist = []
        Ca = jnp.asarray(cost.C, dtype)
        ca = jnp.asarray(cost.c, dtype)
        cost_smem = Ca.ndim < 4
        # split layout: _normalize_mixed_layouts kept a shared C with a
        # per-example c because the short kernel runs it split (C on
        # SMEM + folding, c as a blocked VMEM operand)
        c_batched = cost_smem and ca.ndim == 3
        if cost_smem:
            # Trace-time zero patterns of CONCRETE shared costs (the
            # closure-constant case - jitting over x_init with a fixed
            # objective, or eager solves).  The unrolled kernel bakes
            # these entries as literal 0.0 and drops their products
            # from the emitted code (see _make_kernel) - a diagonal C
            # skips ~75% of every quadratic form, cb row, and Riccati
            # Qt term.  Arithmetic is exact up to FMA recontraction of
            # the shortened chains (see the helper block comment
            # above _is_lit0); under the MPC class
            # or a jit that takes the cost as an ARGUMENT the leaves
            # are tracers and the patterns stay None.
            C_zero = _const_zero_pattern(cost.C, (T, ntau, ntau))
            c_zero = (None if c_batched else
                      _const_zero_pattern(cost.c, (T, ntau)))
            if C_zero is not None:
                # never bake the control-block diagonal: a literal-zero
                # Quu diagonal would fold 1/Quu (and the in-kernel
                # PNQP's traced-gradient invariant) at trace time where
                # the SMEM path produces a runtime inf
                for i in range(nc):
                    C_zero[:, ns + i, ns + i] = False
                # time-invariant reduction (zero at EVERY t) for the
                # fori-loop kernel, whose dynamic t index can only bake
                # patterns shared across the horizon
                Cti = C_zero.all(axis=0)
                if Cti.any():
                    C_zero_ti = tuple(tuple(bool(v) for v in row)
                                      for row in Cti)
                C_zero = (None if not C_zero.any() else
                          tuple(tuple(tuple(bool(v) for v in row)
                                      for row in m) for m in C_zero))
            if c_zero is not None:
                cti = c_zero.all(axis=0)
                if cti.any():
                    c_zero_ti = tuple(bool(v) for v in cti)
                c_zero = tuple(tuple(bool(v) for v in row)
                               for row in c_zero)
            C = jnp.broadcast_to(Ca, (T, ntau, ntau)).reshape(
                T, ntau * ntau)
            C_spec = _smem((T, ntau * ntau))
            if c_batched:
                c = prep(ca, 1)
                c_spec = _vmem((T, ntau, 1, SUB, LANE), 2)
            else:
                c = jnp.broadcast_to(ca, (T, ntau))
                c_spec = _smem((T, ntau))
        else:
            C = prep(Ca, 1)                # [T, ntau, ntau, G, 8, 128]
            c = prep(ca, 1)
            C_spec = _vmem((T, ntau, ntau, 1, SUB, LANE), 3)
            c_spec = _vmem((T, ntau, 1, SUB, LANE), 2)
    else:
        # non-quadratic SoA cost: no arrays to stream; scalar params
        # ride SMEM next to the dynamics params, the kernel quadratizes
        # per outer iteration (see _is_soa_cost)
        cost_mode = 'soa'
        soa_cost_fn = cost.soa_cost
        cplist = list(cost.soa_params())
        cost_smem = True
        c_batched = False
        C = c = dummy_smem
        C_spec = c_spec = _smem((1, 1))

    # ---- dynamics ----------------------------------------------------------
    if isinstance(dynamics, LinDx):
        dyn_mode = 'lindx'
        Fa = jnp.asarray(dynamics.F, dtype)
        has_f = dynamics.f is not None
        dyn_smem = Fa.ndim == 3
        if dyn_smem:
            F = jnp.broadcast_to(Fa, (T - 1, ns, ntau)).reshape(
                T - 1, ns * ntau)
            F_spec = _smem((T - 1, ns * ntau))
            if has_f:
                f = jnp.broadcast_to(jnp.asarray(dynamics.f, dtype),
                                     (T - 1, ns))
                f_spec = _smem((T - 1, ns))
        else:
            F = prep(Fa, 1)
            F_spec = _vmem((T - 1, ns, ntau, 1, SUB, LANE), 3)
            if has_f:
                f = prep(jnp.asarray(dynamics.f, dtype), 1)
                f_spec = _vmem((T - 1, ns, 1, SUB, LANE), 2)
        if not has_f:
            f = dummy_smem
            f_spec = _smem((1, 1))
        soa_step = None
        dyn_flat = []
        n_dyn_params = 0
    else:
        dyn_smem = False
        has_f = False
        F = dummy_smem
        f = dummy_smem
        F_spec = _smem((1, 1))
        f_spec = _smem((1, 1))
        soa_step = dynamics.soa_step
        n_dyn_params = _soa_param_count(dynamics)
        if _dyn_streams(dynamics, n_dyn_params):
            dyn_mode = 'soa_stream'
        else:
            dyn_mode = 'soa'
        if hasattr(dynamics, 'soa_params_flat'):
            dyn_flat = [jnp.asarray(dynamics.soa_params_flat(),
                                    dtype).reshape(-1)]
        else:
            dyn_flat = [jnp.stack([jnp.asarray(p, dtype)
                                   for p in dynamics.soa_params()])]
        assert int(dyn_flat[0].shape[0]) == n_dyn_params

    # dynamics params first, cost params after (the kernel reads cost
    # params at offset n_params)
    n_params = n_dyn_params
    n_cost_params = len(cplist)
    if cplist:
        dyn_flat.append(jnp.stack([jnp.asarray(p, dtype)
                                   for p in cplist]))
    # COLUMN layout (P, 1): the streaming path reads params with a
    # dynamic index, and Mosaic only lowers dynamic SMEM loads cheaply
    # on the LEADING axis (a dynamic minor index stalls its compile,
    # like the DMA mid-axis case)
    params = (jnp.concatenate(dyn_flat)[:, None] if dyn_flat
              else dummy_smem)

    # ---- initial controls / bounds -----------------------------------------
    if u_init is None:
        u0 = jnp.zeros((T, nc, G, SUB, LANE), dtype)
    else:
        u0 = prep(u_init, 1)
    if has_bounds:
        bounds_smem = jnp.ndim(u_lower) < 3
        if bounds_smem:
            lb = jnp.broadcast_to(jnp.asarray(u_lower, dtype), (T, nc))
            ub = jnp.broadcast_to(jnp.asarray(u_upper, dtype), (T, nc))
            b_spec = _smem((T, nc))
        else:
            lb = prep(u_lower, 1)
            ub = prep(u_upper, 1)
            b_spec = _vmem((T, nc, 1, SUB, LANE), 2)
    else:
        bounds_smem = True
        lb = ub = jnp.zeros((T, nc), dtype)
        b_spec = _smem((T, nc))

    has_uz = u_zero_I is not None
    if has_uz:
        uza = jnp.asarray(u_zero_I)
        uz_smem = uza.ndim < 3
        if uz_smem:
            uzv = jnp.broadcast_to(uza, (T, nc)).astype(dtype)
            uz_spec = _smem((T, nc))
        else:
            uzv = prep(uza.astype(dtype), 1)
            uz_spec = _vmem((T, nc, 1, SUB, LANE), 2)
    else:
        uz_smem = True
        uzv = jnp.zeros((1, 1), dtype)
        uz_spec = _smem((1, 1))

    x0 = prep(x_init, 0)                   # [ns, G, 8, 128]

    common = dict(
        T=T, ns=ns, nc=nc, has_bounds=has_bounds,
        dyn_mode=dyn_mode, soa_step=soa_step, n_params=n_params,
        has_f=has_f,
        lqr_iter=cfg.lqr_iter, pnqp_iter=int(cfg.pnqp_iter),
        eps=float(cfg.eps),
        best_cost_eps=float(cfg.best_cost_eps),
        not_improved_lim=float(cfg.not_improved_lim),
        linesearch_decay=float(cfg.linesearch_decay),
        max_linesearch_iter=int(cfg.max_linesearch_iter),
        delta_u=(float(cfg.delta_u) if cfg.delta_u is not None else None),
        cost_smem=cost_smem, bounds_smem=bounds_smem, dyn_smem=dyn_smem,
        has_uz=has_uz, uz_smem=uz_smem,
        cost_mode=cost_mode, soa_cost=soa_cost_fn,
        n_cost_params=n_cost_params)

    # param-heavy SoA models (e.g. NNDynamics MLPs) route through the
    # fori-loop kernel even at short T: the unrolled kernel re-traces
    # the model T * (rollouts + linearize) times and Mosaic compile time
    # blows up (minutes for a hidden=16 MLP at T=20), while the long
    # kernel traces the horizon body once for a ~T-fold compile saving
    # at a modest runtime cost.  Routing uses the same count source as
    # supports() (_soa_param_count) so the VMEM gate stays consistent.
    route_count = ((n_dyn_params if dyn_mode != 'lindx' else 0)
                   + (_soa_param_count(cost) if cost_mode == 'soa'
                      else 0))
    long_horizon = _routes_long(
        T, ns, nc, route_count, G > 1,
        dict(cost_smem=cost_smem, dyn_smem=dyn_smem,
             bounds_smem=bounds_smem, uz_smem=uz_smem, has_uz=has_uz,
             has_bounds=has_bounds, has_f=has_f,
             lindx=dyn_mode == 'lindx', c_batched=c_batched))
    # _normalize_mixed_layouts only keeps the split layout when
    # _split_routes_short proves the unrolled route (conservative
    # multi-tile check), so a split operand set can never reach the
    # fori-loop kernel, which has no split support
    assert not (c_batched and long_horizon)
    extra = {}
    if long_horizon:
        scratch = [
            pltpu.VMEM((T, ns, SUB, LANE), dtype),       # x
            pltpu.VMEM((T, nc, SUB, LANE), dtype),       # u
            pltpu.VMEM((T, nc * ns, SUB, LANE), dtype),  # K
            pltpu.VMEM((T, nc, SUB, LANE), dtype),       # k
        ]
        cost_stream = cost_mode == 'quad' and not cost_smem
        if cost_stream:
            # batched per-example cost stays in HBM; the kernel DMAs
            # one t-slice at a time into these scratch buffers.  Move
            # the grid axis to the FRONT so the per-(g, t) DMA slice
            # uses leading indices only (Mosaic requirement).
            C = jnp.moveaxis(C, 3, 0)      # [G, T, ntau, ntau, 8, 128]
            c = jnp.moveaxis(c, 2, 0)      # [G, T, ntau, 8, 128]
            # pack c as row ntau of the C block: (C_t, c_t) per t in
            # ONE DMA instead of two (the copies are latency-bound)
            C = jnp.concatenate([C, c[:, :, None]], axis=2)
            c = dummy_smem
            C_spec = pl.BlockSpec(memory_space=pl.ANY)
            c_spec = _smem((1, 1))
            # 2-slot buffer + semaphore pair: the kernel double-buffers
            # the per-t copies (start t+-1 before waiting on t)
            scratch += [
                pltpu.VMEM((2, ntau + 1, ntau, SUB, LANE), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        # batched per-example LinDx dynamics stream the same way
        dyn_stream = dyn_mode == 'lindx' and not dyn_smem
        if dyn_stream:
            F = jnp.moveaxis(F, 3, 0)      # [G, T-1, ns, ntau, 8, 128]
            if has_f:
                # pack f as column ntau of the F block (one DMA per t)
                f = jnp.moveaxis(f, 2, 0)  # [G, T-1, ns, 8, 128]
                F = jnp.concatenate([F, f[:, :, :, None]], axis=3)
                f = dummy_smem
                f_spec = _smem((1, 1))
            F_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch += [
                pltpu.VMEM((2, ns, ntau + (1 if has_f else 0), SUB,
                            LANE), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        kernel = _make_kernel_long(
            **common, cost_stream=cost_stream, dyn_stream=dyn_stream,
            soa_stream_step=(dynamics.soa_stream_step
                             if dyn_mode == 'soa_stream' else None),
            soa_stream_jac=(dynamics.soa_stream_jac
                            if dyn_mode == 'soa_stream' else None),
            soa_stream_step_multi=(
                getattr(dynamics, 'soa_stream_step_multi', None)
                if dyn_mode == 'soa_stream' else None),
            C_zero_ti=C_zero_ti, c_zero_ti=c_zero_ti)
        extra = dict(
            scratch_shapes=scratch,
            # u0 aliases the u-output buffer (it IS the initial best_u),
            # saving T*nc lane tiles of VMEM
            input_output_aliases={6: 1},
            # raised scoped-VMEM stack (v5e VMEM is 128MB; Mosaic's
            # 16MB default was the old T / ntau admission boundary)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_LONG_SCOPED_VMEM),
        )
    else:
        # streaming models always exceed _UNROLL_PARAM_LIMIT and route
        # long; the unrolled kernel has no streaming path
        assert dyn_mode != 'soa_stream'
        kernel = _make_kernel(**common, C_zero=C_zero, c_zero=c_zero,
                              c_batched=c_batched)

    xs, us, stats = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            _smem((max(1, n_params + n_cost_params), 1)),
            C_spec,
            c_spec,
            F_spec,
            f_spec,
            _vmem((ns, 1, SUB, LANE), 1),
            _vmem((T, nc, 1, SUB, LANE), 2),
            b_spec,
            b_spec,
            uz_spec,
        ],
        out_specs=[
            _vmem((T, ns, 1, SUB, LANE), 2),
            _vmem((T, nc, 1, SUB, LANE), 2),
            _vmem((5, 1, SUB, LANE), 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, ns, G, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((T, nc, G, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((5, G, SUB, LANE), dtype),
        ],
        interpret=interpret,
        **extra,
    )(params, C, c, F, f, x0, u0, lb, ub, uzv)

    def unprep(a, batch_axis):
        a = a.reshape(a.shape[:-3] + (Bp,))
        a = jnp.moveaxis(a, -1, batch_axis)
        idx = [slice(None)] * a.ndim
        idx[batch_axis] = slice(0, B)
        return a[tuple(idx)]

    x = unprep(xs, 1)               # [T, B, ns]
    u = unprep(us, 1)               # [T, B, nc]
    st = unprep(stats, 1)           # [5, B]
    best_cost, best_du, n_it, n_qp, alpha = (st[i] for i in range(5))
    return Solution(
        x=x, u=u, costs=best_cost, full_du_norm=best_du,
        n_iter=n_it.astype(jnp.int32), n_qp_iter=n_qp.astype(jnp.int32),
        converged=best_du < cfg.eps, alpha=alpha)


class _SlewSoA:
    """SoA passthrough wrapper for the slew-augmented state
    ``(u_{t-1}, x_t)`` (the in-kernel analog of the reference's
    CtrlPassthroughDynamics, mpc/dynamics.py:133-153)."""

    def __init__(self, dynamics, nc):
        self._dyn = dynamics
        self._nc = nc

    def soa_params(self):
        return self._dyn.soa_params()

    def soa_param_count(self):
        return _soa_param_count(self._dyn)

    def soa_step(self, xs, u, params):
        nc = self._nc
        xn = self._dyn.soa_step(tuple(xs[nc:]), u, params)
        if nc == 1:
            return (u,) + tuple(xn)
        return tuple(u) + tuple(xn)

    # -- streaming passthrough (large MLPs; see NNDynamics) ---------------
    @property
    def soa_streaming(self):
        return getattr(self._dyn, 'soa_streaming', False)

    def soa_params_flat(self):
        if hasattr(self._dyn, 'soa_params_flat'):
            return self._dyn.soa_params_flat()
        return jnp.stack([jnp.asarray(p)
                          for p in self._dyn.soa_params()])

    def soa_stream_step(self, xs, u, pread):
        nc = self._nc
        xn = self._dyn.soa_stream_step(tuple(xs[nc:]), u, pread)
        if nc == 1:
            return (u,) + tuple(xn)
        return tuple(u) + tuple(xn)

    def soa_stream_step_multi(self, pts, pread):
        nc = self._nc
        inner = self._dyn.soa_stream_step_multi(
            [(tuple(xs[nc:]), u) for xs, u in pts], pread)
        outs = []
        for (xs, u), xn in zip(pts, inner):
            outs.append(((u,) if nc == 1 else tuple(u)) + tuple(xn))
        return outs

    def soa_stream_jac(self, xs, u, pread):
        """Jacobian of the augmented step (u_t, f(x_t, u_t)) w.r.t. the
        augmented tau ((u_{t-1}, x_t), u_t): the first nc rows pick u_t,
        the inner Jacobian shifts right past the u_{t-1} block (the
        in-kernel analog of CtrlPassthroughDynamics' grad_input,
        reference mpc/dynamics.py:133-156)."""
        nc = self._nc
        Ji = self._dyn.soa_stream_jac(tuple(xs[nc:]), u, pread)
        ns = len(Ji)
        zero = xs[0] * 0.0
        one = zero + 1.0
        rows = []
        for m in range(nc):
            rows.append([zero] * (nc + ns)
                        + [one if i == m else zero for i in range(nc)])
        for j in range(ns):
            rows.append([zero] * nc + list(Ji[j]))
        return rows


def _fused_slew_solve(cfg, x_init, cost: QuadCost, dynamics,
                      u_init=None, u_lower=None, u_upper=None,
                      u_zero_I=None, prev_ctrl=None,
                      interpret: bool = False) -> Solution:
    """Slew-rate penalty through the fused kernel via host-side state
    augmentation (the same construction as solver._augment_slew /
    reference mpc/mpc.py:362-445): augment the state with the previous
    control, solve the augmented problem in-kernel, strip the
    augmentation from the returned states.  Batch-shared cost/dynamics
    layouts stay batch-shared, so they keep riding SMEM.
    """
    import dataclasses

    T, ns, nc = cfg.T, cfg.n_state, cfg.n_ctrl
    ntau = ns + nc
    naug = ntau + nc
    B = x_init.shape[0]
    dtype = jnp.float32

    gam = jnp.asarray(cfg.slew_rate_penalty, dtype)
    eyec = jnp.eye(nc, dtype=dtype)
    slew_blk = jnp.zeros((naug, naug), dtype)
    slew_blk = slew_blk.at[:nc, :nc].set(gam * eyec)
    slew_blk = slew_blk.at[-nc:, -nc:].set(gam * eyec)
    slew_blk = slew_blk.at[:nc, -nc:].set(-gam * eyec)
    slew_blk = slew_blk.at[-nc:, :nc].set(-gam * eyec)

    Ca = jnp.asarray(cost.C, dtype)
    ca = jnp.asarray(cost.c, dtype)
    pad_m = [(0, 0)] * (Ca.ndim - 2) + [(nc, 0), (nc, 0)]
    pad_v = [(0, 0)] * (ca.ndim - 1) + [(nc, 0)]
    C_aug = jnp.pad(Ca, pad_m) + slew_blk
    c_aug = jnp.pad(ca, pad_v)

    if isinstance(dynamics, LinDx):
        F = jnp.asarray(dynamics.F, dtype)
        lead = F.shape[:-2]                       # [T-1] or [T-1, B]
        # top rows pick u_t: [0_{nc x (ns+nc)} | I_nc]; bottom rows are
        # [0_{ns x nc} | F]  (solver._augment_slew / mpc/mpc.py:380-390)
        F0 = jnp.concatenate(
            [jnp.zeros((nc, ns + nc), dtype), eyec], axis=1)
        F0 = jnp.broadcast_to(F0, lead + (nc, naug))
        F1 = jnp.concatenate(
            [jnp.zeros(lead + (ns, nc), dtype), F], axis=-1)
        F_aug = jnp.concatenate([F0, F1], axis=-2)
        if dynamics.f is not None:
            f = jnp.asarray(dynamics.f, dtype)
            f_aug = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(nc, 0)])
        else:
            f_aug = None
        dyn_aug = LinDx(F_aug, f_aug)
    else:
        dyn_aug = _SlewSoA(dynamics, nc)

    if prev_ctrl is None:
        prev_u = jnp.zeros((B, nc), dtype)
    else:
        prev_u = jnp.broadcast_to(
            jnp.asarray(prev_ctrl, dtype), (B, nc))
    x_init_aug = jnp.concatenate([prev_u, jnp.asarray(x_init, dtype)], 1)

    cfg_aug = dataclasses.replace(cfg, n_state=ns + nc,
                                  slew_rate_penalty=None)
    sol = fused_batched_solve(
        cfg_aug, x_init_aug, QuadCost(C_aug, c_aug), dyn_aug,
        u_init=u_init, u_lower=u_lower, u_upper=u_upper,
        u_zero_I=u_zero_I, interpret=interpret)
    # strip the (u_{t-1}) part of the augmented state (mpc/mpc.py:444)
    return sol._replace(x=sol.x[:, :, nc:])


def _vmem(block, gaxis):
    """VMEM BlockSpec: grid-g selects the batch-tile axis ``gaxis``."""

    def imap(g):
        return tuple(g if i == gaxis else 0 for i in range(len(block)))

    return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)


def _smem(block):
    return pl.BlockSpec(block, lambda g: tuple(0 for _ in block),
                        memory_space=pltpu.SMEM)
