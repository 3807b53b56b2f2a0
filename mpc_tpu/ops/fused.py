"""Fused single-kernel iLQR solver (Pallas, TPU).

The jnp solver (solver.py + ops/lqr.py) expresses one outer iLQR
iteration as ~10^3 small XLA ops over [B, 3..5, 3..5] tensors; on TPU
the solve is bound by per-op dispatch and HBM round-trips between those
tiny ops, not by FLOPs (each op moves KBs and does tens of FLOPs per
lane).  This module fuses the ENTIRE solve - initial rollout,
linearization, Riccati recursion, line-searched forward rollouts,
per-example best-solution tracking and stopping - into ONE Pallas
kernel, with the scenario batch laid out on the vector lanes:

  * a batch tile of 1024 examples is viewed as an (8, 128) VPU tile;
  * every scalar of the small per-example matrices (V, Q, K, ...)
    becomes one (8, 128) vector register covering the whole tile;
  * the small-dimension loops (n_state <= 8, horizon T) are unrolled in
    Python, so each kernel instruction is a full-width VPU op and all
    intermediates stay in registers/VMEM - zero HBM traffic between the
    phases of an iteration;
  * the grid runs over batch tiles.

Scope (dispatch falls back to the jnp path otherwise - see
``supports``): n_ctrl == 1 (closed-form 1-D box QP replaces PNQP, see
ops/pnqp.py:pnqp_1d), quadratic cost, nonlinear dynamics given in
structure-of-arrays form (``soa_step``/``soa_params`` on the model; the
Jacobian is extracted in-kernel with ``jax.linearize``), float32, no
slew/u_zero_I/delta_u.  This covers the flagship batched control
workloads (pendulum, cartpole, gym pendulums - reference
mpc/env_dx/pendulum.py, cartpole.py, examples/gym_pendulum*.py).

Semantics match solver.solve_single with one documented deviation: the
outer loop runs per-example ("freeze converged lanes") instead of the
reference's batch-global stopping (max over examples, mpc/mpc.py:299);
with a fixed iteration budget (eps=0) the two are identical, and
otherwise per-example stopping only stops examples that already
satisfied the same criterion.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import QuadCost, Solution

SUB, LANE = 8, 128
TILE = SUB * LANE            # batch examples per kernel program


def supports(cfg, cost, dynamics, u_zero_I=None, prev_ctrl=None,
             dtype=jnp.float32) -> bool:
    """Static dispatch check for the fused path."""
    return (
        cfg.n_ctrl == 1
        and cfg.slew_rate_penalty is None
        and cfg.delta_u is None
        and u_zero_I is None
        and prev_ctrl is None
        and not cfg.backprop
        and cfg.verbose <= 0
        and isinstance(cost, QuadCost)
        # batched [T, B, ...] (VMEM) or batch-shared [T, ...]/[...] (SMEM)
        and getattr(cost.C, 'ndim', 0) in (2, 3, 4)
        and hasattr(dynamics, 'soa_step')
        and hasattr(dynamics, 'soa_params')
        and dtype == jnp.float32
    )


# ---------------------------------------------------------------------------
# small-matrix helpers over nested lists of (8, 128) vector registers
# ---------------------------------------------------------------------------

def _mat(n, m):
    return [[None] * m for _ in range(n)]


def _quad_lin_cost(Ct, ct, tau):
    """0.5 tau^T C tau + c^T tau for one t (lists of lane-vectors)."""
    n = len(tau)
    acc = 0.0
    for i in range(n):
        s = 0.0
        for j in range(n):
            s = s + Ct[i][j] * tau[j]
        acc = acc + (0.5 * s + ct[i]) * tau[i]
    return acc


def _linearize(step, xs, u):
    """Per-lane Jacobian (R [ns][ns], S [ns]) of an SoA dynamics step.

    ``step`` is elementwise across lanes, so its lane-space Jacobian is
    diagonal; a jvp with an all-ones tangent in component j yields
    column j of the per-lane small Jacobian.  (TPU-native replacement
    for the reference's three linearization modes, mpc/mpc.py:490-601.)
    """
    ns = len(xs)
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)
    _, lin = jax.linearize(step, tuple(xs), u)
    R = _mat(ns, ns)
    for j in range(ns):
        tang = tuple(ones if i == j else zeros for i in range(ns))
        col = lin(tang, zeros)
        for i in range(ns):
            R[i][j] = col[i]
    Scol = lin(tuple(zeros for _ in range(ns)), ones)
    S = [Scol[i] for i in range(ns)]
    return R, S


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _read_mat(ref, t, n, m):
    return [[ref[t, i, j, 0] for j in range(m)] for i in range(n)]


def _read_vec(ref, t, n):
    return [ref[t, i, 0] for i in range(n)]


def _make_kernel(*, T, ns, has_bounds, soa_step, n_params,
                 lqr_iter, eps, best_cost_eps, not_improved_lim,
                 linesearch_decay, max_linesearch_iter,
                 cost_smem=False, bounds_scalar=False):
    ntau = ns + 1
    alphas = [linesearch_decay ** k for k in range(max_linesearch_iter)]

    def kernel(params_ref, C_ref, c_ref, x0_ref, u0_ref, lb_ref, ub_ref,
               xout_ref, uout_ref, stats_ref):
        params = tuple(params_ref[0, k] for k in range(n_params))
        step = lambda xs, u: soa_step(xs, u, params)

        x0 = [x0_ref[i, 0] for i in range(ns)]
        u0 = [u0_ref[t, 0, 0] for t in range(T)]
        if cost_smem:
            # batch-shared quadratic cost: scalars from SMEM, broadcast
            # lazily against the lane vectors (saves the [T, B, n, n]
            # materialization + relayout + VMEM streaming entirely)
            C = [[[C_ref[t, i * ntau + j] for j in range(ntau)]
                  for i in range(ntau)] for t in range(T)]
            c = [[c_ref[t, i] for i in range(ntau)] for t in range(T)]
        else:
            C = [_read_mat(C_ref, t, ntau, ntau) for t in range(T)]
            c = [_read_vec(c_ref, t, ntau) for t in range(T)]
        if has_bounds:
            if bounds_scalar:
                lb = [lb_ref[0, 0] for _ in range(T)]
                ub = [ub_ref[0, 1] for _ in range(T)]
            else:
                lb = [lb_ref[t, 0, 0] for t in range(T)]
                ub = [ub_ref[t, 0, 0] for t in range(T)]

        # derive the loop-carry constants from loaded data: literal
        # constants get a lane-replicated register layout, and Mosaic
        # cannot reconcile that with the computed (non-replicated) loop
        # body outputs at the fori_loop carry join.
        zero = x0[0] * 0.0
        one = zero + 1.0
        big = zero + jnp.float32(3.0e38)

        def rollout_init(u_seq):
            xs = [x0]
            for t in range(T - 1):
                xs.append(list(step(tuple(xs[t]), u_seq[t])))
            return xs

        def traj_cost(x_seq, u_seq):
            acc = 0.0
            for t in range(T):
                acc = acc + _quad_lin_cost(C[t], c[t], x_seq[t] + [u_seq[t]])
            return acc

        x_init_traj = rollout_init(u0)

        def outer(it, s):
            (x, u, best_x, best_u, best_cost, best_du, cur_du,
             nni, n_qp, alpha_sel, active_f, n_it) = s
            active = active_f > 0.5

            # ---- linearize + Taylor-recentred linear term ----------------
            # (reference mpc/mpc.py:255 + mpc/lqr_step.py:284-295)
            F = []          # F[t] = [R S]  [ns][ntau]
            for t in range(T - 1):
                R, S = _linearize(step, x[t], u[t])
                F.append([[R[i][j] for j in range(ns)] + [S[i]]
                          for i in range(ns)])
            cb = []
            for t in range(T):
                tau = x[t] + [u[t]]
                cb.append([
                    sum(C[t][i][j] * tau[j] for j in range(ntau)) + c[t][i]
                    for i in range(ntau)])

            # ---- Riccati backward recursion ------------------------------
            # (reference mpc/lqr_step.py:52-160; delta-space gains)
            K = [None] * T      # K[t][j], j in ns   (n_ctrl == 1)
            k = [None] * T
            Vm = None           # cost-to-go quadratic  [ns][ns]
            vv = None
            qp_cnt = 0.0
            for t in range(T - 1, -1, -1):
                if t == T - 1:
                    Qt = C[t]
                    qt = cb[t]
                else:
                    Ft = F[t]
                    # W = V @ F  -> [ns][ntau]
                    W = _mat(ns, ntau)
                    for i in range(ns):
                        for j in range(ntau):
                            W[i][j] = sum(Vm[i][kk] * Ft[kk][j]
                                          for kk in range(ns))
                    Qt = _mat(ntau, ntau)
                    for a in range(ntau):
                        for b in range(a, ntau):
                            Qt[a][b] = C[t][a][b] + sum(
                                Ft[kk][a] * W[kk][b] for kk in range(ns))
                            Qt[b][a] = Qt[a][b]
                    qt = [cb[t][a] + sum(Ft[kk][a] * vv[kk]
                                         for kk in range(ns))
                          for a in range(ntau)]

                Quu = Qt[ns][ns]
                qu = qt[ns]
                inv_quu = 1.0 / Quu
                kt_free = -qu * inv_quu
                if has_bounds:
                    # closed-form 1-D box QP on the delta control
                    # (ops/pnqp.py:pnqp_1d; reference mpc/lqr_step.py:128-148)
                    lo = lb[t] - u[t]
                    hi = ub[t] - u[t]
                    kt = jnp.clip(kt_free, lo, hi)
                    g = Quu * kt + qu
                    clamped = ((kt == lo) & (g > 0)) | ((kt == hi) & (g < 0))
                    Kt = [jnp.where(clamped, 0.0, -Qt[ns][j] * inv_quu)
                          for j in range(ns)]
                    qp_cnt = qp_cnt + 1.0
                else:
                    kt = kt_free
                    Kt = [-Qt[ns][j] * inv_quu for j in range(ns)]
                K[t] = Kt
                k[t] = kt

                # cost-to-go update (reference mpc/lqr_step.py:155-158)
                Vn = _mat(ns, ns)
                for i in range(ns):
                    for j in range(i, ns):
                        Vn[i][j] = (Qt[i][j] + Qt[i][ns] * Kt[j]
                                    + Kt[i] * Qt[ns][j]
                                    + Kt[i] * Quu * Kt[j])
                        Vn[j][i] = Vn[i][j]
                vn = [qt[i] + Qt[i][ns] * kt + Kt[i] * qu
                      + Kt[i] * Quu * kt for i in range(ns)]
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
                    ut = (sum(K[t][j] * dxt[j] for j in range(ns))
                          + u[t] + a * k[t])
                    if has_bounds:
                        ut = jnp.clip(ut, lb[t], ub[t])
                    nu.append(ut)
                    cost_a = cost_a + _quad_lin_cost(C[t], c[t],
                                                     nx[t] + [ut])
                    if t < T - 1:
                        nx.append(list(step(tuple(nx[t]), ut)))
                if ki == 0:
                    du2 = 0.0
                    for t in range(T):
                        d = u[t] - nu[t]
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
                    sel_u = [jnp.where(take, nu[t], sel_u[t])
                             for t in range(T)]
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

            def upd_traj(new, old):
                return [[jnp.where(active, new[t][i], old[t][i])
                         for i in range(len(new[t]))] for t in range(T)]

            x_new = upd_traj(sel_x, x)
            u_new = [jnp.where(active, sel_u[t], u[t]) for t in range(T)]
            best_x_new = [[jnp.where(take_best, sel_x[t][i], best_x[t][i])
                           for i in range(ns)] for t in range(T)]
            best_u_new = [jnp.where(take_best, sel_u[t], best_u[t])
                          for t in range(T)]
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
            list(u0),
            x_init_traj,
            list(u0),
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
            uout_ref[t, 0, 0] = best_u[t]
        stats_ref[0, 0] = best_cost
        stats_ref[1, 0] = best_du
        stats_ref[2, 0] = n_it
        stats_ref[3, 0] = n_qp
        stats_ref[4, 0] = alpha

    return kernel


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _to_lanes(a, B, G):
    """[.., B, ..] with batch LAST -> [.., G, 8, 128]."""
    return a.reshape(a.shape[:-1] + (G, SUB, LANE))


def fused_batched_solve(cfg, x_init, cost: QuadCost, dynamics,
                        u_init=None, u_lower=None, u_upper=None,
                        interpret: bool = False) -> Solution:
    """Batched solve through the fused kernel.

    Layouts match learning.batched_solve: x_init [B, ns]; bounds/u_init
    time-major [T, B, ...].  The cost may be batched ([T, B, n, n] -
    streamed through VMEM) or batch-shared ([T, n, n] / [n, n] - kept in
    SMEM as scalars, skipping the broadcast + relayout + streaming).
    Scalar (0-d) bounds likewise ride SMEM.  Returns a batched Solution
    (out_axes matching the vmapped path).
    """
    T, ns = cfg.T, cfg.n_state
    ntau = ns + 1
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
        return _to_lanes(a, Bp, G)

    Ca = jnp.asarray(cost.C, dtype)
    ca = jnp.asarray(cost.c, dtype)
    cost_smem = Ca.ndim < 4
    if cost_smem:
        C = jnp.broadcast_to(Ca, (T, ntau, ntau)).reshape(T, ntau * ntau)
        c = jnp.broadcast_to(ca, (T, ntau))
    else:
        C = prep(Ca, 1)                    # [T, ntau, ntau, G, 8, 128]
        c = prep(ca, 1)                    # [T, ntau, G, 8, 128]
    x0 = prep(x_init, 0)                   # [ns, G, 8, 128]
    if u_init is None:
        u0 = jnp.zeros((T, 1, G, SUB, LANE), dtype)
    else:
        u0 = prep(u_init, 1)
    bounds_scalar = has_bounds and jnp.ndim(u_lower) == 0
    if bounds_scalar:
        lb = jnp.asarray(u_lower, dtype).reshape(1, 1)
        lb = jnp.concatenate(
            [lb, jnp.asarray(u_upper, dtype).reshape(1, 1)], axis=1)
        ub = lb
    elif has_bounds:
        lb = prep(u_lower, 1)
        ub = prep(u_upper, 1)
    else:
        lb = jnp.zeros((T, 1, G, SUB, LANE), dtype)
        ub = lb

    plist = list(dynamics.soa_params())
    n_params = len(plist)
    params = (jnp.stack([jnp.asarray(p, dtype) for p in plist])[None]
              if n_params else jnp.zeros((1, 1), dtype))

    kernel = _make_kernel(
        T=T, ns=ns, has_bounds=has_bounds,
        soa_step=dynamics.soa_step, n_params=n_params,
        lqr_iter=cfg.lqr_iter, eps=float(cfg.eps),
        best_cost_eps=float(cfg.best_cost_eps),
        not_improved_lim=float(cfg.not_improved_lim),
        linesearch_decay=float(cfg.linesearch_decay),
        max_linesearch_iter=int(cfg.max_linesearch_iter),
        cost_smem=cost_smem, bounds_scalar=bounds_scalar)

    def spec(block, imap):
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    def smem(block):
        return pl.BlockSpec(block, lambda g: tuple(0 for _ in block),
                            memory_space=pltpu.SMEM)

    g6 = lambda g: (0, 0, 0, g, 0, 0)
    g5 = lambda g: (0, 0, g, 0, 0)
    g4 = lambda g: (0, g, 0, 0)

    if cost_smem:
        C_spec = smem((T, ntau * ntau))
        c_spec = smem((T, ntau))
    else:
        C_spec = spec((T, ntau, ntau, 1, SUB, LANE), g6)
        c_spec = spec((T, ntau, 1, SUB, LANE), g5)
    if bounds_scalar:
        b_specs = [smem((1, 2)), smem((1, 2))]
    else:
        b_specs = [spec((T, 1, 1, SUB, LANE), g5),
                   spec((T, 1, 1, SUB, LANE), g5)]

    xs, us, stats = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            smem((1, max(1, n_params))),
            C_spec,
            c_spec,
            spec((ns, 1, SUB, LANE), g4),
            spec((T, 1, 1, SUB, LANE), g5),
            b_specs[0],
            b_specs[1],
        ],
        out_specs=[
            spec((T, ns, 1, SUB, LANE), g5),
            spec((T, 1, 1, SUB, LANE), g5),
            spec((5, 1, SUB, LANE), lambda g: (0, g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, ns, G, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((T, 1, G, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((5, G, SUB, LANE), dtype),
        ],
        interpret=interpret,
    )(params, C, c, x0, u0, lb, ub)

    def unprep(a, batch_axis):
        a = a.reshape(a.shape[:-3] + (Bp,))
        a = jnp.moveaxis(a, -1, batch_axis)
        idx = [slice(None)] * a.ndim
        idx[batch_axis] = slice(0, B)
        return a[tuple(idx)]

    x = unprep(xs, 1)               # [T, B, ns]
    u = unprep(us, 1)               # [T, B, 1]
    st = unprep(stats, 1)           # [5, B]
    best_cost, best_du, n_it, n_qp, alpha = (st[i] for i in range(5))
    return Solution(
        x=x, u=u, costs=best_cost, full_du_norm=best_du,
        n_iter=n_it.astype(jnp.int32), n_qp_iter=n_qp.astype(jnp.int32),
        converged=best_du < cfg.eps, mean_alpha=alpha)
