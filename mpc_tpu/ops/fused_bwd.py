"""Fused KKT-backward kernel (Pallas, TPU).

The differentiable-MPC backward pass (ops/diff.py, the re-design of the
reference's ``LQRStepFn.backward``, mpc/lqr_step.py:311-407) is a chain
of ~10^2 small batched XLA ops per solve: a differential Riccati solve
on (C, -r) with the active set pinned to zero, a rollout of the
differentials, a reverse costate recursion, and gradient outer
products.  At imitation-learning batch sizes this is dispatch/HBM
bound, exactly like the forward iLQR loop was before ops/fused.py -
and unlike the forward, the backward has NO line search, NO inner QP
and NO outer iteration, so the whole thing fuses into one short
batch-in-lanes kernel.

Semantics match ``make_lqr_fixed_point``'s bwd exactly, with the same
documented deviation as the forward kernel: the unconstrained
multi-control solve uses Cholesky (jitter 1e-11) instead of the
reference's per-example pinverse.  The active-set mask is computed by
the caller (float, 1.0 = control pinned), so bounds never enter the
kernel.

Layouts mirror the forward kernel: operands may be batched time-major
([T, B, ...], laid on the lanes - a tile of SUB*LANE examples per grid
program) or BATCH-SHARED ([T, ...]), in which case they ride SMEM as
scalars and - crucially - their gradients are REDUCED over the batch
IN-KERNEL: the dC/dc/dF/df outputs are ONE small SMEM block whose
index map is constant in the grid axis, so the block stays resident
while the (sequential) grid programs accumulate their tile sums into
it - the canonical Pallas reduction-axis pattern.  (A per-program
``(1, N)`` SMEM output block would violate Mosaic's block-shape rules
for G > 1.)  This removes the [T, B, ntau, ntau] HBM materializations
(batched primal broadcast + per-example cotangents + XLA's reduction)
that the batched-only layout paid for batch-shared costs/dynamics -
the same HBM blowup the forward kernel's SMEM fast path engineered
away.  Cotangents (dl_dx, dl_du) are ZERO-padded to the tile, which
makes every padded lane's contribution to the reduced sums exactly
zero (the whole differential system is linear in r).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import (LANE, SUB, _chol_solve, _cholesky, _masked_free_chol,
                    _mat, _smem, _vmem)

# conservative VMEM budget for the unrolled backward kernel (inputs +
# outputs + live intermediates per batch tile)
_BWD_VMEM_LIMIT = 11 * 2 ** 20

# unrolled-kernel instruction-volume budget (mirrors the forward's
# _UNROLL_VOLUME_LIMIT, ops/fused.py): past this the three horizon
# passes route through the fori-loop kernel (_make_bwd_kernel_long),
# whose compile time is T-independent
_BWD_UNROLL_VOLUME = 8_000

# VMEM budget for the fori-loop backward kernel: per-t scratch for the
# gains (Riccati -> rollout handoff) and differentials (rollout ->
# costate handoff) plus constant-size 2-slot stream buffers
_BWD_LONG_VMEM_LIMIT = 13 * 2 ** 20


def _bwd_vmem_bytes(T, ns, nc, cost_shared=False, dyn_shared=False):
    ntau = ns + nc
    tiles = (
        2 * T * ntau                      # r (dl_dx+dl_du), dxu scratch
        + T * (ns + nc) * 2               # x*, u*, dx, du
        + T * nc                          # I mask
        + T * nc * (ns + 1)               # K, k gain lists (full horizon)
        + 2 * T * ns                      # lams, dlams (consumed by dF)
        + ns                              # dx_init
        + 4 * ns * ns                     # V/Q working set slack
    )
    if not cost_shared:
        tiles += 2 * T * (ntau * ntau + ntau)     # C, c in + dC, dc out
    if not dyn_shared:
        tiles += 2 * (T - 1) * (ns * ntau + ns)   # F in + dF, df out
    return tiles * SUB * LANE * 4


def supports_bwd(T, ns, nc, dtype, cost_shared=False,
                 dyn_shared=False) -> bool:
    """Static dispatch check for the fused backward.  Batch-shared
    cost/dynamics ride SMEM and their gradients reduce in-kernel, so
    they do not count against the VMEM budget (extending the T reach
    well past the all-batched layout's)."""
    return (dtype == jnp.float32
            and _bwd_vmem_bytes(T, ns, nc, cost_shared,
                                dyn_shared) <= _BWD_VMEM_LIMIT)


def _make_bwd_kernel(*, T, ns, nc, has_I, has_f, cost_shared,
                     dyn_shared):
    ntau = ns + nc

    def kernel(C_ref, c_ref, F_ref, rx_ref, ru_ref, x_ref, u_ref, I_ref,
               dxi_ref, dC_ref, dc_ref, dF_ref, df_ref):
        gi = pl.program_id(0)

        def acc(ref, idx, val):
            """Accumulate a reduced (scalar) gradient into the shared
            SMEM output block across sequential grid programs."""
            ref[idx, 0] = jnp.where(gi == 0, val, ref[idx, 0] + val)

        if cost_shared:
            # batch-shared quadratic model: scalars from SMEM (no
            # broadcast / VMEM streaming), like the forward kernel
            C = [[[C_ref[t, i * ntau + j] for j in range(ntau)]
                  for i in range(ntau)] for t in range(T)]
            cv = [[c_ref[t, i] for i in range(ntau)] for t in range(T)]
        else:
            C = [[[C_ref[t, i, j, 0] for j in range(ntau)]
                  for i in range(ntau)] for t in range(T)]
            cv = [[c_ref[t, i, 0] for i in range(ntau)]
                  for t in range(T)]
        if dyn_shared:
            Fm = [[[F_ref[t, i * ntau + j] for j in range(ntau)]
                   for i in range(ns)] for t in range(T - 1)]
        else:
            Fm = [[[F_ref[t, i, j, 0] for j in range(ntau)]
                   for i in range(ns)] for t in range(T - 1)]
        r = [[rx_ref[t, i, 0] for i in range(ns)]
             + [ru_ref[t, m, 0] for m in range(nc)] for t in range(T)]
        xs = [[x_ref[t, i, 0] for i in range(ns)] for t in range(T)]
        us = [[u_ref[t, m, 0] for m in range(nc)] for t in range(T)]
        if has_I:
            Iz = [[I_ref[t, m, 0] for m in range(nc)] for t in range(T)]

        zero = xs[0][0] * 0.0

        # ---- differential Riccati on (C, -r), active set pinned ------
        # (reference mpc/lqr_step.py:327-340 via ops/lqr.py:lqr_solve)
        K = [None] * T
        k = [None] * T
        Vm = None
        vv = None
        for t in range(T - 1, -1, -1):
            if t == T - 1:
                Qt = C[t]
                qt = [-r[t][a] for a in range(ntau)]
            else:
                Ft = Fm[t]
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
                qt = [-r[t][a] + sum(Ft[kk][a] * vv[kk]
                                     for kk in range(ns))
                      for a in range(ntau)]

            Quu = [[Qt[ns + i][ns + j] for j in range(nc)]
                   for i in range(nc)]
            Qux = [[Qt[ns + i][j] for j in range(ns)]
                   for i in range(nc)]
            qu = [qt[ns + i] for i in range(nc)]

            if has_I:
                free = [(Iz[t][i] + zero) < 0.5 for i in range(nc)]
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
                cols = [_chol_solve(L, [Qux[i][j] for i in range(nc)],
                                    nc)
                        for j in range(ns)]
                Kt = [[-cols[j][i] for j in range(ns)]
                      for i in range(nc)]
            K[t] = Kt
            k[t] = kt

            # cost-to-go update
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
            Vm, vv = Vn, vn

        # ---- differential rollout (dx_0 = 0) -------------------------
        dx = [[zero for _ in range(ns)]]
        du = []
        for t in range(T):
            dut = []
            for m in range(nc):
                v = sum(K[t][m][j] * dx[t][j] for j in range(ns)) \
                    + k[t][m]
                if has_I:
                    v = jnp.where((Iz[t][m] + zero) > 0.5, 0.0, v)
                dut.append(v)
            du.append(dut)
            if t < T - 1:
                dxu = dx[t] + dut
                dx.append([
                    sum(Fm[t][i][j] * dxu[j] for j in range(ntau))
                    for i in range(ns)])

        # ---- dC, dc --------------------------------------------------
        # dC_t = -1/2 (dxu (x) xu + xu (x) dxu); dc = -dxu
        # (reference mpc/lqr_step.py:346-353).  Batch-shared primal:
        # reduce over the tile in-kernel (padded lanes contribute
        # exactly zero - their r is zero-padded and the differential
        # system is linear in r).
        for t in range(T):
            dxu = dx[t] + du[t]
            xu = xs[t] + us[t]
            for i in range(ntau):
                if cost_shared:
                    acc(dc_ref, t * ntau + i, jnp.sum(-dxu[i]))
                else:
                    dc_ref[t, i, 0] = -dxu[i]
                for j in range(ntau):
                    g = -0.5 * (dxu[i] * xu[j] + xu[i] * dxu[j])
                    if cost_shared:
                        acc(dC_ref, (t * ntau + i) * ntau + j, jnp.sum(g))
                    else:
                        dC_ref[t, i, j, 0] = g

        # ---- costate recursions (reverse time) -----------------------
        # (reference mpc/lqr_step.py:355-385)
        lam_next = None
        dlam_next = None
        lams = [None] * T
        dlams = [None] * T
        for t in range(T - 1, -1, -1):
            lam = [sum(C[t][i][j] * xs[t][j] for j in range(ns))
                   + sum(C[t][i][ns + m] * us[t][m] for m in range(nc))
                   + cv[t][i] for i in range(ns)]
            dlam = [sum(C[t][i][j] * dx[t][j] for j in range(ns))
                    + sum(C[t][i][ns + m] * du[t][m] for m in range(nc))
                    - r[t][i] for i in range(ns)]
            if t < T - 1:
                lam = [lam[i] + sum(Fm[t][kk][i] * lam_next[kk]
                                    for kk in range(ns))
                       for i in range(ns)]
                dlam = [dlam[i] + sum(Fm[t][kk][i] * dlam_next[kk]
                                      for kk in range(ns))
                        for i in range(ns)]
            lams[t] = lam
            dlams[t] = dlam
            lam_next, dlam_next = lam, dlam

        # ---- dF, df, dx_init ----------------------------------------
        # (reference mpc/lqr_step.py:387-404)
        for t in range(T - 1):
            xu = xs[t] + us[t]
            dxu = dx[t] + du[t]
            for i in range(ns):
                gf = (-dlams[t + 1][i]) if has_f else zero
                if dyn_shared:
                    acc(df_ref, t * ns + i, jnp.sum(gf))
                else:
                    df_ref[t, i, 0] = gf
                for j in range(ntau):
                    g = -(dlams[t + 1][i] * xu[j]
                          + lams[t + 1][i] * dxu[j])
                    if dyn_shared:
                        acc(dF_ref, (t * ns + i) * ntau + j, jnp.sum(g))
                    else:
                        dF_ref[t, i, j, 0] = g
        for i in range(ns):
            dxi_ref[i, 0] = -dlams[0][i]

    return kernel


def fused_kkt_backward(n_state, C, c, F, x_star, u_star, dl_dx, dl_du,
                       I_mask=None, has_f: bool = True,
                       interpret: bool = False):
    """Batched KKT backward through the fused kernel.

    Layouts: C [T, B, ntau, ntau] or batch-shared [T, ntau, ntau]
    (likewise c, F); x*/dl_dx [T, B, ns], u*/dl_du [T, B, nc], I_mask
    None or [T, B, nc] (bool/float, truthy = active/pinned).  Returns
    (dx_init [B, ns], dC, dc, dF, df) with layouts matching the
    inputs: per-example for batched primals, REDUCED over the batch
    (accumulated in-kernel across the sequential grid programs) for
    batch-shared primals.
    """
    T = x_star.shape[0]
    B = x_star.shape[1]
    ns = n_state
    nc = u_star.shape[2]
    ntau = ns + nc
    dtype = jnp.float32

    cost_shared = jnp.ndim(C) == 3
    dyn_shared = jnp.ndim(F) == 3

    G = -(-B // (SUB * LANE))
    Bp = G * SUB * LANE
    pad = Bp - B

    def prep(a, zero_pad=False):
        a = jnp.asarray(a, dtype)
        if pad:
            widths = [(0, 0)] * a.ndim
            widths[1] = (0, pad)
            a = jnp.pad(a, widths,
                        mode='constant' if zero_pad else 'edge')
        a = jnp.moveaxis(a, 1, -1)
        return a.reshape(a.shape[:-1] + (G, SUB, LANE))

    if cost_shared:
        Cv = jnp.asarray(C, dtype).reshape(T, ntau * ntau)
        cvv = jnp.asarray(c, dtype)
        C_spec = _smem((T, ntau * ntau))
        c_spec = _smem((T, ntau))
        # batch-reduced gradients: ONE resident SMEM block (index map
        # constant in g) accumulated across the sequential grid
        dC_spec = pl.BlockSpec((T * ntau * ntau, 1), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dc_spec = pl.BlockSpec((T * ntau, 1), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dC_shape = jax.ShapeDtypeStruct((T * ntau * ntau, 1), dtype)
        dc_shape = jax.ShapeDtypeStruct((T * ntau, 1), dtype)
    else:
        Cv = prep(C)
        cvv = prep(c)
        C_spec = _vmem((T, ntau, ntau, 1, SUB, LANE), 3)
        c_spec = _vmem((T, ntau, 1, SUB, LANE), 2)
        dC_spec = _vmem((T, ntau, ntau, 1, SUB, LANE), 3)
        dc_spec = _vmem((T, ntau, 1, SUB, LANE), 2)
        dC_shape = jax.ShapeDtypeStruct((T, ntau, ntau, G, SUB, LANE),
                                        dtype)
        dc_shape = jax.ShapeDtypeStruct((T, ntau, G, SUB, LANE), dtype)
    if dyn_shared:
        Fv = jnp.asarray(F, dtype).reshape(T - 1, ns * ntau)
        F_spec = _smem((T - 1, ns * ntau))
        dF_spec = pl.BlockSpec(((T - 1) * ns * ntau, 1),
                               lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        df_spec = pl.BlockSpec(((T - 1) * ns, 1), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dF_shape = jax.ShapeDtypeStruct(((T - 1) * ns * ntau, 1), dtype)
        df_shape = jax.ShapeDtypeStruct(((T - 1) * ns, 1), dtype)
    else:
        Fv = prep(F)
        F_spec = _vmem((T - 1, ns, ntau, 1, SUB, LANE), 3)
        dF_spec = _vmem((T - 1, ns, ntau, 1, SUB, LANE), 3)
        df_spec = _vmem((T - 1, ns, 1, SUB, LANE), 2)
        dF_shape = jax.ShapeDtypeStruct((T - 1, ns, ntau, G, SUB, LANE),
                                        dtype)
        df_shape = jax.ShapeDtypeStruct((T - 1, ns, G, SUB, LANE),
                                        dtype)

    has_I = I_mask is not None
    Iv = (prep(jnp.asarray(I_mask).astype(dtype)) if has_I
          else jnp.zeros((1, 1), dtype))
    I_spec = (_vmem((T, nc, 1, SUB, LANE), 2) if has_I else _smem((1, 1)))

    kernel = _make_bwd_kernel(T=T, ns=ns, nc=nc, has_I=has_I,
                              has_f=has_f, cost_shared=cost_shared,
                              dyn_shared=dyn_shared)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            C_spec,
            c_spec,
            F_spec,
            _vmem((T, ns, 1, SUB, LANE), 2),
            _vmem((T, nc, 1, SUB, LANE), 2),
            _vmem((T, ns, 1, SUB, LANE), 2),
            _vmem((T, nc, 1, SUB, LANE), 2),
            I_spec,
        ],
        out_specs=[
            _vmem((ns, 1, SUB, LANE), 1),
            dC_spec,
            dc_spec,
            dF_spec,
            df_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, G, SUB, LANE), dtype),
            dC_shape,
            dc_shape,
            dF_shape,
            df_shape,
        ],
        interpret=interpret,
    )(Cv, cvv, Fv, prep(dl_dx, zero_pad=True),
      prep(dl_du, zero_pad=True), prep(x_star), prep(u_star), Iv)

    def unprep(a, batch_axis):
        a = a.reshape(a.shape[:-3] + (Bp,))
        a = jnp.moveaxis(a, -1, batch_axis)
        idx = [slice(None)] * a.ndim
        idx[batch_axis] = slice(0, B)
        return a[tuple(idx)]

    dxi, dC, dc, dF, df = outs
    dxi = unprep(dxi, 0)
    if cost_shared:
        dC = dC.reshape(T, ntau, ntau)
        dc = dc.reshape(T, ntau)
    else:
        dC = unprep(dC, 1)
        dc = unprep(dc, 1)
    if dyn_shared:
        dF = dF.reshape(T - 1, ns, ntau)
        df = df.reshape(T - 1, ns)
    else:
        dF = unprep(dF, 1)
        df = unprep(df, 1)
    return dxi, dC, dc, dF, df


def make_batched_fixed_point(n_state: int, has_bounds: bool,
                             has_f: bool, interpret: bool = False):
    """Batched analog of ``diff.make_lqr_fixed_point`` whose backward
    runs the fused kernel over the whole [T, B, ...] batch at once
    instead of a vmapped chain of small XLA ops.

    Same contract: forward is a pass-through of the converged
    (stop-gradiented) trajectory; gradients flow to x_init, C, c, F, f.
    C/c/F/f may be batched [T, B, ...] or batch-shared [T, ...] - the
    cotangents match the primal layout (batch-shared primals get the
    batch-REDUCED gradient straight from the kernel, skipping the
    [T, B, ...] materialization entirely).
    """
    from .diff import ACTIVE_TOL

    @jax.custom_vjp
    def fixed_point(x_init, C, c, F, f, u_lower, u_upper, x_star,
                    u_star):
        return x_star, u_star

    def fwd(x_init, C, c, F, f, u_lower, u_upper, x_star, u_star):
        res = (C, c, F, u_lower, u_upper, x_star, u_star)
        return (x_star, u_star), res

    def bwd(res, g):
        C, c, F, u_lower, u_upper, x_star, u_star = res
        dl_dx, dl_du = g
        if has_bounds:
            I = ((jnp.abs(u_star - u_lower) <= ACTIVE_TOL) |
                 (jnp.abs(u_star - u_upper) <= ACTIVE_TOL))
        else:
            I = None
        dxi, dC, dc, dF, df = fused_kkt_backward(
            n_state, C, c, F, x_star, u_star, dl_dx, dl_du,
            I_mask=I, has_f=has_f, interpret=interpret)
        return (dxi, dC, dc, dF, df,
                jnp.zeros_like(u_lower), jnp.zeros_like(u_upper),
                jnp.zeros_like(x_star), jnp.zeros_like(u_star))

    fixed_point.defvjp(fwd, bwd)
    return fixed_point
