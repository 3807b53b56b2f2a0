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
from jax import lax
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

# VMEM budget for the fori-loop backward kernel (see
# _bwd_long_vmem_bytes).  Round-4 calibration: with the raised
# scoped-VMEM stack (_BWD_LONG_SCOPED_VMEM; Mosaic's default was 16MB)
# the batched-layout medium-ntau configs lower and run - 16s/4c T=20
# at G=3 measured an 18.3MB actual stack against a 14.7MB estimate
# (the ~3.6MB gap is ntau^2-register spill), ran correct vs the jnp
# backward, and beat it 1.19-2.14x across ntau 8-20
# (BASELINE.md round-4).  24MB kept ntau<=23 batched T=20 admitted
# with the spill gap + G>1 margin under the 40MB requested stack.
# Round-5 (after the forward body gate moved to ntau<=28): 24s/4c
# batched T=20 (est 25.3MB) probed on hardware - lowers, runs, and
# matches the f64 vjp oracle to 3-6e-7 on all five gradients; the
# newly-reachable batched T=1600 pendulum shape (est 25.4MB) likewise
# ran and matched the precision-pinned jnp phase 2 to 1e-5.  The limit
# moved just past those validated estimates; ntau=29+ is rejected by
# the forward body gate before this limit is consulted.  (Per-call
# WALL timings at these shapes are tunnel-launch-noise dominated -
# 0.2ms to 500ms for identical calls - so fused-vs-jnp phase-2 timing
# claims here come only from the controlled round-4 harness,
# 1.19-2.14x across ntau 8-23.)
_BWD_LONG_VMEM_LIMIT = 26 * 2 ** 20

# SMEM rows (each padded to 512 bytes by Mosaic) available to the
# shared-layout operands + reduced-gradient outputs; TPU SMEM is 1MB
_BWD_SMEM_ROW_LIMIT = 1800

# scoped-VMEM limit requested for the fori-loop backward kernel:
# Mosaic's default is 16MB, but v5e VMEM is 128MB - raising it admits
# the medium-ntau batched layouts (whose stack, dominated by the
# ntau^2-register Riccati working set plus stream buffers, measured
# 18.3MB at 16s/4c T=20 on hardware)
_BWD_LONG_SCOPED_VMEM = 40 * 2 ** 20


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


def _bwd_long_vmem_bytes(T, ns, nc, cost_shared=False, dyn_shared=False):
    """VMEM working set of the fori-loop backward kernel: per-t scratch
    (K, k for the Riccati->rollout handoff; the rollout->costate
    differentials dx/du ALIAS into the consumed K/k rows, so they cost
    nothing) plus constant-size 2-slot DMA stream buffers (the (C|c)
    in-stream buffer doubles as the (dC|dc) out-stream buffer — they
    are live in disjoint passes)."""
    ntau = ns + nc
    tiles = T * (nc * ns + nc)
    R = 2 * ntau + nc                       # packed rx|ru|x|u|I rows
    const = 2 * R
    if not cost_shared:
        const += 2 * (ntau + 1) * ntau      # shared (C|c)-in / (dC|dc)-out
    if not dyn_shared:
        const += 2 * ns * ntau + 2 * ns * (ntau + 1)   # F in + (dF|df) out
    return (tiles + const) * SUB * LANE * 4


def _bwd_route_long(T, ns, nc, cost_shared=False, dyn_shared=False):
    """Whether fused_kkt_backward dispatches to the fori-loop kernel
    (mirrors the forward's unroll-volume + VMEM routing)."""
    ntau = ns + nc
    return (T * ntau ** 3 > _BWD_UNROLL_VOLUME
            or _bwd_vmem_bytes(T, ns, nc, cost_shared,
                               dyn_shared) > _BWD_VMEM_LIMIT)


def supports_bwd(T, ns, nc, dtype, cost_shared=False,
                 dyn_shared=False) -> bool:
    """Static dispatch check for the fused backward.  Batch-shared
    cost/dynamics ride SMEM and their gradients reduce in-kernel, so
    they do not count against the VMEM budget (extending the T reach
    well past the all-batched layout's).  Past the unrolled kernel's
    instruction-volume/VMEM budget the fori-loop kernel
    (_make_bwd_kernel_long) takes over, bounded only by its per-t
    scratch - matching the forward long kernel's horizon reach."""
    if dtype != jnp.float32:
        return False
    if not _bwd_route_long(T, ns, nc, cost_shared, dyn_shared):
        return True
    if T < 2:
        return False
    smem_rows = (4 * T if cost_shared else 0) \
        + (3 * (T - 1) if dyn_shared else 0)
    return (smem_rows <= _BWD_SMEM_ROW_LIMIT
            and _bwd_long_vmem_bytes(T, ns, nc, cost_shared,
                                     dyn_shared) <= _BWD_LONG_VMEM_LIMIT)



def _bwd_ctrl_solve(Qt, qt, Iz_t, ns, nc, zero):
    """Differential control solve shared by the unrolled and fori-loop
    backward kernels: free / active-masked 1-D inverse or
    (masked-free) Cholesky over nested lists of lane registers
    (reference mpc/lqr_step.py:327-340).  ``Iz_t`` is None when there
    is no active-set mask.  Returns (kt, Kt)."""
    Quu = [[Qt[ns + i][ns + j] for j in range(nc)] for i in range(nc)]
    Qux = [[Qt[ns + i][j] for j in range(ns)] for i in range(nc)]
    qu = [qt[ns + i] for i in range(nc)]
    if Iz_t is not None:
        free = [(Iz_t[i] + zero) < 0.5 for i in range(nc)]
        if nc == 1:
            inv = 1.0 / Quu[0][0]
            kt = [jnp.where(free[0], -qu[0] * inv, 0.0)]
            Kt = [[jnp.where(free[0], -Qux[0][j] * inv, 0.0)
                   for j in range(ns)]]
        else:
            qu_m = [jnp.where(free[i], qu[i], 0.0) for i in range(nc)]
            L_f = _masked_free_chol(Quu, free, nc)
            kt = [-v for v in _chol_solve(L_f, qu_m, nc)]
            cols = [_chol_solve(
                L_f,
                [jnp.where(free[i], Qux[i][j], 0.0) for i in range(nc)],
                nc)
                for j in range(ns)]
            Kt = [[-cols[j][i] for j in range(ns)] for i in range(nc)]
    elif nc == 1:
        inv = 1.0 / Quu[0][0]
        kt = [-qu[0] * inv]
        Kt = [[-Qux[0][j] * inv for j in range(ns)]]
    else:
        L = _cholesky(Quu, nc, jitter=1e-11)
        kt = [-v for v in _chol_solve(L, qu, nc)]
        cols = [_chol_solve(L, [Qux[i][j] for i in range(nc)], nc)
                for j in range(ns)]
        Kt = [[-cols[j][i] for j in range(ns)] for i in range(nc)]
    return kt, Kt


def _bwd_vv_update(Qt, qt, Kt, kt, ns, nc):
    """Cost-to-go update of the differential Riccati recursion, shared
    by both backward kernels (reference mpc/lqr_step.py:155-158)."""
    Quu = [[Qt[ns + i][ns + j] for j in range(nc)] for i in range(nc)]
    qu = [qt[ns + i] for i in range(nc)]
    QK = _mat(ns, ns)
    for i in range(ns):
        for j in range(ns):
            QK[i][j] = sum(Qt[i][ns + m] * Kt[m][j] for m in range(nc))
    KQuu = _mat(nc, ns)
    for m in range(nc):
        for j in range(ns):
            KQuu[m][j] = sum(Quu[m][mm] * Kt[mm][j] for mm in range(nc))
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


def _prep_tile(a, batch_pad, G, dtype, zero_pad=False):
    """[*, B, *] -> [*, *, G, SUB, LANE] batch-tile layout (batch on
    axis 1), edge- or zero-padding the batch to full tiles."""
    a = jnp.asarray(a, dtype)
    if batch_pad:
        widths = [(0, 0)] * a.ndim
        widths[1] = (0, batch_pad)
        a = jnp.pad(a, widths, mode='constant' if zero_pad else 'edge')
    a = jnp.moveaxis(a, 1, -1)
    return a.reshape(a.shape[:-1] + (G, SUB, LANE))


def _unprep_tile(a, batch_axis, Bp, B):
    """Inverse of ``_prep_tile``: collapse (G, SUB, LANE) back to the
    batch axis and drop the padding."""
    a = a.reshape(a.shape[:-3] + (Bp,))
    a = jnp.moveaxis(a, -1, batch_axis)
    idx = [slice(None)] * a.ndim
    idx[batch_axis] = slice(0, B)
    return a[tuple(idx)]


def _make_bwd_kernel(*, T, ns, nc, has_I, has_f, cost_shared,
                     dyn_shared):
    ntau = ns + nc

    def kernel(C_ref, c_ref, F_ref, rx_ref, ru_ref, x_ref, u_ref, I_ref,
               dxi_ref, dC_ref, dc_ref, dF_ref, df_ref):
        gi = pl.program_id(0)

        def acc(ref, row, col, val):
            """Accumulate a reduced (scalar) gradient into the shared
            SMEM output block across sequential grid programs.  The
            block is (T, k)-shaped: SMEM rows are padded to 512 bytes,
            so the per-t gradient entries must share a row (a column
            layout blows the 1MB SMEM budget 128-fold)."""
            ref[row, col] = jnp.where(gi == 0, val, ref[row, col] + val)

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

            kt, Kt = _bwd_ctrl_solve(Qt, qt, Iz[t] if has_I else None,
                                     ns, nc, zero)
            K[t] = Kt
            k[t] = kt
            Vm, vv = _bwd_vv_update(Qt, qt, Kt, kt, ns, nc)

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
                    acc(dc_ref, t, i, jnp.sum(-dxu[i]))
                else:
                    dc_ref[t, i, 0] = -dxu[i]
                for j in range(ntau):
                    g = -0.5 * (dxu[i] * xu[j] + xu[i] * dxu[j])
                    if cost_shared:
                        acc(dC_ref, t, i * ntau + j, jnp.sum(g))
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
                    acc(df_ref, t, i, jnp.sum(gf))
                else:
                    df_ref[t, i, 0] = gf
                for j in range(ntau):
                    g = -(dlams[t + 1][i] * xu[j]
                          + lams[t + 1][i] * dxu[j])
                    if dyn_shared:
                        acc(dF_ref, t, i * ntau + j, jnp.sum(g))
                    else:
                        dF_ref[t, i, j, 0] = g
        for i in range(ns):
            dxi_ref[i, 0] = -dlams[0][i]

    return kernel


def _make_bwd_kernel_long(*, T, ns, nc, has_I, has_f, cost_shared,
                          dyn_shared):
    """Fori-loop variant of ``_make_bwd_kernel``: the three horizon
    passes (differential Riccati, differential rollout + dC/dc,
    costate recursion + dF/df) run as ``lax.fori_loop``s with the per-t
    state (gains K/k, differentials dx/du) in VMEM scratch, so T is
    bounded by the VMEM budget instead of Mosaic compile time -
    mirroring the forward kernel's ``_make_kernel_long``
    (ops/fused.py).  Semantics match the unrolled kernel exactly
    (same recursions and accumulation order; reference
    mpc/lqr_step.py:311-407).

    Batched per-t vectors (cotangents r = (dl_dx, dl_du), x*, u*, the
    active mask I) are packed into ONE HBM operand and DMA-streamed
    per t through a 2-slot double buffer (each pass starts the
    adjacent step's copy before waiting on the current one, exactly
    like the forward kernel's streams).  Batched (C|c) / F stream in
    the same way, and the per-example (dC|dc) / (dF|df) gradient
    slices stream OUT through 2-slot buffers (a slot's previous copy
    is waited two steps later, before the slot is rewritten).
    Batch-shared (C, c) / F stay in SMEM; their gradients accumulate
    into resident SMEM outputs across the sequential grid, exactly
    like the unrolled kernel.
    """
    ntau = ns + nc
    # packed vec rows: r = (rx | ru) at 0..ntau-1, x* at XO, u* at UO,
    # I at IO (present only when has_I)
    XO, UO, IO = ntau, ntau + ns, 2 * ntau

    def kernel(C_ref, c_ref, F_ref, vec_ref, dxi_ref, dC_ref, dc_ref,
               dF_ref, df_ref, K_ref, k_ref,
               vbuf_ref, vsem, *stream_refs):
        gi = pl.program_id(0)

        def acc(ref, row, col, val):
            """Accumulate a reduced (scalar) gradient into the shared
            (T, k)-shaped SMEM output block across the sequential
            grid programs (see the unrolled kernel's ``acc``)."""
            ref[row, col] = jnp.where(gi == 0, val, ref[row, col] + val)

        srefs = list(stream_refs)
        if not cost_shared:
            # ONE buffer serves the (C|c) in-stream (passes 1 and 3)
            # and the (dC|dc) out-stream (pass 2): pass 2 never reads
            # C, and every pass's copies are fully waited before the
            # next pass touches the slots
            Cbuf_ref, Csem, dCsem = srefs[:3]
            dCbuf_ref = Cbuf_ref
            srefs = srefs[3:]
        if not dyn_shared:
            Fbuf_ref, Fsem, dFbuf_ref, dFsem = srefs[:4]

        # ---- per-t streamed reads / SMEM reads ------------------------
        def vec_dma(t, slot):
            return pltpu.make_async_copy(
                vec_ref.at[gi, t], vbuf_ref.at[slot], vsem.at[slot])

        def vload(slot, base, n):
            return [vbuf_ref[slot, base + i] for i in range(n)]

        if cost_shared:
            def read_Cc(t):
                return ([[C_ref[t, i * ntau + j] for j in range(ntau)]
                         for i in range(ntau)],
                        [c_ref[t, i] for i in range(ntau)])
        else:
            def C_dma(t, slot):
                return pltpu.make_async_copy(
                    C_ref.at[gi, t], Cbuf_ref.at[slot], Csem.at[slot])

            def C_load(slot):
                return ([[Cbuf_ref[slot, i, j] for j in range(ntau)]
                         for i in range(ntau)],
                        [Cbuf_ref[slot, ntau, j] for j in range(ntau)])

            def dC_dma(t, slot):
                return pltpu.make_async_copy(
                    dCbuf_ref.at[slot], dC_ref.at[gi, t], dCsem.at[slot])

        if dyn_shared:
            def read_F(t):
                return [[F_ref[t, i * ntau + j] for j in range(ntau)]
                        for i in range(ns)]
        else:
            def F_dma(t, slot):
                return pltpu.make_async_copy(
                    F_ref.at[gi, t], Fbuf_ref.at[slot], Fsem.at[slot])

            def F_load(slot):
                return [[Fbuf_ref[slot, i, j] for j in range(ntau)]
                        for i in range(ns)]

            def dF_dma(t, slot):
                return pltpu.make_async_copy(
                    dFbuf_ref.at[slot], dF_ref.at[gi, t], dFsem.at[slot])

        # `zero` is defined right after the first vec wait in pass 1
        # (scratch may hold garbage, so it cannot seed a clean zero);
        # the closures below capture it through this mutable cell
        zc = []

        def zero():
            return zc[0]

        def write_gains(t, Kt, kt):
            for m in range(nc):
                k_ref[t, m] = kt[m] + zero()
                for j in range(ns):
                    K_ref[t, m * ns + j] = Kt[m][j] + zero()

        # ============ pass 1: differential Riccati (reverse) ===========
        vec_dma(T - 1, (T - 1) % 2).start()
        if not cost_shared:
            C_dma(T - 1, (T - 1) % 2).start()
        if T >= 2:
            vec_dma(T - 2, (T - 2) % 2).start()
            if not cost_shared:
                C_dma(T - 2, (T - 2) % 2).start()
            if not dyn_shared:
                F_dma(T - 2, (T - 2) % 2).start()

        sl = (T - 1) % 2
        vec_dma(T - 1, sl).wait()
        r_pe = vload(sl, 0, ntau)
        zc.append(r_pe[0] * 0.0)
        if cost_shared:
            Ct_pe, _ = read_Cc(T - 1)
        else:
            C_dma(T - 1, sl).wait()
            Ct_pe, _ = C_load(sl)
        qt_pe = [-r_pe[a] for a in range(ntau)]
        Iz_pe = vload(sl, IO, nc) if has_I else None
        kt, Kt = _bwd_ctrl_solve(Ct_pe, qt_pe, Iz_pe, ns, nc, zero())
        write_gains(T - 1, Kt, kt)
        V, v = _bwd_vv_update(Ct_pe, qt_pe, Kt, kt, ns, nc)
        # broadcast the peeled carry so the fori body's carry types are
        # uniform (shared-C unconstrained peels can stay 0-d otherwise)
        V = [[V[i][j] + zero() for j in range(ns)] for i in range(ns)]
        v = [vi + zero() for vi in v]

        def rstep(i, carry):
            V, v = carry
            t = T - 2 - i
            slot = lax.rem(t, 2)

            @pl.when(t >= 1)
            def _():
                vec_dma(t - 1, 1 - slot).start()
                if not cost_shared:
                    C_dma(t - 1, 1 - slot).start()
                if not dyn_shared:
                    F_dma(t - 1, 1 - slot).start()

            vec_dma(t, slot).wait()
            r_t = vload(slot, 0, ntau)
            Iz_t = vload(slot, IO, nc) if has_I else None
            if cost_shared:
                Ct, _ = read_Cc(t)
            else:
                C_dma(t, slot).wait()
                Ct, _ = C_load(slot)
            if dyn_shared:
                Ft = read_F(t)
            else:
                F_dma(t, slot).wait()
                Ft = F_load(slot)
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
            qt = [-r_t[a] + sum(Ft[kk][a] * v[kk] for kk in range(ns))
                  for a in range(ntau)]
            kt, Kt = _bwd_ctrl_solve(Qt, qt, Iz_t, ns, nc, zero())
            write_gains(t, Kt, kt)
            return _bwd_vv_update(Qt, qt, Kt, kt, ns, nc)

        if T >= 2:
            lax.fori_loop(0, T - 1, rstep, (V, v))

        # ===== pass 2: differential rollout + dC/dc (forward) ==========
        vec_dma(0, 0).start()
        if not dyn_shared and T >= 2:
            F_dma(0, 0).start()

        def fstep(t, dx):
            slot = lax.rem(t, 2)

            @pl.when(t + 1 < T)
            def _():
                vec_dma(t + 1, 1 - slot).start()
                if not dyn_shared:
                    F_dma(jnp.minimum(t + 1, T - 2), 1 - slot).start()

            vec_dma(t, slot).wait()
            xs_t = vload(slot, XO, ns)
            us_t = vload(slot, UO, nc)
            Iz_t = vload(slot, IO, nc) if has_I else None
            Kt = [[K_ref[t, m * ns + j] for j in range(ns)]
                  for m in range(nc)]
            kt = [k_ref[t, m] for m in range(nc)]
            du_t = []
            for m in range(nc):
                val = sum(Kt[m][j] * dx[j] for j in range(ns)) + kt[m]
                if has_I:
                    val = jnp.where((Iz_t[m] + zero()) > 0.5, 0.0, val)
                du_t.append(val)
            # hand dx_t/du_t to pass 3 by ALIASING into the K/k rows
            # just consumed (K[t]/k[t] are dead after this step): the
            # rollout->costate handoff costs no extra VMEM
            for i in range(ns):
                K_ref[t, i] = dx[i]
            for m in range(nc):
                k_ref[t, m] = du_t[m]

            # dC_t = -1/2 (dxu (x) xu + xu (x) dxu); dc_t = -dxu
            # (reference mpc/lqr_step.py:346-353)
            dxu = list(dx) + du_t
            xu = xs_t + us_t
            if cost_shared:
                for i in range(ntau):
                    acc(dc_ref, t, i, jnp.sum(-dxu[i]))
                    for j in range(ntau):
                        g = -0.5 * (dxu[i] * xu[j] + xu[i] * dxu[j])
                        acc(dC_ref, t, i * ntau + j, jnp.sum(g))
            else:
                # 2-slot out-stream: the copy that used this slot two
                # steps ago must land before the slot is rewritten
                @pl.when(t >= 2)
                def _():
                    dC_dma(t - 2, slot).wait()
                for i in range(ntau):
                    dCbuf_ref[slot, ntau, i] = -dxu[i]
                    for j in range(ntau):
                        dCbuf_ref[slot, i, j] = -0.5 * (
                            dxu[i] * xu[j] + xu[i] * dxu[j])
                dC_dma(t, slot).start()

            # step the differential state (the t = T-1 step computes a
            # discarded carry from the clamped F index, like the
            # forward kernel's rollouts)
            if dyn_shared:
                tF = jnp.minimum(t, T - 2)
                Ft = read_F(tF)
            else:
                F_dma(jnp.minimum(t, T - 2), slot).wait()
                Ft = F_load(slot)
            return [sum(Ft[i][j] * dxu[j] for j in range(ntau))
                    for i in range(ns)]

        lax.fori_loop(0, T, fstep, [zero()] * ns)
        if not cost_shared:
            dC_dma(T - 1, (T - 1) % 2).wait()
            if T >= 2:
                dC_dma(T - 2, (T - 2) % 2).wait()

        # ===== pass 3: costates + dF/df + dx_init (reverse) ============
        # (reference mpc/lqr_step.py:355-404)
        vec_dma(T - 1, (T - 1) % 2).start()
        if not cost_shared:
            C_dma(T - 1, (T - 1) % 2).start()
        if T >= 2:
            vec_dma(T - 2, (T - 2) % 2).start()
            if not cost_shared:
                C_dma(T - 2, (T - 2) % 2).start()
            if not dyn_shared:
                F_dma(T - 2, (T - 2) % 2).start()

        def lam_pair(Ct, ct, xs_t, us_t, r_t, dx_t, du_t):
            lam = [sum(Ct[i][j] * xs_t[j] for j in range(ns))
                   + sum(Ct[i][ns + m] * us_t[m] for m in range(nc))
                   + ct[i] for i in range(ns)]
            dlam = [sum(Ct[i][j] * dx_t[j] for j in range(ns))
                    + sum(Ct[i][ns + m] * du_t[m] for m in range(nc))
                    - r_t[i] for i in range(ns)]
            return lam, dlam

        sl = (T - 1) % 2
        vec_dma(T - 1, sl).wait()
        r_t = vload(sl, 0, ntau)
        xs_t = vload(sl, XO, ns)
        us_t = vload(sl, UO, nc)
        if cost_shared:
            Ct, ct = read_Cc(T - 1)
        else:
            C_dma(T - 1, sl).wait()
            Ct, ct = C_load(sl)
        dx_t = [K_ref[T - 1, i] for i in range(ns)]
        du_t = [k_ref[T - 1, m] for m in range(nc)]
        lam, dlam = lam_pair(Ct, ct, xs_t, us_t, r_t, dx_t, du_t)
        lam = [li + zero() for li in lam]
        dlam = [di + zero() for di in dlam]

        def cstep(i, carry):
            lam_n, dlam_n = carry
            t = T - 2 - i
            slot = lax.rem(t, 2)

            @pl.when(t >= 1)
            def _():
                vec_dma(t - 1, 1 - slot).start()
                if not cost_shared:
                    C_dma(t - 1, 1 - slot).start()
                if not dyn_shared:
                    F_dma(t - 1, 1 - slot).start()

            vec_dma(t, slot).wait()
            r_t = vload(slot, 0, ntau)
            xs_t = vload(slot, XO, ns)
            us_t = vload(slot, UO, nc)
            if cost_shared:
                Ct, ct = read_Cc(t)
            else:
                C_dma(t, slot).wait()
                Ct, ct = C_load(slot)
            if dyn_shared:
                Ft = read_F(t)
            else:
                F_dma(t, slot).wait()
                Ft = F_load(slot)
            dx_t = [K_ref[t, i] for i in range(ns)]
            du_t = [k_ref[t, m] for m in range(nc)]

            # dF_t = -(dlam_{t+1} (x) xu_t + lam_{t+1} (x) dxu_t);
            # df_t = -dlam_{t+1}
            xu = xs_t + us_t
            dxu = dx_t + du_t
            if dyn_shared:
                for i in range(ns):
                    gf = (-dlam_n[i]) if has_f else zero()
                    acc(df_ref, t, i, jnp.sum(gf))
                    for j in range(ntau):
                        g = -(dlam_n[i] * xu[j] + lam_n[i] * dxu[j])
                        acc(dF_ref, t, i * ntau + j, jnp.sum(g))
            else:
                @pl.when(t + 2 <= T - 2)
                def _():
                    dF_dma(t + 2, slot).wait()
                for i in range(ns):
                    dFbuf_ref[slot, i, ntau] = ((-dlam_n[i]) if has_f
                                                else zero())
                    for j in range(ntau):
                        dFbuf_ref[slot, i, j] = -(
                            dlam_n[i] * xu[j] + lam_n[i] * dxu[j])
                dF_dma(t, slot).start()

            lam, dlam = lam_pair(Ct, ct, xs_t, us_t, r_t, dx_t, du_t)
            lam = [lam[i] + sum(Ft[kk][i] * lam_n[kk]
                                for kk in range(ns))
                   for i in range(ns)]
            dlam = [dlam[i] + sum(Ft[kk][i] * dlam_n[kk]
                                  for kk in range(ns))
                    for i in range(ns)]
            return (lam, dlam)

        if T >= 2:
            lam, dlam = lax.fori_loop(0, T - 1, cstep, (lam, dlam))
            if not dyn_shared:
                dF_dma(0, 0).wait()
                if T >= 3:
                    dF_dma(1, 1).wait()
        for i in range(ns):
            dxi_ref[i, 0] = -dlam[i]

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

    if _bwd_route_long(T, ns, nc, cost_shared, dyn_shared):
        # direct callers (make_batched_fixed_point without a
        # supports_bwd pre-gate) must not silently build a kernel past
        # the long kernel's SMEM/VMEM budgets: that compiles in
        # interpret mode and crashes only in Mosaic's TPU lowering -
        # the exact hidden-crash class of the round-3 G>1 bug
        if not supports_bwd(T, ns, nc, dtype, cost_shared, dyn_shared):
            raise ValueError(
                f'fused KKT backward out of scope for T={T}, ns={ns}, '
                f'nc={nc} (cost_shared={cost_shared}, '
                f'dyn_shared={dyn_shared}): exceeds the fori-loop '
                f'kernel\'s SMEM/VMEM budget - gate on supports_bwd() '
                f'and use the jnp backward (ops.diff) instead')
        return _fused_kkt_backward_long(
            n_state, C, c, F, x_star, u_star, dl_dx, dl_du,
            I_mask=I_mask, has_f=has_f, interpret=interpret)

    G = -(-B // (SUB * LANE))
    Bp = G * SUB * LANE
    pad = Bp - B

    def prep(a, zero_pad=False):
        return _prep_tile(a, pad, G, dtype, zero_pad=zero_pad)

    if cost_shared:
        Cv = jnp.asarray(C, dtype).reshape(T, ntau * ntau)
        cvv = jnp.asarray(c, dtype)
        C_spec = _smem((T, ntau * ntau))
        c_spec = _smem((T, ntau))
        # batch-reduced gradients: ONE resident SMEM block (index map
        # constant in g) accumulated across the sequential grid
        dC_spec = pl.BlockSpec((T, ntau * ntau), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dc_spec = pl.BlockSpec((T, ntau), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dC_shape = jax.ShapeDtypeStruct((T, ntau * ntau), dtype)
        dc_shape = jax.ShapeDtypeStruct((T, ntau), dtype)
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
        dF_spec = pl.BlockSpec((T - 1, ns * ntau),
                               lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        df_spec = pl.BlockSpec((T - 1, ns), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dF_shape = jax.ShapeDtypeStruct((T - 1, ns * ntau), dtype)
        df_shape = jax.ShapeDtypeStruct((T - 1, ns), dtype)
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
        return _unprep_tile(a, batch_axis, Bp, B)

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


def _fused_kkt_backward_long(n_state, C, c, F, x_star, u_star, dl_dx,
                             dl_du, I_mask=None, has_f: bool = True,
                             interpret: bool = False):
    """Long-horizon batched KKT backward: same contract as
    ``fused_kkt_backward`` via the fori-loop kernel
    (``_make_bwd_kernel_long``).  Batched per-t operands live in HBM
    (``pl.ANY``) and stream through 2-slot VMEM buffers; batched
    gradients stream back OUT the same way, so VMEM holds only the
    O(T) gains/differentials scratch."""
    T = x_star.shape[0]
    B = x_star.shape[1]
    ns = n_state
    nc = u_star.shape[2]
    ntau = ns + nc
    dtype = jnp.float32

    cost_shared = jnp.ndim(C) == 3
    dyn_shared = jnp.ndim(F) == 3
    has_I = I_mask is not None

    G = -(-B // (SUB * LANE))
    Bp = G * SUB * LANE
    pad = Bp - B

    def prep(a, zero_pad=False):
        return _prep_tile(a, pad, G, dtype, zero_pad=zero_pad)

    # ---- packed per-t vec: rows (rx | ru | x | u | I) -> [G,T,R,8,128]
    parts = [prep(dl_dx, zero_pad=True), prep(dl_du, zero_pad=True),
             prep(x_star), prep(u_star)]
    if has_I:
        parts.append(prep(jnp.asarray(I_mask).astype(dtype)))
    vec = jnp.moveaxis(jnp.concatenate(parts, axis=1), 2, 0)

    dummy_smem = jnp.zeros((1, 1), dtype)
    scratch = [
        # K, k double as the rollout->costate handoff: pass 2 writes
        # dx_t/du_t over the K[t]/k[t] rows it just consumed
        pltpu.VMEM((T, nc * ns, SUB, LANE), dtype),     # K (then dx)
        pltpu.VMEM((T, nc, SUB, LANE), dtype),          # k (then du)
        pltpu.VMEM((2, vec.shape[2], SUB, LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    if cost_shared:
        Cv = jnp.asarray(C, dtype).reshape(T, ntau * ntau)
        cvv = jnp.asarray(c, dtype)
        C_spec = _smem((T, ntau * ntau))
        c_spec = _smem((T, ntau))
        dC_spec = pl.BlockSpec((T, ntau * ntau), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dc_spec = pl.BlockSpec((T, ntau), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dC_shape = jax.ShapeDtypeStruct((T, ntau * ntau), dtype)
        dc_shape = jax.ShapeDtypeStruct((T, ntau), dtype)
    else:
        # pack c as row ntau of the C block: one DMA per t (the copies
        # are latency-bound), grid axis in FRONT for the leading-index
        # DMA slice (same layout as the forward kernel's cost_stream)
        Cp = jnp.moveaxis(prep(C), 3, 0)          # [G,T,ntau,ntau,8,128]
        cp = jnp.moveaxis(prep(c), 2, 0)          # [G,T,ntau,8,128]
        Cv = jnp.concatenate([Cp, cp[:, :, None]], axis=2)
        cvv = dummy_smem
        C_spec = pl.BlockSpec(memory_space=pl.ANY)
        c_spec = _smem((1, 1))
        dC_spec = pl.BlockSpec(memory_space=pl.ANY)
        dc_spec = _smem((1, 1))
        dC_shape = jax.ShapeDtypeStruct((G, T, ntau + 1, ntau, SUB,
                                         LANE), dtype)
        dc_shape = jax.ShapeDtypeStruct((1, 1), dtype)
        # one 2-slot buffer serves the (C|c) in-stream (passes 1/3)
        # and the (dC|dc) out-stream (pass 2); separate semaphores
        scratch += [
            pltpu.VMEM((2, ntau + 1, ntau, SUB, LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    if dyn_shared:
        Fv = jnp.asarray(F, dtype).reshape(T - 1, ns * ntau)
        F_spec = _smem((T - 1, ns * ntau))
        dF_spec = pl.BlockSpec((T - 1, ns * ntau),
                               lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        df_spec = pl.BlockSpec((T - 1, ns), lambda g: (0, 0),
                               memory_space=pltpu.SMEM)
        dF_shape = jax.ShapeDtypeStruct((T - 1, ns * ntau), dtype)
        df_shape = jax.ShapeDtypeStruct((T - 1, ns), dtype)
    else:
        # df packed as column ntau of the dF block (one DMA out per t)
        Fv = jnp.moveaxis(prep(F), 3, 0)          # [G,T-1,ns,ntau,8,128]
        F_spec = pl.BlockSpec(memory_space=pl.ANY)
        dF_spec = pl.BlockSpec(memory_space=pl.ANY)
        df_spec = _smem((1, 1))
        dF_shape = jax.ShapeDtypeStruct((G, T - 1, ns, ntau + 1, SUB,
                                         LANE), dtype)
        df_shape = jax.ShapeDtypeStruct((1, 1), dtype)
        scratch += [
            pltpu.VMEM((2, ns, ntau, SUB, LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, ns, ntau + 1, SUB, LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    kernel = _make_bwd_kernel_long(T=T, ns=ns, nc=nc, has_I=has_I,
                                   has_f=has_f, cost_shared=cost_shared,
                                   dyn_shared=dyn_shared)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            C_spec,
            c_spec,
            F_spec,
            pl.BlockSpec(memory_space=pl.ANY),
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # medium-ntau batched layouts need a stack past Mosaic's
            # 16MB default scoped-VMEM limit (v5e VMEM is 128MB);
            # hardware-calibrated in tests/test_fused_medium.py
            vmem_limit_bytes=_BWD_LONG_SCOPED_VMEM),
        interpret=interpret,
    )(Cv, cvv, Fv, vec)

    def unprep(a, batch_axis):
        return _unprep_tile(a, batch_axis, Bp, B)

    dxi, dCo, dco, dFo, dfo = outs
    dxi = unprep(dxi, 0)
    if cost_shared:
        dC = dCo.reshape(T, ntau, ntau)
        dc = dco.reshape(T, ntau)
    else:
        a = jnp.moveaxis(dCo, 0, -3)         # [T, ntau+1, ntau, G, 8, 128]
        dC = unprep(a[:, :ntau], 1)
        dc = unprep(a[:, ntau], 1)
    if dyn_shared:
        dF = dFo.reshape(T - 1, ns, ntau)
        df = dfo.reshape(T - 1, ns)
    else:
        a = jnp.moveaxis(dFo, 0, -3)         # [T-1, ns, ntau+1, G, 8, 128]
        dF = unprep(a[:, :, :ntau], 1)
        df = unprep(a[:, :, ntau], 1)
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
