"""Parallel (associative-scan) exact LQR solve for long horizons.

The reference's Riccati recursion and rollout are strictly sequential in
the horizon (mpc/lqr_step.py:61, :184), so horizon cost is O(T) *depth*.
For the linear-quadratic case the backward value recursion and the
forward affine rollout are both compositions of associative operators,
so they parallelize to O(log T) depth with ``lax.associative_scan`` -
the genuine "sequence parallelism" analog for this problem class
(SURVEY.md section 5; Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Dynamic Programming and Linear Quadratic Control").

Formulation: each step's *conditional* value function

    V_k(x_k, x_{k+1}) = min_u  0.5 z^T C_k z + c_k^T z
                        s.t.   x_{k+1} = A_k x_k + B_k u + d_k,
                        z = (x_k, u)

is represented in dual form by the 5-tuple (A, b, C, eta, J):

    V(x, z) = sup_l [ l^T (z - A x - b) - 0.5 l^T C l ]
              + 0.5 x^T J x - eta^T x  (+ const),

built by eliminating u against the step's own quadratic (the standard
completion of squares; cross terms and linear terms fold into the
effective A, b, J, eta).  The binary combination

    (V1 (x) V2)(x, z) = min_y V1(x, y) + V2(y, z)

is associative with closed form (M := I + C1 J2, N := I + J2 C1):

    A12 = A2 M^{-1} A1
    b12 = A2 M^{-1} (b1 + C1 eta2) + b2
    C12 = A2 M^{-1} C1 A2^T + C2
    eta12 = A1^T N^{-1} (eta2 - J2 b1) + eta1
    J12 = A1^T N^{-1} J2 A1 + J1

A reverse cumulative combination therefore yields every cost-to-go
(J_t, eta_t) at once; per-step gains follow independently (vmap over t),
and the closed-loop rollout x_{t+1} = M_t x_t + v_t is a second
associative scan over affine maps.

``u_zero_I`` masks (the active-set-pinned differential solve of the
backward pass, mpc/lqr_step.py:99-127) are supported by masking the
control-space quantities per step, so the whole differentiable-MPC
gradient can run at O(log T) depth.  Box constraints cannot use this
path (the per-step box QP is not an affine-quadratic operator).

Everything operates on one problem instance ([T, ...] arrays, no batch
axis); compose with vmap.

When to use (measured on one v5e chip, ns=4/nc=2, f32): the sequential
scan is DEPTH-bound (~70-300 us per step at small batch), the parallel
scan is BANDWIDTH-bound (O(T log T) work).  Parallel wins ~2.5-3x for
long horizons at small-to-moderate batch (e.g. B<=256 with T<=64, or
B<=16 up to T=1024) and loses ~0.8x when B*T is large enough that the
sequential scan's per-step cost is already amortized (B=256, T>=256).
Precision: f32 long-product conditioning costs ~1e-2 max error on
adversarial random problems (f64 is exact to 1e-12); prefer f64 for
oracle work, f32 for well-conditioned control problems.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import linalg


def _solve_small(M, B):
    """Batched solve M X = B for small n via unrolled Gaussian
    elimination (no pivoting) expressed as elementwise ops.

    TPU's batched LU (jnp.linalg.solve) is very slow for tiny matrices;
    unrolling to ~n^3 vector ops over the [T(, B)] batch keeps the
    associative-scan combine on the VPU.  No pivoting: the systems are
    I + (PSD)(PSD) products, diagonally dominated in practice; use f64
    (tests) or well-scaled f32 problems.

    M: [..., n, n]; B: [..., n, m] -> X: [..., n, m].
    """
    n = M.shape[-1]
    m = B.shape[-1]
    A = [[M[..., i, j] for j in range(n)] for i in range(n)]
    R = [[B[..., i, j] for j in range(m)] for i in range(n)]
    return _restack(_lsolve(A, R))


def _solve_small_vec(M, b):
    """_solve_small for a single right-hand-side vector b [..., n]."""
    return _solve_small(M, b[..., None])[..., 0]


class _Elem(NamedTuple):
    A: jax.Array      # [K, ns, ns]
    b: jax.Array      # [K, ns]
    C: jax.Array      # [K, ns, ns]
    eta: jax.Array    # [K, ns]
    J: jax.Array      # [K, ns, ns]


def _unstack(M):
    n, m = M.shape[-2], M.shape[-1]
    return [[M[..., i, j] for j in range(m)] for i in range(n)]


def _unstack_v(v):
    return [v[..., i] for i in range(v.shape[-1])]


def _restack(L):
    return jnp.stack([jnp.stack(r, axis=-1) for r in L], axis=-2)


def _restack_v(v):
    return jnp.stack(v, axis=-1)


def _lmm(A, B):
    """Product of list-matrices (elementwise over the batch dims)."""
    n, k, m = len(A), len(B), len(B[0])
    return [[sum(A[i][p] * B[p][j] for p in range(k)) for j in range(m)]
            for i in range(n)]


def _lmv(A, v):
    return [sum(A[i][p] * v[p] for p in range(len(v))) for i in range(len(A))]


def _lT(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def _lsolve(M, R, pivot: bool = True):
    """Unrolled Gaussian elimination on list-matrices.

    With ``pivot`` (the default), per-lane partial pivoting: at each
    elimination column the remaining rows are tournament-compared and
    elementwise-swapped so every lane eliminates against its own largest
    pivot - ~2x the select traffic of the unpivoted path, but removes
    the f32 blow-ups on ill-conditioned combines (the round-1 weakness:
    ~1e-2 error on adversarial f32 problems without pivoting).
    """
    n, m = len(M), len(R[0])
    A = [row[:] for row in M]
    B = [row[:] for row in R]
    for k in range(n):
        if pivot:
            for i in range(k + 1, n):
                sw = jnp.abs(A[i][k]) > jnp.abs(A[k][k])
                for j in range(k, n):
                    ak, ai = A[k][j], A[i][j]
                    A[k][j] = jnp.where(sw, ai, ak)
                    A[i][j] = jnp.where(sw, ak, ai)
                for j in range(m):
                    bk, bi = B[k][j], B[i][j]
                    B[k][j] = jnp.where(sw, bi, bk)
                    B[i][j] = jnp.where(sw, bk, bi)
        inv = 1.0 / A[k][k]
        for i in range(k + 1, n):
            fac = A[i][k] * inv
            for j in range(k + 1, n):
                A[i][j] = A[i][j] - fac * A[k][j]
            for j in range(m):
                B[i][j] = B[i][j] - fac * B[k][j]
    X = [[None] * m for _ in range(n)]
    for i in range(n - 1, -1, -1):
        inv = 1.0 / A[i][i]
        for j in range(m):
            s = B[i][j]
            for jj in range(i + 1, n):
                s = s - A[i][jj] * X[jj][j]
            X[i][j] = s * inv
    return X


def _combine(e1: _Elem, e2: _Elem) -> _Elem:
    """Associative combination of conditional value functions (e1 earlier
    in time than e2).

    Fully unrolled to elementwise vector ops over the scan/batch axes:
    batched 3..8-dim matmuls/LU lower terribly on TPU (MXU tile padding
    / slow batched LU), while ~ns^3 VPU ops per product pipeline freely.
    """
    ns = e1.A.shape[-1]
    A1, C1, J1 = _unstack(e1.A), _unstack(e1.C), _unstack(e1.J)
    A2, C2, J2 = _unstack(e2.A), _unstack(e2.C), _unstack(e2.J)
    b1, n1 = _unstack_v(e1.b), _unstack_v(e1.eta)
    b2, n2 = _unstack_v(e2.b), _unstack_v(e2.eta)

    C1J2 = _lmm(C1, J2)
    M = [[C1J2[i][j] + (1.0 if i == j else 0.0) for j in range(ns)]
         for i in range(ns)]
    J2C1 = _lmm(J2, C1)
    N = [[J2C1[i][j] + (1.0 if i == j else 0.0) for j in range(ns)]
         for i in range(ns)]

    bCe = [b1[i] + sum(C1[i][p] * n2[p] for p in range(ns))
           for i in range(ns)]
    rhs_M = [A1[i] + [bCe[i]] + C1[i] for i in range(ns)]
    sol_M = _lsolve(M, rhs_M)
    Minv_A1 = [r[:ns] for r in sol_M]
    Minv_bCe = [r[ns] for r in sol_M]
    Minv_C1 = [r[ns + 1:] for r in sol_M]

    eJb = [n2[i] - sum(J2[i][p] * b1[p] for p in range(ns))
           for i in range(ns)]
    J2A1 = _lmm(J2, A1)
    rhs_N = [[eJb[i]] + J2A1[i] for i in range(ns)]
    sol_N = _lsolve(N, rhs_N)
    Ninv_e = [r[0] for r in sol_N]
    Ninv_J2A1 = [r[1:] for r in sol_N]

    A = _lmm(A2, Minv_A1)
    b = [sum(A2[i][p] * Minv_bCe[p] for p in range(ns)) + b2[i]
         for i in range(ns)]
    A2T = _lT(A2)
    C = _lmm(_lmm(A2, Minv_C1), A2T)
    C = [[C[i][j] + C2[i][j] for j in range(ns)] for i in range(ns)]
    A1T = _lT(A1)
    eta = [sum(A1T[i][p] * Ninv_e[p] for p in range(ns)) + n1[i]
           for i in range(ns)]
    J = _lmm(A1T, Ninv_J2A1)
    J = [[J[i][j] + J1[i][j] for j in range(ns)] for i in range(ns)]

    return _Elem(_restack(A), _restack_v(b), _restack(C),
                 _restack_v(eta), _restack(J))


def _masked_ctrl(C, c, free, n_state):
    """Split the stage quadratic and apply the u_zero mask: clamped
    controls are removed from the problem (identity diagonal, zeroed
    couplings) - mirrors ops/linalg.masked_free_matrix semantics."""
    ns = n_state
    Cxx = C[:, :ns, :ns]
    Cxu = C[:, :ns, ns:]
    Cuu = C[:, ns:, ns:]
    cx = c[:, :ns]
    cu = c[:, ns:]
    if free is not None:
        fo = jnp.einsum('ti,tj->tij', free, free)
        eye = jnp.eye(Cuu.shape[-1], dtype=C.dtype)
        # free-masked Hessian with unit diagonal on clamped entries
        # (ops/linalg.py:masked_free_matrix)
        Cuu = Cuu * fo + jnp.einsum('ij,tj->tij', eye, 1.0 - free)
        Cxu = Cxu * free[:, None, :]
        cu = cu * free
    return Cxx, Cxu, Cuu, cx, cu


def _value_functions(C, c, F, f, n_state, u_zero_I=None):
    """All cost-to-go functions (J_t, eta_t), t = 0..T-1, via one
    reverse associative scan.  V_t(x) = 0.5 x^T J_t x - eta_t^T x."""
    T = c.shape[0]
    ns = n_state
    dtype = C.dtype

    free = None if u_zero_I is None else (~u_zero_I).astype(dtype)
    Cxx, Cxu, Cuu, cx, cu = _masked_ctrl(C, c, free, ns)

    A_dyn = F[:, :, :ns]                       # [T-1, ns, ns]
    B_dyn = F[:, :, ns:]                       # [T-1, ns, nc]
    if free is not None:
        B_dyn = B_dyn * free[:-1, None, :]
    d_dyn = (f if f is not None
             else jnp.zeros((T - 1, ns), dtype))

    # eliminate u within each stage (completion of squares)
    CuuinvCux = _solve_small(Cuu, jnp.swapaxes(Cxu, -1, -2))
    Cuuinvcu = _solve_small_vec(Cuu, cu)
    Xt = Cxx - Cxu @ CuuinvCux                     # [T, ns, ns]
    ct_ = cx - jnp.einsum('tij,tj->ti', Cxu, Cuuinvcu)

    A_e = A_dyn - B_dyn @ CuuinvCux[:-1]
    b_e = d_dyn - jnp.einsum('tij,tj->ti', B_dyn, Cuuinvcu[:-1])
    C_e = B_dyn @ _solve_small(Cuu[:-1], jnp.swapaxes(B_dyn, -1, -2))
    J_e = Xt[:-1]
    eta_e = -ct_[:-1]

    # terminal element: the last stage's value with its control
    # eliminated; A = 0 makes it absorbing under combination
    zero_m = jnp.zeros((1, ns, ns), dtype)
    elems = _Elem(
        A=jnp.concatenate([A_e, zero_m], 0),
        b=jnp.concatenate([b_e, jnp.zeros((1, ns), dtype)], 0),
        C=jnp.concatenate([C_e, zero_m], 0),
        eta=jnp.concatenate([eta_e, -ct_[-1:]], 0),
        J=jnp.concatenate([J_e, Xt[-1:]], 0),
    )
    # reverse=True feeds pairs in flipped order, so swap the arguments to
    # keep "first operand is earlier in time"
    out = lax.associative_scan(lambda a, b: _combine(b, a), elems,
                               reverse=True)
    return out.J, out.eta                     # [T, ns, ns], [T, ns]


def parallel_riccati_gains(C, c, F, f=None, n_state=None, u_zero_I=None):
    """Per-step LQR feedback gains (K_t, k_t) at O(log T) depth.

    The parallel analog of ``ops/lqr.riccati_backward`` for the
    unconstrained (optionally zero-pinned) case: all cost-to-go
    functions come from one reverse associative scan, then every step's
    gains follow independently.  ``c`` has the same meaning as in
    ``riccati_backward`` (pass the delta-space recentred linear term for
    an iLQR subproblem step).  Returns (K [T, nc, ns], k [T, nc]).
    """
    T, n_tau = c.shape
    if n_state is None:
        n_state = F.shape[1]
    ns = n_state
    dtype = C.dtype

    J, eta = _value_functions(C, c, F, f, ns, u_zero_I)

    free = None if u_zero_I is None else (~u_zero_I).astype(dtype)
    Cxx, Cxu, Cuu, cx, cu = _masked_ctrl(C, c, free, ns)
    A_dyn = F[:, :, :ns]
    B_dyn = F[:, :, ns:]
    if free is not None:
        B_dyn = B_dyn * free[:-1, None, :]
    d_dyn = f if f is not None else jnp.zeros((T - 1, ns), dtype)

    # per-step gains from V_{t+1} (all steps independently)
    P = J[1:]                                  # [T-1, ns, ns]
    p = -eta[1:]
    # (with u_zero masks the clamped diagonal stays at identity: the
    #  masked B columns make B^T P B zero there)
    H = Cuu[:-1] + jnp.swapaxes(B_dyn, -1, -2) @ P @ B_dyn
    G = jnp.swapaxes(Cxu[:-1], -1, -2) + \
        jnp.swapaxes(B_dyn, -1, -2) @ P @ A_dyn
    r = cu[:-1] + jnp.einsum('tji,tj->ti', B_dyn,
                             jnp.einsum('tij,tj->ti', P, d_dyn) + p)
    KH = _solve_small(H, jnp.concatenate([G, r[..., None]], axis=-1))
    K = -KH[..., :ns]                                 # [T-1, nc, ns]
    kff = -KH[..., ns]                                # [T-1, nc]

    # last step: control only enters its own stage cost
    KH_last = _solve_small(Cuu[-1:], jnp.concatenate(
        [jnp.swapaxes(Cxu[-1:], -1, -2), cu[-1:][..., None]], axis=-1))
    K_last = -KH_last[..., :ns]
    k_last = -KH_last[..., ns]
    K = jnp.concatenate([K, K_last], 0)
    kff = jnp.concatenate([kff, k_last], 0)
    return K, kff


def parallel_lqr_solve(C, c, F, f, x_init, u_zero_I=None, n_state=None):
    """Exact unconstrained LQR solve at O(log T) depth.

    Drop-in for ops/lqr.lqr_solve (same signature/semantics): minimizes
    sum_t 0.5 z_t^T C_t z_t + c_t^T z_t over the linear dynamics, with
    optional zero-pinned controls; returns (x, u) [T, ns] / [T, nc].
    """
    T, n_tau = c.shape
    if n_state is None:
        n_state = F.shape[1]
    ns = n_state
    nc = n_tau - ns
    dtype = C.dtype

    K, kff = parallel_riccati_gains(C, c, F, f, ns, u_zero_I)

    free = None if u_zero_I is None else (~u_zero_I).astype(dtype)
    A_dyn = F[:, :, :ns]
    B_dyn = F[:, :, ns:]
    if free is not None:
        B_dyn = B_dyn * free[:-1, None, :]
    d_dyn = f if f is not None else jnp.zeros((T - 1, ns), dtype)

    # closed-loop affine rollout x_{t+1} = M_t x_t + v_t as a second
    # associative scan over affine-map composition
    M = A_dyn + B_dyn @ K[:-1]
    v = d_dyn + jnp.einsum('tij,tj->ti', B_dyn, kff[:-1])

    def aff_combine(m1, m2):
        # m1 earlier: x -> M2 (M1 x + v1) + v2 ; unrolled elementwise
        M1, v1 = m1
        M2, v2 = m2
        L1, L2 = _unstack(M1), _unstack(M2)
        lv1, lv2 = _unstack_v(v1), _unstack_v(v2)
        return (_restack(_lmm(L2, L1)),
                _restack_v([sum(L2[i][p] * lv1[p] for p in range(len(lv1)))
                            + lv2[i] for i in range(len(lv2))]))

    Ms, vs = lax.associative_scan(aff_combine, (M, v))
    x_rest = jnp.einsum('tij,j->ti', Ms, x_init) + vs
    x = jnp.concatenate([x_init[None], x_rest], 0)

    u = jnp.einsum('tij,tj->ti', K, x) + kff
    if u_zero_I is not None:
        u = jnp.where(u_zero_I, 0.0, u)
    return x, u
