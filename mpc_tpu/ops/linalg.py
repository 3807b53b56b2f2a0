"""Small-matrix linear algebra primitives for the TPU MPC solver.

These are the TPU-native equivalents of the batched linalg helpers the
reference builds on (reference: mpc/util.py:30-70).  Everything here is
written for a *single* problem instance (no batch dimension) and relies on
``jax.vmap`` to introduce the scenario batch axis; under ``vmap`` + ``jit``
XLA lowers these to batched ops over the leading dimension.

The matrices this solver touches are tiny (n_state + n_ctrl is typically
4-8), so the MXU is not the right tool for a single instance - the win on
TPU comes from batching thousands of instances and keeping everything
fused on-chip.  ``solve_spd`` / ``solve_mask`` are the pluggable
factor/solve entry points that the Pallas kernels can replace later
without touching the solver logic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bmv(X, y):
    """Matrix-vector product (reference: mpc/util.py:44)."""
    return X @ y


def bger(x, y):
    """Outer product (reference: mpc/util.py:40)."""
    return jnp.outer(x, y)


def bquad(x, Q):
    """Quadratic form x^T Q x (reference: mpc/util.py:48)."""
    return x @ Q @ x


def bdot(x, y):
    """Dot product (reference: mpc/util.py:52)."""
    return jnp.dot(x, y)


def bdiag(d):
    """Vector -> diagonal matrix (reference: mpc/util.py:30)."""
    return jnp.diag(d)


def eclamp(x, lower, upper):
    """Elementwise clamp to [lower, upper].

    Functional analog of the reference's in-place ``util.eclamp``
    (mpc/util.py:56-70); bounds may be scalars or arrays broadcastable to
    ``x``.  JAX's value semantics remove the reference's aliasing hazard.
    """
    return jnp.clip(x, lower, upper)


def _solve_1x1(H, b):
    # n == 1 fast path: the reference special-cases this with a reciprocal
    # (mpc/lqr_step.py:85-86, mpc/pnqp.py:51).
    return b / H[..., 0, 0][..., None] if b.ndim == H.ndim - 1 else b / H[0, 0]


def solve_sym(H, b):
    """Solve H x = b for symmetric (not necessarily definite) tiny H.

    Used for the free-subspace Newton solve and the Riccati gain solve
    (reference uses batched LU: mpc/lqr_step.py:125-127,148 and
    mpc/pnqp.py:53-54).  ``b`` may be a vector (n,) or matrix (n, k).
    """
    n = H.shape[-1]
    if n == 1:
        return b / H[0, 0]
    return jnp.linalg.solve(H, b)


# Above this size the unrolled factorization's trace (~n^3/6 scalar ops)
# stops paying for itself and the batched LAPACK-style path takes over.
_UNROLL_CHOL_N = 32


def _chol_solve_unrolled(H, b):
    """Cholesky solve with the factorization unrolled at trace time.

    ``n`` is static, so the factorization and both substitutions unroll
    into pure elementwise ops; under ``vmap`` these become [B]-batched
    VPU ops that XLA fuses into the surrounding computation.  This is
    ~10x faster on TPU than ``jnp.linalg.solve``'s batched pivoted LU
    and ~4x faster than batched ``cholesky``+``cho_solve`` for the tiny
    systems this solver produces (measured at n=4, B=2048).

    ``b`` may be (n,) or (n, k); rows of ``b`` flow through the
    substitutions unchanged, so both shapes share the code.
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def solve_spd(H, b):
    """Solve H x = b for symmetric positive-definite tiny H.

    The SPD counterpart of ``solve_sym`` for the solves whose operands
    are definite by construction - the PNQP Newton system (free-subspace
    mask of an SPD Q_uu, mpc/pnqp.py:40-54) and the masked Riccati gain
    solves (mpc/lqr_step.py:107-148).  The reference factors these with
    batched LU; on TPU pivoted LU lowers to a sequential dynamic-slice
    loop, so we use an unrolled Cholesky instead (the same factorization
    the fused Pallas kernel uses in-kernel), falling back to batched
    ``cholesky``+``cho_solve`` above ``_UNROLL_CHOL_N``.
    """
    n = H.shape[-1]
    if n == 1:
        return b / H[0, 0]
    if n <= _UNROLL_CHOL_N:
        return _chol_solve_unrolled(H, b)
    chol = jnp.linalg.cholesky(H)
    return jax.scipy.linalg.cho_solve((chol, True), b)


def solve_psd_pinv(H, b):
    """Solve via pseudo-inverse, robust to semidefinite H.

    Mirrors the reference's unconstrained multi-control solve, which uses
    ``torch.pinverse`` per example (mpc/lqr_step.py:89-94) for robustness
    to semidefinite Q_uu.
    """
    n = H.shape[-1]
    if n == 1:
        return b / H[0, 0]
    return jnp.linalg.pinv(H) @ b


def masked_free_matrix(H, free, clamped_diag=1.0, reg=1e-11):
    """Restrict symmetric H to the free subspace.

    Zeroes every row/column of a clamped index and puts ``clamped_diag``
    on the clamped diagonal so the system block-decouples: the solve then
    returns exactly 0 for clamped entries (their RHS is also masked to 0)
    and the free block is untouched.

    The reference does the same masking but leaves 1e-11 on the clamped
    diagonal (mpc/pnqp.py:44-49) or 1e-8 (mpc/lqr_step.py:107-116); using
    1.0 is mathematically identical for the solution (RHS is zero on
    clamped entries and the system is block-diagonal) and much better
    conditioned in float32 on TPU.
    """
    free_f = free.astype(H.dtype)
    n = H.shape[-1]
    ff = jnp.outer(free_f, free_f)
    eye = jnp.eye(n, dtype=H.dtype)
    return H * ff + (clamped_diag * (1.0 - free_f) + reg) * eye


def mask_rows(M, keep):
    """Zero the rows of M where ``keep`` is False (reference's boolean-mask
    writes, e.g. mpc/lqr_step.py:142-143)."""
    return M * keep.astype(M.dtype)[:, None]
