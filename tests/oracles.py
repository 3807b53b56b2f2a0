"""Independent numerical oracles for the solver tests.

The reference uses cvxpy + numdifftools (tests/test_mpc.py:24-62); those
are not available here, so the oracles are built from scipy/numpy:

  * ``box_qp``: bound-constrained QP via L-BFGS-B with analytic gradient
    (replaces ``lqr_qp_cp``, tests/test_mpc.py:24-32);
  * ``lqr_dense``: the full constrained LQR reduced to a dense QP in the
    controls by eliminating states (replaces ``lqr_cp``,
    tests/test_mpc.py:35-62) - exact linear solve when unconstrained,
    L-BFGS-B when box-constrained;
  * finite-difference Jacobians live in ``mpc_tpu.utils.fd`` (replacing
    numdifftools).

The PyTorch reference itself (mounted at /root/reference) is importable
as a parity oracle; see test_parity_reference.py.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import minimize


def box_qp(H, q, lower, upper, tol=1e-14):
    """min 0.5 x'Hx + q'x  s.t. lower <= x <= upper."""
    H = 0.5 * (H + H.T)
    fun = lambda x: 0.5 * x @ H @ x + q @ x
    jac = lambda x: H @ x + q
    x0 = np.clip(np.linalg.lstsq(H, -q, rcond=None)[0], lower, upper)
    res = minimize(fun, x0, jac=jac, method='L-BFGS-B',
                   bounds=list(zip(lower, upper)),
                   options=dict(maxiter=5000, ftol=tol, gtol=1e-12))
    return res.x


def lqr_dense(C, c, F, f, x_init, T, n_state, n_ctrl,
              u_lower=None, u_upper=None):
    """Solve min sum_t 0.5 tau_t' C_t tau_t + c_t' tau_t
    s.t. x_{t+1} = F_t tau_t + f_t, x_0 = x_init, bounds on u,
    by eliminating states into a dense QP in u.

    All arrays single-instance: C [T,n,n], c [T,n], F [T-1,ns,n],
    f [T-1,ns] (or None), x_init [ns].  Returns (x [T,ns], u [T,nc]).
    """
    n_sc = n_state + n_ctrl
    A = F[:, :, :n_state]
    B = F[:, :, n_state:]
    n_u = T * n_ctrl

    Ms = [np.zeros((n_state, n_u))]
    ms = [np.asarray(x_init, float)]
    for t in range(T - 1):
        M = A[t] @ Ms[t]
        M = M.copy()
        M[:, t * n_ctrl:(t + 1) * n_ctrl] += B[t]
        Ms.append(M)
        m = A[t] @ ms[t]
        if f is not None:
            m = m + f[t]
        ms.append(m)

    H = np.zeros((n_u, n_u))
    g = np.zeros(n_u)
    for t in range(T):
        Mx = np.zeros((n_sc, n_u))
        mx = np.zeros(n_sc)
        Mx[:n_state] = Ms[t]
        mx[:n_state] = ms[t]
        Mx[n_state:, t * n_ctrl:(t + 1) * n_ctrl] = np.eye(n_ctrl)
        H += Mx.T @ C[t] @ Mx
        g += Mx.T @ (C[t] @ mx + c[t])
    H = 0.5 * (H + H.T)

    if u_lower is None:
        u = np.linalg.solve(H, -g)
    else:
        u = box_qp(H, g, np.asarray(u_lower).reshape(-1),
                   np.asarray(u_upper).reshape(-1))
    u = u.reshape(T, n_ctrl)

    x = [np.asarray(x_init, float)]
    for t in range(T - 1):
        xn = A[t] @ x[t] + B[t] @ u[t]
        if f is not None:
            xn = xn + f[t]
        x.append(xn)
    return np.stack(x), u
