"""Parallel (associative-scan) LQR vs the sequential solver.

The O(log T)-depth scan formulation (ops/pscan.py) must reproduce the
sequential Riccati solve exactly, including zero-pinned controls (the
backward pass's active-set differential solve) and affine dynamics.
An independent L-BFGS-B oracle pins both implementations for f != 0
(which also guards the affine term in riccati_backward,
reference mpc/lqr_step.py:71-74).
"""

import numpy as np
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu.ops.lqr import lqr_solve
from mpc_tpu.ops.pscan import parallel_lqr_solve


def _problem(T, ns, nc, seed=0):
    rng = np.random.RandomState(seed)
    ntau = ns + nc
    C = rng.randn(T, ntau, ntau)
    C = np.einsum('tij,tkj->tik', C, C) + 2.0 * np.eye(ntau)
    c = rng.randn(T, ntau)
    F = np.concatenate([np.eye(ns)[None] + 0.1 * rng.randn(T - 1, ns, ns),
                        0.5 * rng.randn(T - 1, ns, nc)], 2)
    f = 0.1 * rng.randn(T - 1, ns)
    x0 = rng.randn(ns)
    return (jnp.asarray(C), jnp.asarray(c), jnp.asarray(F),
            jnp.asarray(f), jnp.asarray(x0))


def test_parallel_matches_sequential():
    for (T, ns, nc, masked) in [(3, 2, 1, False), (7, 3, 2, False),
                                (50, 3, 4, False), (50, 3, 4, True),
                                (128, 5, 2, True)]:
        C, c, F, f, x0 = _problem(T, ns, nc, seed=T)
        uz = (jnp.asarray(np.random.RandomState(T).rand(T, nc) < 0.3)
              if masked else None)
        xs, us = lqr_solve(C, c, F, f, x0, u_zero_I=uz, n_state=ns)
        xp, up = parallel_lqr_solve(C, c, F, f, x0, u_zero_I=uz,
                                    n_state=ns)
        npt.assert_allclose(np.asarray(xp), np.asarray(xs), atol=1e-10)
        npt.assert_allclose(np.asarray(up), np.asarray(us), atol=1e-10)


def test_affine_term_vs_oracle():
    import scipy.optimize as sopt
    T, ns, nc = 6, 3, 2
    C, c, F, f, x0 = _problem(T, ns, nc, seed=3)
    Cn, cn, Fn, fn, x0n = (np.asarray(a) for a in (C, c, F, f, x0))

    def obj(uflat):
        u = uflat.reshape(T, nc)
        xs = [x0n]
        for t in range(T - 1):
            xs.append(Fn[t] @ np.concatenate([xs[t], u[t]]) + fn[t])
        tot = 0.
        for t in range(T):
            z = np.concatenate([xs[t], u[t]])
            tot += 0.5 * z @ Cn[t] @ z + cn[t] @ z
        return tot

    res = sopt.minimize(obj, np.zeros(T * nc), method='L-BFGS-B',
                        options=dict(ftol=1e-18, gtol=1e-14,
                                     maxiter=20000))
    u_star = res.x.reshape(T, nc)
    for fn_ in (lqr_solve, parallel_lqr_solve):
        _, us = fn_(C, c, F, f, x0, n_state=ns)
        npt.assert_allclose(np.asarray(us), u_star, atol=1e-6)


def test_parallel_riccati_gradients():
    """Backward-pass gradients via the parallel differential solve must
    match the sequential path."""
    import dataclasses

    from mpc_tpu import GradMethods, MPCConfig, QuadCost
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import PendulumDx

    B, T = 4, 10
    rng = np.random.RandomState(5)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))
    u_exp = jnp.asarray(np.clip(rng.randn(T, B, 1), -2, 2))
    dx = PendulumDx()
    q, p = dx.get_true_obj()

    def make_loss(cfg):
        def loss(c_lin):
            sol = batched_solve(cfg, x0, QuadCost(jnp.diag(q), c_lin),
                                dx, u_lower=-2.0, u_upper=2.0)
            return jnp.mean((sol.u - u_exp) ** 2)
        return jax.grad(loss)

    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=4,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    linesearch_decay=0.2, max_linesearch_iter=3,
                    use_fused='never')
    g_seq = make_loss(cfg)(jnp.asarray(p))
    g_par = make_loss(dataclasses.replace(cfg, parallel_riccati=True))(
        jnp.asarray(p))
    npt.assert_allclose(np.asarray(g_par), np.asarray(g_seq), atol=1e-9)


def test_parallel_gains_match_sequential():
    """parallel_riccati_gains (the phase-1 consumer) must reproduce the
    sequential riccati_backward gains exactly (unconstrained)."""
    from mpc_tpu.ops.lqr import riccati_backward
    from mpc_tpu.ops.pscan import parallel_riccati_gains

    for (T, ns, nc) in [(5, 3, 1), (33, 3, 2), (130, 4, 3)]:
        C, c, F, f, x0 = _problem(T, ns, nc, seed=11 + T)
        u0 = jnp.zeros((T, nc), C.dtype)
        back = riccati_backward(C, c, F, u0, n_state=ns)
        Kp, kp = parallel_riccati_gains(C, c, F, None, ns)
        npt.assert_allclose(np.asarray(Kp), np.asarray(back.K),
                            atol=1e-9)
        npt.assert_allclose(np.asarray(kp), np.asarray(back.k),
                            atol=1e-9)


def test_solver_parallel_riccati_phase1():
    """A full unconstrained iLQR solve with parallel_riccati=True (and
    'auto') must match the sequential solver."""
    import dataclasses

    from mpc_tpu import GradMethods, MPCConfig, QuadCost, LinDx
    from mpc_tpu.learning import batched_solve

    T, ns, nc, B = 12, 3, 2, 4
    rng = np.random.RandomState(2)
    C, c, F, f, _ = _problem(T, ns, nc, seed=2)
    x0 = jnp.asarray(rng.randn(B, ns))
    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=3,
                    grad_method=GradMethods.ANALYTIC, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=3, use_fused='never')
    ref = batched_solve(cfg, x0, QuadCost(C, c), LinDx(F, f))
    par = batched_solve(dataclasses.replace(cfg, parallel_riccati=True),
                        x0, QuadCost(C, c), LinDx(F, f))
    npt.assert_allclose(np.asarray(par.u), np.asarray(ref.u), atol=1e-9)
    npt.assert_allclose(np.asarray(par.x), np.asarray(ref.x), atol=1e-9)
    # 'auto' at T < 128 stays sequential and must be identical
    aut = batched_solve(
        dataclasses.replace(cfg, parallel_riccati='auto'),
        x0, QuadCost(C, c), LinDx(F, f))
    npt.assert_allclose(np.asarray(aut.u), np.asarray(ref.u), atol=0)


def test_lsolve_partial_pivoting_f32():
    """The pivoted unrolled solver must stay accurate on systems whose
    natural pivot order is degenerate in f32 (round-1 weakness: the
    unpivoted path lost ~1e-2 on such problems)."""
    from mpc_tpu.ops.pscan import _solve_small

    rng = np.random.RandomState(0)
    n = 5
    M = rng.randn(64, n, n).astype(np.float32)
    # make the leading pivots tiny so unpivoted elimination blows up
    M[:, 0, 0] *= 1e-7
    M[:, 1, 1] *= 1e-6
    B = rng.randn(64, n, 3).astype(np.float32)
    X = np.asarray(_solve_small(jnp.asarray(M), jnp.asarray(B)))
    ref = np.linalg.solve(M.astype(np.float64), B.astype(np.float64))
    err = np.max(np.abs(X - ref) / np.maximum(1.0, np.abs(ref)))
    assert err < 1e-4, f'pivoted f32 solve rel err {err:.2e}'
