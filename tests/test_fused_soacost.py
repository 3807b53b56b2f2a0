"""In-kernel non-quadratic (SoA) cost vs the jnp path (interpret mode).

The fused kernel quadratizes an SoA cost each outer iteration with
nested jvp and evaluates the TRUE cost in the line search - it must
match the jnp path, which quadratizes the same callable with
``solver.quadratize_cost`` (the reference's ``approximate_cost``
construction, mpc/mpc.py:447-487) and evaluates the callable in
``lqr_forward`` (mpc/lqr_step.py:230-236).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, LinDx, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import PendulumDx, PseudoHuberCost
from mpc_tpu.ops.fused import fused_batched_solve, supports


def _pendulum_problem(B, dtype=jnp.float32):
    dx = PendulumDx(params=jnp.array([10., 1., 1.], dtype))
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    cost = PseudoHuberCost(
        w=jnp.asarray([1.0, 1.0, 0.1, 0.01], dtype),
        goal=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
        delta=jnp.asarray(0.7, dtype))
    return dx, x0, cost


def _cfg(T, **kw):
    base = dict(n_state=3, n_ctrl=1, T=T, lqr_iter=2,
                grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=2, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def _compare(cfg, x0, cost, dyn, lb, ub, atol=3e-5, cost_atol=1e-4):
    ref = batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(fus.x),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), atol=cost_atol)
    np.testing.assert_array_equal(np.asarray(ref.n_iter),
                                  np.asarray(fus.n_iter))


def test_fused_soacost_pendulum_bounded():
    T = 5
    dx, x0, cost = _pendulum_problem(B=8)
    lb = jnp.full((T, 8, 1), -2.0, jnp.float32)
    ub = jnp.full((T, 8, 1), 2.0, jnp.float32)
    _compare(_cfg(T), x0, cost, dx, lb, ub)


def test_fused_soacost_pendulum_unbounded():
    T = 4
    dx, x0, cost = _pendulum_problem(B=8)
    _compare(_cfg(T), x0, cost, dx, None, None)


def test_fused_soacost_lindx_shared():
    """Batch-shared LinDx dynamics + SoA cost: no dynamics params, only
    cost params in the SMEM params row (offset-0 case)."""
    T, B, ns, nc = 4, 8, 3, 1
    rng = np.random.RandomState(1)
    F = np.tile(np.eye(ns, dtype=np.float32), (T - 1, 1, 1))
    F = np.concatenate(
        [F + 0.1 * rng.randn(T - 1, ns, ns).astype(np.float32),
         0.5 * rng.randn(T - 1, ns, nc).astype(np.float32)], 2)
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    cost = PseudoHuberCost(
        w=jnp.asarray([1.0, 0.5, 0.2, 0.05], jnp.float32),
        goal=jnp.asarray([0.3, -0.2, 0.0, 0.0], jnp.float32),
        delta=jnp.asarray(1.1, jnp.float32))
    _compare(_cfg(T), x0, cost, LinDx(jnp.asarray(F), None), None, None)


def test_fused_soacost_long_horizon():
    """T > 128 takes the fori-loop kernel; the per-t quadratization
    runs inside the Riccati loop body."""
    T = 130
    dx, x0, cost = _pendulum_problem(B=8)
    lb, ub = jnp.float32(-2.0), jnp.float32(2.0)
    cfg = _cfg(T, lqr_iter=1, max_linesearch_iter=1)
    # f32 reassociation amplifies over 130 nonlinear pendulum steps
    _compare(cfg, x0, cost, dx, lb, ub, atol=1e-3, cost_atol=1e-3)


def test_supports_soacost_gates():
    T = 4
    dx, x0, cost = _pendulum_problem(B=8)
    cfg = _cfg(T)
    assert supports(cfg, cost, dx)
    # plain callable without the SoA protocol: jnp fallback
    assert not supports(cfg, lambda tau: jnp.sum(tau ** 2), dx)
    # slew + non-quadratic cost is an error upstream; out of kernel scope
    assert not supports(
        dataclasses.replace(cfg, slew_rate_penalty=1.0), cost, dx)


def test_soacost_matches_callable():
    """soa_cost (lane-component form) == __call__ (vector form)."""
    cost = PseudoHuberCost(w=jnp.asarray([1.0, 0.5, 0.2, 0.05]),
                           goal=jnp.asarray([0.3, -0.2, 0.0, 0.1]),
                           delta=jnp.asarray(0.9))
    rng = np.random.RandomState(2)
    tau = rng.randn(4)
    want = float(cost(jnp.asarray(tau)))
    got = float(cost.soa_cost(
        tuple(jnp.asarray(tau[i]) for i in range(3)),
        jnp.asarray(tau[3]), cost.soa_params()))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_soacost_gradients_fd():
    """d loss / d (cost params) through the solver's KKT fixed point,
    checked against central differences (the reference's backward-test
    pattern, tests/test_mpc.py:303-500, with a non-quadratic cost).

    Linear dynamics so the converged fixed point is exact: with
    nonlinear dynamics the iLQR implicit gradient drops second-order
    dynamics terms (as in the reference) and only matches FD to ~1e-3;
    with LinDx the only nonlinearity is the cost under test."""
    T, B, ns, nc = 5, 2, 3, 1
    rng = np.random.RandomState(3)
    F = np.tile(np.eye(ns), (T - 1, 1, 1))
    F = np.concatenate([F + 0.1 * rng.randn(T - 1, ns, ns),
                        0.5 * rng.randn(T - 1, ns, nc)], 2)
    dx = LinDx(jnp.asarray(F, jnp.float64), None)
    x0 = jnp.asarray(rng.randn(B, ns), jnp.float64)
    cfg = _cfg(T, backprop=True, lqr_iter=40, eps=0.0)

    def loss(delta):
        cost = PseudoHuberCost(
            w=jnp.asarray([1.0, 1.0, 0.1, 0.1], jnp.float64),
            goal=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float64),
            delta=delta)
        sol = batched_solve(cfg, x0, cost, dx)
        return jnp.sum(sol.u ** 2)

    d0 = jnp.asarray(0.8, jnp.float64)
    g = jax.grad(loss)(d0)
    eps = 1e-5
    fd = (loss(d0 + eps) - loss(d0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd),
                               rtol=1e-4, atol=1e-7)
