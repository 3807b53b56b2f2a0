"""Full-tile regression tests for the fused kernel (interpret mode).

The kernel lays a tile of SUB*LANE examples on the VPU sublanes/lanes;
tests at B <= 128 keep every real example in sublane row 0, which once
hid a Jacobian bug: the nc == 1 ``jax.linearize`` primal passed the
bare control tile, ``step``'s ``us[0]`` sliced off sublane row 0, and
the first 128 examples' controls were broadcast to the whole tile -
wrong dynamics Jacobians for every sublane but the first from the
second iLQR iteration on (rollouts were unaffected, so solutions
stayed feasible but converged against the wrong gains).  These tests
pin the fix with batches that fill ALL sublanes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import NNDynamics, PendulumDx
from mpc_tpu.ops.fused import fused_batched_solve


def _pendulum(B):
    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1).astype(
        np.float32)
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q).astype(jnp.float32),
                    jnp.asarray(p, jnp.float32))
    return dx, x0, cost


def _cfg(T, **kw):
    base = dict(n_state=3, n_ctrl=1, T=T, lqr_iter=2,
                grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=2, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def test_fulltile_batch_order_invariance():
    """Solving a full (8, 128) tile must be invariant to the order of
    the examples within it - bitwise (each lane is an independent
    problem; any violation means cross-lane coupling in the kernel)."""
    B = 1024
    dx, x0, cost = _pendulum(B)
    cfg = _cfg(5)

    def solve(x):
        return np.asarray(fused_batched_solve(
            cfg, jnp.asarray(x), cost, dx, u_lower=jnp.float32(-2.),
            u_upper=jnp.float32(2.), interpret=True).u)

    u = solve(x0)
    ur = solve(x0[::-1].copy())[:, ::-1]
    np.testing.assert_array_equal(u, ur)


def test_fulltile_matches_jnp():
    """Fused vs jnp with real examples in EVERY sublane row (B = one
    full tile).  Tolerance is the documented f32 bang-bang tail (a few
    switch-step flips), not the 1e-5 of the small-batch tests."""
    B = 1024
    dx, x0, cost = _pendulum(B)
    cfg = _cfg(5)
    ref = batched_solve(cfg, jnp.asarray(x0), cost, dx,
                        u_lower=jnp.float32(-2.), u_upper=jnp.float32(2.))
    fus = fused_batched_solve(cfg, jnp.asarray(x0), cost, dx,
                              u_lower=jnp.float32(-2.),
                              u_upper=jnp.float32(2.), interpret=True)
    d = np.abs(np.asarray(ref.u) - np.asarray(fus.u))
    assert d.mean() < 1e-4, d.mean()
    # isolated f32 switch-step flips only
    assert (d > 1e-3).mean() < 0.005, (d > 1e-3).mean()


def test_fulltile_multictrl_box_invariance():
    """Order invariance through the in-kernel projected-Newton QP
    (n_ctrl = 4, box bounds)."""
    from mpc_tpu import LinDx
    B, T, ns, nc = 1024, 4, 3, 4
    rng = np.random.RandomState(1)
    ntau = ns + nc
    C = rng.randn(ntau, ntau).astype(np.float32)
    C = C @ C.T + 0.5 * np.eye(ntau, dtype=np.float32)
    c = rng.randn(ntau).astype(np.float32)
    F = np.concatenate(
        [np.eye(ns, dtype=np.float32)
         + 0.1 * rng.randn(ns, ns).astype(np.float32),
         0.5 * rng.randn(ns, nc).astype(np.float32)], 1)
    F = np.tile(F, (T - 1, 1, 1))
    x0 = rng.randn(B, ns).astype(np.float32)
    cfg = _cfg(T, n_state=ns, n_ctrl=nc, pnqp_iter=10)
    cost = QuadCost(jnp.asarray(C), jnp.asarray(c))
    dyn = LinDx(jnp.asarray(F), None)

    def solve(x):
        return np.asarray(fused_batched_solve(
            cfg, jnp.asarray(x), cost, dyn, u_lower=jnp.float32(-0.5),
            u_upper=jnp.float32(0.5), interpret=True).u)

    u = solve(x0)
    ur = solve(x0[::-1].copy())[:, ::-1]
    np.testing.assert_array_equal(u, ur)


def test_fulltile_soacost_invariance():
    """Order invariance through the in-kernel non-quadratic cost
    quadratization."""
    from mpc_tpu.models import PseudoHuberCost
    B = 1024
    dx, x0, _ = _pendulum(B)
    cost = PseudoHuberCost(
        w=jnp.asarray([1.0, 1.0, 0.1, 0.01], jnp.float32),
        goal=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        delta=jnp.asarray(0.7, jnp.float32))
    cfg = _cfg(5)

    def solve(x):
        return np.asarray(fused_batched_solve(
            cfg, jnp.asarray(x), cost, dx, u_lower=jnp.float32(-2.),
            u_upper=jnp.float32(2.), interpret=True).u)

    u = solve(x0)
    ur = solve(x0[::-1].copy())[:, ::-1]
    np.testing.assert_array_equal(u, ur)


def test_fulltile_long_kernel_order_invariance():
    """Same order-invariance through the fori-loop kernel (NNDynamics
    routes there via the param-count rule)."""
    B, T = 1024, 4
    dx = NNDynamics.init(jax.random.PRNGKey(0), 3, 1, hidden_sizes=(8,),
                         activation='sigmoid', dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x0 = rng.randn(B, 3).astype(np.float32)
    cost = QuadCost(jnp.eye(4, dtype=jnp.float32),
                    jnp.zeros(4, jnp.float32))
    cfg = _cfg(T)

    def solve(x):
        return np.asarray(fused_batched_solve(
            cfg, jnp.asarray(x), cost, dx, u_lower=jnp.float32(-1.),
            u_upper=jnp.float32(1.), interpret=True).u)

    u = solve(x0)
    ur = solve(x0[::-1].copy())[:, ::-1]
    np.testing.assert_array_equal(u, ur)
