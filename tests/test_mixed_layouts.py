"""Mixed shared/batched layouts for QuadCost / LinDx leaves.

The reference broadcasts every cost/dynamics leaf INDEPENDENTLY
(mpc/mpc.py:205-226 expands C and c separately; util.expandParam,
mpc/util.py:21-27, does the same for F and f inside the LQR step), so
a batch-shared weight matrix C with per-example goal vectors c -- the
canonical "shared weights, per-example goals" workload -- is a valid
reference input.  These tests pin that

  * ``MPC`` / ``batched_solve`` accept mixed pairs (no layout error),
  * ``fused.supports`` admits them and dispatch normalizes the shared
    leaf to the batched layout (``_normalize_mixed_layouts``), giving
    results identical to the pre-broadcast problem,
  * gradients through the differentiable path are unchanged by the
    layout (shared-vs-broadcast equivalence).
"""

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import MPC, GradMethods, LinDx, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import PendulumDx
from mpc_tpu.ops.fused import fused_batched_solve, supports


def _cfg(T, **kw):
    base = dict(n_state=3, n_ctrl=1, T=T, lqr_iter=3,
                grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=3, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def _pendulum(B, dtype=jnp.float32):
    dx = PendulumDx(params=jnp.array([10., 1., 1.], dtype))
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    return dx, x0


def _goal_cost(T, B, ntau, rng, dtype=np.float32):
    """Shared diagonal weights C [ntau, ntau] + per-example goals
    c [T, B, ntau] (the mixed layout under test)."""
    C = np.diag((0.5 + rng.rand(ntau)).astype(dtype))
    c = 0.3 * rng.randn(T, B, ntau).astype(dtype)
    return jnp.asarray(C), jnp.asarray(c)


def _stable_lindx(T, ns, nc, rng, dtype=np.float32):
    M = rng.randn(ns, ns).astype(dtype)
    Qo, _ = np.linalg.qr(M)
    F = np.tile(np.concatenate(
        [(0.97 * Qo).astype(dtype),
         0.3 * rng.randn(ns, nc).astype(dtype)], 1), (T - 1, 1, 1))
    return F


def test_supports_admits_mixed_quadcost():
    T, B = 10, 16
    dx, _ = _pendulum(B)
    rng = np.random.RandomState(0)
    C, c = _goal_cost(T, B, 4, rng)
    assert supports(_cfg(T), QuadCost(C, c), dx, n_batch=B)
    # and the transpose case: batched C, shared c
    Cb = jnp.broadcast_to(C, (T, B, 4, 4))
    cs = jnp.asarray(0.3 * rng.randn(T, 4).astype(np.float32))
    assert supports(_cfg(T), QuadCost(Cb, cs), dx, n_batch=B)


def test_fused_mixed_cost_split_matches_broadcast():
    """Mixed-layout fused solve (round 5: the SHORT kernel runs it
    SPLIT - shared C on SMEM with literal-zero folding, per-example c
    as a blocked VMEM operand, no [T, B, ntau, ntau] broadcast) must
    match the fully-broadcast fused solve to f32 reassociation and the
    jnp path to the usual cross-implementation bound."""
    from mpc_tpu.ops import fused as fused_mod
    T, B = 6, 16
    dx, x0 = _pendulum(B)
    rng = np.random.RandomState(0)
    C, c = _goal_cost(T, B, 4, rng)
    cfg = _cfg(T)
    lb, ub = jnp.float32(-2.0), jnp.float32(2.0)

    # the split path actually engages for this shape
    flags = fused_mod._layout_flags(cfg, QuadCost(C, c), dx, lb, None)
    assert flags['cost_smem'] and flags['c_batched']

    mixed = fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                                u_lower=lb, u_upper=ub, interpret=True)
    Cb = jnp.broadcast_to(C, (T, B, 4, 4))
    full = fused_batched_solve(cfg, x0, QuadCost(Cb, c), dx,
                               u_lower=lb, u_upper=ub, interpret=True)
    # SMEM-C vs VMEM-C reduction orders differ at f32 roundoff only
    np.testing.assert_allclose(np.asarray(mixed.u), np.asarray(full.u),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                               atol=5e-5)

    ref = batched_solve(cfg, x0, QuadCost(C, c), dx,
                        u_lower=lb, u_upper=ub)
    # fused(interpret)-vs-jnp is an f32 cross-implementation bound
    # whose constant depends on the HOST's XLA:CPU codegen (round 4:
    # a machine change moved the worst entry 2e-5 -> 8e-5 at identical
    # code).  The hardware bound is pinned by
    # hw_sweep.sweep_mixed_cost_layout.
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(mixed.u),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(mixed.costs), rtol=1e-4)


def test_fused_mixed_cost_long_route_broadcasts_bitwise():
    """On the fori-loop route (T > 128) the split layout is disallowed
    and _normalize_mixed_layouts broadcasts the shared C - producing
    operands IDENTICAL to the pre-broadcast problem, so the solves
    match bitwise."""
    from mpc_tpu.ops import fused as fused_mod
    T, B = 132, 16
    dx, x0 = _pendulum(B)
    rng = np.random.RandomState(0)
    C, c = _goal_cost(T, B, 4, rng)
    cfg = _cfg(T, lqr_iter=2, max_linesearch_iter=2)
    lb, ub = jnp.float32(-2.0), jnp.float32(2.0)

    flags = fused_mod._layout_flags(cfg, QuadCost(C, c), dx, lb, None)
    assert not flags['c_batched']

    mixed = fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                                u_lower=lb, u_upper=ub, interpret=True)
    Cb = jnp.broadcast_to(C, (T, B, 4, 4))
    full = fused_batched_solve(cfg, x0, QuadCost(Cb, c), dx,
                               u_lower=lb, u_upper=ub, interpret=True)
    np.testing.assert_array_equal(np.asarray(mixed.u), np.asarray(full.u))
    np.testing.assert_array_equal(np.asarray(mixed.x), np.asarray(full.x))


def test_fused_mixed_lindx_matches_jnp():
    """F shared + f batched (per-example affine residuals), and
    F batched + f shared."""
    B, T, ns, nc = 16, 8, 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(1)
    F = _stable_lindx(T, ns, nc, rng)
    f_b = 0.05 * rng.randn(T - 1, B, ns).astype(np.float32)
    C, c = _goal_cost(T, B, ntau, rng)
    Cs = jnp.asarray(np.diag((0.5 + rng.rand(ntau)).astype(np.float32)))
    cs = jnp.asarray(0.1 * rng.randn(T, ntau).astype(np.float32))
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    cfg = _cfg(T)
    lb, ub = jnp.float32(-0.6), jnp.float32(0.6)

    for dyn in (LinDx(jnp.asarray(F), jnp.asarray(f_b)),
                LinDx(jnp.broadcast_to(jnp.asarray(F[:, None]),
                                       (T - 1, B, ns, ntau)),
                      jnp.asarray(0.05 * rng.randn(T - 1, ns)
                                  .astype(np.float32)))):
        assert supports(cfg, QuadCost(Cs, cs), dyn, n_batch=B)
        ref = batched_solve(cfg, x0, QuadCost(Cs, cs), dyn,
                            u_lower=lb, u_upper=ub)
        fus = fused_batched_solve(cfg, x0, QuadCost(Cs, cs), dyn,
                                  u_lower=lb, u_upper=ub, interpret=True)
        np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(ref.costs),
                                   np.asarray(fus.costs), rtol=1e-5)


def test_mpc_entry_accepts_mixed_cost():
    """The MPC class (reference constructor surface) must accept
    C [n_tau, n_tau] shared + c [T, B, n_tau] batched, like the
    reference's independent expansions, and match the fully-broadcast
    problem exactly (f64, jnp path)."""
    T, B, ns, nc = 8, 4, 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(2)
    dx, x0 = _pendulum(B, dtype=jnp.float64)
    C = jnp.asarray(np.diag((0.5 + rng.rand(ntau))))
    c = jnp.asarray(0.3 * rng.randn(T, B, ntau))

    kw = dict(u_lower=-2.0, u_upper=2.0, lqr_iter=3, eps=0.0,
              exit_unconverged=False, detach_unconverged=False,
              backprop=False, grad_method=GradMethods.AUTO_DIFF)
    ctrl = MPC(ns, nc, T, **kw)
    xm, um, costm = ctrl(x0, QuadCost(C, c), dx)
    Cb = jnp.broadcast_to(C, (T, B, ntau, ntau))
    xf, uf, costf = ctrl(x0, QuadCost(Cb, c), dx)
    np.testing.assert_array_equal(np.asarray(um), np.asarray(uf))
    np.testing.assert_array_equal(np.asarray(xm), np.asarray(xf))


def test_mixed_cost_gradients_match_broadcast():
    """d(loss)/dc through the differentiable solve must not depend on
    whether C rides shared or broadcast (jnp custom_vjp path, f64)."""
    B, T, ns, nc = 4, 6, 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(3)
    F = _stable_lindx(T, ns, nc, rng, dtype=np.float64)
    dyn = LinDx(jnp.asarray(F), None)
    x0 = jnp.asarray(rng.randn(B, ns))
    C = jnp.asarray(np.diag(0.5 + rng.rand(ntau)))
    c = jnp.asarray(0.3 * rng.randn(T, B, ntau))
    u_tgt = jnp.asarray(0.1 * rng.randn(T, B, nc))
    cfg = _cfg(T, backprop=True)
    lb, ub = jnp.float64(-0.6), jnp.float64(0.6)

    def loss(c_leaf, Cm):
        sol = batched_solve(cfg, x0, QuadCost(Cm, c_leaf), dyn,
                            u_lower=lb, u_upper=ub)
        return jnp.mean((sol.u - u_tgt) ** 2)

    g_mixed = jax.grad(loss)(c, C)
    g_full = jax.grad(loss)(c, jnp.broadcast_to(C, (T, B, ntau, ntau)))
    np.testing.assert_allclose(np.asarray(g_mixed), np.asarray(g_full),
                               rtol=1e-10, atol=1e-12)
