"""DMA-streamed batched cost in the long-horizon kernel (interpret).

Per-example [T, B, ntau, ntau] costs cannot fit VMEM at long T
(T * ntau^2 lane tiles); the kernel keeps them in HBM (pl.ANY) and
DMAs one t-slice per access into a constant-size VMEM scratch
(ops/fused.py: ``cost_stream``).  Previously these problems fell back
to the jnp path at T > 128.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, LinDx, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import PendulumDx
from mpc_tpu.ops.fused import fused_batched_solve, supports


def _cfg(T, **kw):
    base = dict(n_state=3, n_ctrl=1, T=T, lqr_iter=2,
                grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=2, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def _batched_cost(T, B, ntau, rng):
    C = np.tile(np.eye(ntau, dtype=np.float32), (T, B, 1, 1))
    C[:, :, ntau - 1, ntau - 1] = (0.1 + rng.rand(B).astype(np.float32))
    c = 0.3 * rng.randn(T, B, ntau).astype(np.float32)
    return QuadCost(jnp.asarray(C), jnp.asarray(c))


def test_streamed_cost_supported_at_long_T():
    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    rng = np.random.RandomState(0)
    cost = _batched_cost(140, 16, 4, rng)
    assert supports(_cfg(140), cost, dx)


def test_streamed_cost_lindx_matches_jnp():
    """Stable linear system, T=140, per-example costs: the streamed
    kernel must match the jnp path (no chaos at stable LinDx, so the
    comparison is tight)."""
    B, T, ns, nc = 16, 140, 3, 1
    rng = np.random.RandomState(0)
    M = rng.randn(ns, ns).astype(np.float32)
    Qo, _ = np.linalg.qr(M)
    F = np.tile(np.concatenate(
        [(0.97 * Qo).astype(np.float32),
         0.3 * rng.randn(ns, nc).astype(np.float32)], 1), (T - 1, 1, 1))
    cost = _batched_cost(T, B, ns + nc, rng)
    dyn = LinDx(jnp.asarray(F), None)
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    cfg = _cfg(T, lqr_iter=3, max_linesearch_iter=3)
    lb, ub = jnp.float32(-0.6), jnp.float32(0.6)
    ref = batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), rtol=1e-5)


def test_streamed_dynamics_and_cost_matches_jnp():
    """Batched per-example LinDx (F AND f) + batched cost at T=140:
    both stream from HBM."""
    B, T, ns, nc = 16, 140, 3, 1
    rng = np.random.RandomState(0)
    M = rng.randn(ns, ns).astype(np.float32)
    Qo, _ = np.linalg.qr(M)
    ntau = ns + nc
    F = np.tile(np.concatenate(
        [(0.97 * Qo).astype(np.float32),
         0.3 * rng.randn(ns, nc).astype(np.float32)], 1), (T - 1, B, 1, 1))
    F += 0.01 * rng.randn(T - 1, B, ns, ntau).astype(np.float32)
    f = 0.05 * rng.randn(T - 1, B, ns).astype(np.float32)
    cost = _batched_cost(T, B, ntau, rng)
    dyn = LinDx(jnp.asarray(F), jnp.asarray(f))
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    cfg = _cfg(T, lqr_iter=3, max_linesearch_iter=3)
    assert supports(cfg, cost, dyn)
    lb, ub = jnp.float32(-0.6), jnp.float32(0.6)
    ref = batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-5)


def test_streamed_multitile_order_invariance():
    """B=2048 = TWO grid tiles: each grid program must stream ITS OWN
    (g, t) slices from the packed HBM layout (a wrong grid-axis
    placement would read tile 0's costs everywhere and still pass every
    single-tile test)."""
    B, T, ns, nc = 2048, 132, 3, 1
    rng = np.random.RandomState(2)
    M = rng.randn(ns, ns).astype(np.float32)
    Qo, _ = np.linalg.qr(M)
    F = np.tile(np.concatenate(
        [(0.97 * Qo).astype(np.float32),
         0.3 * rng.randn(ns, nc).astype(np.float32)], 1), (T - 1, B, 1, 1))
    F += 0.01 * rng.randn(T - 1, B, ns, ns + nc).astype(np.float32)
    cost = _batched_cost(T, B, ns + nc, rng)
    dyn = LinDx(jnp.asarray(F), None)
    x0 = rng.randn(B, ns).astype(np.float32)
    cfg = _cfg(T)
    lb, ub = jnp.float32(-0.6), jnp.float32(0.6)

    def solve(x, c, d):
        return np.asarray(fused_batched_solve(
            cfg, jnp.asarray(x), c, d, u_lower=lb, u_upper=ub,
            interpret=True).u)

    u = solve(x0, cost, dyn)
    perm = rng.permutation(B)
    inv = np.argsort(perm)
    cost_p = QuadCost(cost.C[:, perm], cost.c[:, perm])
    dyn_p = LinDx(dyn.F[:, perm], None)
    up = solve(x0[perm], cost_p, dyn_p)[:, inv]
    np.testing.assert_array_equal(u, up)


def test_streamed_cost_pendulum_matches_jnp():
    """SoA dynamics + streamed batched cost at T=140."""
    B, T = 16, 140
    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), jnp.float32)
    q, p = dx.get_true_obj()
    C = np.tile(np.diag(q).astype(np.float32), (T, B, 1, 1))
    C[:, :, 3, 3] *= (1 + 0.5 * rng.rand(B).astype(np.float32))[None]
    c = np.tile(np.asarray(p, np.float32), (T, B, 1))
    cost = QuadCost(jnp.asarray(C), jnp.asarray(c))
    cfg = _cfg(T)
    lb, ub = jnp.float32(-2.0), jnp.float32(2.0)
    ref = batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=ub,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-4)
