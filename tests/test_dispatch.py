"""Both public entry points must pick the same execution path.

Round-1 verdict finding: ``MPC.solve`` with the default ``backprop=True``
silently fell back to the jnp path while ``learning.batched_solve``
composed fused-kernel phase 1 with the custom-vjp phase 2.  The MPC
class now delegates to ``batched_solve``, so dispatch is identical by
construction; these tests pin that.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPC, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve


def _problem(B, T, dtype=jnp.float32):
    from mpc_tpu.models import PendulumDx

    dx = PendulumDx(params=jnp.array([10., 1., 1.], dtype))
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)
    return dx, x0, C, c


def _spy(monkeypatch):
    """Route fused_batched_solve (and the fused KKT-backward kernel)
    through interpret mode and count calls."""
    from mpc_tpu.ops import fused as fused_mod
    from mpc_tpu.ops import fused_bwd as fbwd_mod

    calls = []
    orig = fused_mod.fused_batched_solve

    def spy(cfg, *a, **kw):
        calls.append(bool(cfg.backprop))
        kw['interpret'] = True
        return orig(cfg, *a, **kw)

    monkeypatch.setattr(fused_mod, 'fused_batched_solve', spy)

    orig_b = fbwd_mod.fused_kkt_backward

    def spy_b(*a, **kw):
        calls.append('bwd')
        kw['interpret'] = True
        return orig_b(*a, **kw)

    monkeypatch.setattr(fbwd_mod, 'fused_kkt_backward', spy_b)
    return calls


def test_mpc_class_dispatches_fused_with_backprop(monkeypatch):
    """MPC(...) with the default backprop=True must run kernel phase 1 +
    the differentiable fixed point, exactly like batched_solve."""
    calls = _spy(monkeypatch)
    B, T = 8, 6
    dx, x0, C, c = _problem(B, T)

    ctrl = MPC(3, 1, T, u_lower=-2.0, u_upper=2.0, lqr_iter=2, eps=0.0,
               exit_unconverged=False, detach_unconverged=False,
               backprop=True, grad_method=GradMethods.AUTO_DIFF,
               linesearch_decay=0.2, max_linesearch_iter=2,
               use_fused='always')
    sol = ctrl.solve(x0, QuadCost(C, c), dx)
    jax.block_until_ready(sol.u)
    assert calls == [False], \
        'MPC.solve(backprop=True) must call the kernel once (phase 1)'

    # the same problem through batched_solve picks the same path
    cfg = dataclasses.replace(ctrl.cfg)
    sol2 = batched_solve(cfg, x0, QuadCost(C, c), dx,
                         u_lower=-2.0, u_upper=2.0)
    assert calls == [False, False]
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol2.u),
                               atol=1e-6)

    # and gradients flow through the class entry point's fixed point
    C4 = jnp.broadcast_to(C, (T, B, 4, 4))
    c3 = jnp.broadcast_to(c, (T, B, 4))

    def loss(cv):
        s = ctrl.solve(x0, QuadCost(C4, cv), dx)
        return jnp.sum(s.u ** 2)

    g = jax.grad(loss)(c3)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0
    # the differentiable solve must have used the fused KKT-backward
    # kernel, not the vmapped jnp fallback
    assert 'bwd' in calls


def test_mpc_class_matches_jnp_path(monkeypatch):
    """Fused dispatch through the class must agree with use_fused='never'."""
    calls = _spy(monkeypatch)
    B, T = 8, 5
    dx, x0, C, c = _problem(B, T)

    kw = dict(u_lower=-2.0, u_upper=2.0, lqr_iter=2, eps=0.0,
              exit_unconverged=False, detach_unconverged=False,
              backprop=False, grad_method=GradMethods.AUTO_DIFF,
              linesearch_decay=0.2, max_linesearch_iter=2)
    fus = MPC(3, 1, T, use_fused='always', **kw).solve(
        x0, QuadCost(C, c), dx)
    ref = MPC(3, 1, T, use_fused='never', **kw).solve(
        x0, QuadCost(C, c), dx)
    assert calls == [False]
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), atol=1e-4)


def _lindx_problem(ns, nc, T, B, dtype=jnp.float32):
    """Shared stable LinDx + shared quadratic cost (SMEM layouts)."""
    from mpc_tpu import LinDx

    ntau = ns + nc
    rng = np.random.RandomState(1)
    A = np.eye(ns) + 0.01 * rng.randn(ns, ns)
    Bm = 0.1 * rng.randn(ns, nc)
    F = jnp.broadcast_to(
        jnp.asarray(np.concatenate([A, Bm], 1), dtype), (T - 1, ns, ntau))
    C = jnp.eye(ntau, dtype=dtype)
    c = jnp.asarray(0.1 * rng.randn(ntau), dtype)
    x0 = jnp.asarray(rng.randn(B, ns), dtype)
    return LinDx(F, None), QuadCost(C, c), x0


def test_supports_rejects_huge_state_dim():
    """ntau > 28 exceeds the fori-loop kernel's hardware-calibrated
    body budget (ops/fused.py:_BODY_VOLUME_LIMIT, raised 23 -> 28 in
    round 5 after the 40MB scoped-VMEM stack landed; 25s/4c+ compiles
    superlinearly and the VMEM estimate passes 19MB right after):
    dispatch must fall back to the XLA path instead of crashing the
    lowering."""
    from mpc_tpu.ops import fused

    dyn, cost, _ = _lindx_problem(28, 2, 10, 8)
    cfg = MPCConfig(n_state=28, n_ctrl=2, T=10, lqr_iter=2,
                    grad_method=GradMethods.ANALYTIC, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False)
    assert not fused.supports(cfg, cost, dyn, u_lower=-1.0)


def test_volume_routes_medium_state_dim_to_fori_kernel(monkeypatch):
    """ns=7/nc=2 at T=20 exceeds the unrolled kernel's compile-volume
    budget (T * ntau^3 = 14580 > _UNROLL_VOLUME_LIMIT): supports() must
    stay True, dispatch must pick the fori-loop kernel (whose horizon
    body is traced once), and the solution must match the jnp path."""
    import dataclasses

    from mpc_tpu.ops import fused

    ns, nc, T, B = 7, 2, 20, 64
    dyn, cost, x0 = _lindx_problem(ns, nc, T, B)
    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=3,
                    grad_method=GradMethods.ANALYTIC, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False)
    assert fused.supports(cfg, cost, dyn, u_lower=-1.0)

    calls = []
    orig = fused._make_kernel_long

    def spy(**kw):
        calls.append(1)
        return orig(**kw)

    monkeypatch.setattr(fused, '_make_kernel_long', spy)
    sol = fused.fused_batched_solve(cfg, x0, cost, dyn,
                                    u_lower=-1.0, u_upper=1.0,
                                    interpret=True)
    assert calls, 'expected the fori-loop kernel route'
    ref = batched_solve(dataclasses.replace(cfg, use_fused='never'),
                        x0, cost, dyn, u_lower=-1.0, u_upper=1.0)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(sol.u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(sol.costs), atol=1e-4)
