"""Fused Pallas solver vs the jnp reference path (interpret mode).

The fused kernel (mpc_tpu/ops/fused.py) must reproduce the vmapped jnp
solver bit-for-bit up to float32 reassociation: same trajectories,
costs, step norms, line-search alphas, and iteration diagnostics.
Run in Pallas interpreter mode so it executes on the CPU test backend.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import PendulumDx
from mpc_tpu.ops.fused import fused_batched_solve, supports


def _problem(B, T, bounded, dtype=jnp.float32):
    dx = PendulumDx(params=jnp.array([10., 1., 1.], dtype))
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    q, p = dx.get_true_obj()
    C = jnp.broadcast_to(jnp.diag(q).astype(dtype), (T, B, 4, 4))
    c = jnp.broadcast_to(jnp.asarray(p, dtype), (T, B, 4))
    if bounded:
        lb = jnp.full((T, B, 1), -2.0, dtype)
        ub = jnp.full((T, B, 1), 2.0, dtype)
    else:
        lb = ub = None
    return dx, x0, C, c, lb, ub


def _cfg(T, **kw):
    base = dict(n_state=3, n_ctrl=1, T=T, lqr_iter=2,
                grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=2, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def _compare(cfg, dx, x0, C, c, lb, ub, atol=2e-5):
    ref = batched_solve(cfg, x0, QuadCost(C, c), dx, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                              u_lower=lb, u_upper=ub, interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(fus.x),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(ref.costs), np.asarray(fus.costs),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.alpha),
                               np.asarray(fus.alpha), atol=0)
    np.testing.assert_array_equal(np.asarray(ref.n_iter),
                                  np.asarray(fus.n_iter))
    np.testing.assert_array_equal(np.asarray(ref.n_qp_iter),
                                  np.asarray(fus.n_qp_iter))


def test_fused_matches_jnp_bounded():
    T = 5
    dx, x0, C, c, lb, ub = _problem(B=16, T=T, bounded=True)
    _compare(_cfg(T), dx, x0, C, c, lb, ub)


def test_fused_matches_jnp_unbounded():
    T = 4
    dx, x0, C, c, lb, ub = _problem(B=8, T=T, bounded=False)
    _compare(_cfg(T), dx, x0, C, c, lb, ub)


def test_fused_smem_cost_scalar_bounds():
    """Batch-shared cost [n, n] + scalar bounds (the SMEM fast path) must
    match the broadcast VMEM path."""
    T = 5
    dx, x0, C, c, lb, ub = _problem(B=16, T=T, bounded=True)
    cfg = _cfg(T)
    ref = fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                              u_lower=lb, u_upper=ub, interpret=True)
    fus = fused_batched_solve(
        cfg, x0, QuadCost(C[0, 0], c[0, 0]), dx,
        u_lower=jnp.float32(-2.0), u_upper=jnp.float32(2.0),
        interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), atol=1e-4)


def _lindx_problem(B, T, ns, nc, seed=0):
    ntau = ns + nc
    rng = np.random.RandomState(seed)
    C = rng.randn(T, B, ntau, ntau).astype(np.float32)
    C = np.einsum('tbij,tbkj->tbik', C, C) + \
        0.5 * np.eye(ntau, dtype=np.float32)
    c = rng.randn(T, B, ntau).astype(np.float32)
    F = np.concatenate([
        np.tile(np.eye(ns, dtype=np.float32), (T - 1, B, 1, 1))
        + 0.1 * rng.randn(T - 1, B, ns, ns).astype(np.float32),
        0.5 * rng.randn(T - 1, B, ns, nc).astype(np.float32)], 3)
    f = 0.1 * rng.randn(T - 1, B, ns).astype(np.float32)
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    lb = jnp.asarray(-np.abs(rng.randn(T, B, nc)).astype(np.float32) - 0.1)
    ub = jnp.asarray(np.abs(rng.randn(T, B, nc)).astype(np.float32) + 0.1)
    return (jnp.asarray(C), jnp.asarray(c), jnp.asarray(F),
            jnp.asarray(f), x0, lb, ub)


def _compare_uxc(cfg, x0, cost, dyn, lb, ub, atol):
    """u/x/costs parity jnp-vs-fused; alpha is excluded: at float32
    cost ties with a ~zero step the selected alpha is arbitrary (the
    trajectories still match)."""
    ref = batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, cost, dyn, u_lower=lb, u_upper=ub,
                              interpret=True)
    for f in ('u', 'x', 'costs'):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(fus, f)), atol=atol)


def test_fused_lindx_multictrl_box():
    """n_ctrl=4 LinDx with box bounds: the in-kernel projected-Newton QP
    (masked Cholesky + parallel Armijo) must match the jnp PNQP path."""
    from mpc_tpu import LinDx
    B, T, ns, nc = 16, 4, 3, 4
    C, c, F, f, x0, lb, ub = _lindx_problem(B, T, ns, nc)
    cfg = dataclasses.replace(_cfg(T), n_state=ns, n_ctrl=nc,
                              lqr_iter=2, pnqp_iter=10)
    _compare_uxc(cfg, x0, QuadCost(C, c), LinDx(F, f), lb, ub, atol=3e-4)


def test_fused_lindx_multictrl_unconstrained_shared():
    """n_ctrl=4 batch-shared LinDx, unconstrained: SMEM dynamics +
    in-kernel Cholesky solve vs the jnp path."""
    from mpc_tpu import LinDx
    B, T, ns, nc = 16, 4, 3, 4
    C, c, F, f, x0, _, _ = _lindx_problem(B, T, ns, nc)
    cfg = dataclasses.replace(_cfg(T), n_state=ns, n_ctrl=nc, lqr_iter=2)
    _compare_uxc(cfg, x0, QuadCost(C[:, 0], c[:, 0]),
                 LinDx(F[:, 0], f[:, 0]), None, None, atol=5e-4)


def test_fused_delta_u():
    """delta_u trust region in-kernel must match the jnp path, and the
    accepted controls must respect |u_{k+1} - u_k| <= delta_u per
    iteration (reference tests/test_mpc.py:197-240 semantics)."""
    T = 5
    dx, x0, C, c, lb, ub = _problem(B=16, T=T, bounded=True)
    cfg = dataclasses.replace(_cfg(T), delta_u=0.3)
    _compare(cfg, dx, x0, C, c, lb, ub)


def test_supports_gates():
    T = 4
    dx, x0, C, c, lb, ub = _problem(B=8, T=T, bounded=True)
    cfg = _cfg(T)
    assert supports(cfg, QuadCost(C, c), dx)
    # out of scope: backprop, non-SoA dynamics, f64
    assert not supports(dataclasses.replace(cfg, backprop=True),
                        QuadCost(C, c), dx)
    assert not supports(cfg, QuadCost(C, c), lambda x, u: x)
    assert not supports(cfg, QuadCost(C, c), dx, dtype=jnp.float64)
    # in scope since round 2: u_zero_I, slew-rate penalty
    assert supports(cfg, QuadCost(C, c), dx,
                    u_zero_I=jnp.zeros((T, 8, 1), bool))
    assert supports(dataclasses.replace(cfg, slew_rate_penalty=1.0),
                    QuadCost(C, c), dx)


def _batched(cfg, dx, x0, C, c, lb, ub, uz=None, pc=None):
    return batched_solve(cfg, x0, QuadCost(C, c), dx, u_lower=lb,
                         u_upper=ub, u_zero_I=uz, prev_ctrl=pc)


def _fused(cfg, dx, x0, C, c, lb, ub, uz=None, pc=None):
    return fused_batched_solve(cfg, x0, QuadCost(C, c), dx, u_lower=lb,
                               u_upper=ub, u_zero_I=uz, prev_ctrl=pc,
                               interpret=True)


def test_fused_u_zero_I_unbounded():
    """Shared [T, n_ctrl] zero-pin mask, no bounds: in-kernel masked
    free-subspace solve must match the jnp path and pin exactly."""
    T = 4
    dx, x0, C, c, _, _ = _problem(B=8, T=T, bounded=False)
    uz = np.zeros((T, 1), bool)
    uz[1, 0] = True
    uz = jnp.asarray(uz)
    cfg = _cfg(T)
    ref = _batched(cfg, dx, x0, C, c, None, None, uz=uz)
    fus = _fused(cfg, dx, x0, C, c, None, None, uz=uz)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(fus.x),
                               atol=2e-5)
    assert float(jnp.max(jnp.abs(fus.u[1]))) == 0.0


def test_fused_u_zero_I_bounded_batched():
    """Per-example [T, B, n_ctrl] masks with box bounds: mask applies in
    the rollout (the reference's lqr_forward order, zero then clamp)."""
    T = 5
    B = 16
    dx, x0, C, c, lb, ub = _problem(B=B, T=T, bounded=True)
    rng = np.random.RandomState(3)
    uz = jnp.asarray(rng.rand(T, B, 1) < 0.3)
    cfg = _cfg(T)
    ref = _batched(cfg, dx, x0, C, c, lb, ub, uz=uz)
    fus = _fused(cfg, dx, x0, C, c, lb, ub, uz=uz)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), atol=1e-4)
    assert float(jnp.max(jnp.abs(np.asarray(fus.u)[np.asarray(uz)]))) == 0.0


def test_fused_u_zero_I_multictrl():
    """n_ctrl=4 LinDx, unconstrained, shared mask: masked Cholesky."""
    from mpc_tpu import LinDx
    B, T, ns, nc = 16, 4, 3, 4
    C, c, F, f, x0, _, _ = _lindx_problem(B, T, ns, nc)
    uz = np.zeros((T, nc), bool)
    uz[0, 1] = uz[2, 3] = True
    uz = jnp.asarray(uz)
    cfg = dataclasses.replace(_cfg(T), n_state=ns, n_ctrl=nc)
    ref = _batched(cfg, LinDx(F, f), x0, C, c, None, None, uz=uz)
    fus = _fused(cfg, LinDx(F, f), x0, C, c, None, None, uz=uz)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-4)
    assert float(jnp.max(jnp.abs(fus.u[0, :, 1]))) == 0.0
    assert float(jnp.max(jnp.abs(fus.u[2, :, 3]))) == 0.0


def test_fused_slew_rate_soa():
    """Slew-rate penalty via host-side augmentation + SoA passthrough:
    must match the jnp solver's _augment_slew path, incl. prev_ctrl."""
    T = 5
    B = 8
    dx, x0, C, c, lb, ub = _problem(B=B, T=T, bounded=True)
    pc = jnp.asarray(0.5 * np.ones((B, 1), np.float32))
    cfg = dataclasses.replace(_cfg(T), slew_rate_penalty=1.0)
    ref = _batched(cfg, dx, x0, C, c, lb, ub, pc=pc)
    fus = _fused(cfg, dx, x0, C, c, lb, ub, pc=pc)
    # 5e-4: the kernel linearizes the *augmented* SoA step while the jnp
    # path linearizes the true dynamics and augments symbolically -
    # identical math, different f32 op order
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(fus.x),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), atol=1e-3)


def test_fused_long_horizon_t256():
    """T=256 > 128 dispatches the fori-loop long-horizon kernel
    (_make_kernel_long): equivalence with the jnp path at a long
    horizon.  f32 tolerances are looser: 256 Euler steps of the
    pendulum amplify reassociation differences."""
    T = 256
    dx, x0, C, c, lb, ub = _problem(B=8, T=T, bounded=True)
    cfg = _cfg(T, lqr_iter=1, max_linesearch_iter=2)
    ref = _batched(cfg, dx, x0, C[0, 0], c[0, 0], -2.0, 2.0)
    fus = _fused(cfg, dx, x0, C[0, 0], c[0, 0], jnp.float32(-2.0),
                 jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=2e-3)
    # costs sum 256 f32 stage terms in different orders: rtol-dominated
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), rtol=1e-3,
                               atol=5e-3)
    np.testing.assert_array_equal(np.asarray(ref.n_iter),
                                  np.asarray(fus.n_iter))
    np.testing.assert_allclose(np.asarray(ref.alpha),
                               np.asarray(fus.alpha), atol=0)


def test_fused_slew_rate_lindx():
    """Slew-rate penalty with (batch-shared) LinDx dynamics: augmented
    LinDx stays on the SMEM path."""
    from mpc_tpu import LinDx
    B, T, ns, nc = 8, 4, 3, 2
    C, c, F, f, x0, lb, ub = _lindx_problem(B, T, ns, nc, seed=5)
    cfg = dataclasses.replace(_cfg(T), n_state=ns, n_ctrl=nc,
                              slew_rate_penalty=0.7)
    ref = _batched(cfg, LinDx(F[:, 0], f[:, 0]), x0, C[:, 0], c[:, 0],
                   None, None)
    fus = _fused(cfg, LinDx(F[:, 0], f[:, 0]), x0, C[:, 0], c[:, 0],
                 None, None)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(fus.x),
                               atol=5e-4)


def test_fused_cartpole_matches_jnp():
    """Cartpole SoA step (5-state, angle-addition integration) through
    the fused kernel vs the jnp path (which uses the arctan2 form).

    Runs at T=130 so the fori-loop kernel is used: the fully-unrolled
    5-state kernel takes XLA's CPU (interpret) pipeline 40+ minutes to
    compile, while the fori body compiles in ~a minute.  The unrolled
    5-state kernel is exercised on real TPU (Mosaic compiles it fine)
    by the cartpole benchmark."""
    from mpc_tpu.models import CartpoleDx
    B, T = 16, 130
    dx = CartpoleDx(params=jnp.array([9.8, 1.0, 0.1, 0.5], jnp.float32))
    rng = np.random.RandomState(0)
    th = 0.6 * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack(
        [0.2 * rng.randn(B), np.zeros(B), np.cos(th), np.sin(th),
         np.zeros(B)], 1), jnp.float32)
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(jnp.float32)
    c = jnp.asarray(p, jnp.float32)
    cfg = dataclasses.replace(_cfg(T), n_state=5, linesearch_decay=0.5,
                              lqr_iter=1, max_linesearch_iter=1)
    ref = batched_solve(cfg, x0, QuadCost(C, c), dx,
                        u_lower=jnp.float32(-100.),
                        u_upper=jnp.float32(100.))
    fus = fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                              u_lower=jnp.float32(-100.),
                              u_upper=jnp.float32(100.), interpret=True)
    # controls span +-100, so the f32 tolerance scales with the range
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), rtol=1e-4)


def test_rotate_unit_degenerate():
    """rotate_unit follows atan2's (0,0) -> angle-0 convention and
    stays finite (rsqrt(0) would otherwise produce NaN); gradients are
    finite too."""
    from mpc_tpu.ops.math import rotate_unit
    c, s = rotate_unit(jnp.float32(0.0), jnp.float32(0.0),
                       jnp.float32(0.3))
    np.testing.assert_allclose(float(c), np.cos(0.3), rtol=1e-6)
    np.testing.assert_allclose(float(s), np.sin(0.3), rtol=1e-6)

    g = jax.grad(lambda z: rotate_unit(z, jnp.float32(0.0),
                                       jnp.float32(0.3))[0])(
        jnp.float32(0.0))
    assert np.isfinite(float(g))

    # non-degenerate: matches the atan2 form to f32 roundoff
    from mpc_tpu.ops.math import atan2
    th = atan2(jnp.float32(0.8), jnp.float32(-0.6)) + 0.3
    c2, s2 = rotate_unit(jnp.float32(-0.6), jnp.float32(0.8),
                         jnp.float32(0.3))
    np.testing.assert_allclose(float(c2), float(jnp.cos(th)), atol=1e-6)
    np.testing.assert_allclose(float(s2), float(jnp.sin(th)), atol=1e-6)


def test_const_zero_pattern_writable():
    """Regression: when the input already has the full target shape,
    np.broadcast_to returns a contiguous READ-ONLY view; the pattern
    must still be writable (the dispatcher edits the Quu diagonal in
    place — this crashed test_fused_slew_rate_lindx)."""
    from mpc_tpu.ops.fused import _const_zero_pattern
    T, ntau = 4, 5
    full = np.zeros((T, ntau, ntau), np.float32)
    pat = _const_zero_pattern(full, (T, ntau, ntau))
    assert pat is not None
    pat[:, 0, 0] = False            # must not raise
    # broadcastable input too
    pat2 = _const_zero_pattern(np.eye(ntau, dtype=np.float32),
                               (T, ntau, ntau))
    pat2[:, 1, 1] = False
    # tracers and all-nonzero inputs yield None
    assert _const_zero_pattern(np.ones((ntau,), np.float32),
                               (T, ntau)) is None


def test_fused_zero_folding_equivalent():
    """Literal-zero folding of trace-time-concrete shared costs: the
    specialized kernel (diagonal C entries baked as literal 0.0, their
    products dropped from the emitted code) must match the
    unspecialized kernel.  Dropping `+ 0.0 * x` is exact in real
    arithmetic, but removing a term can change how the backend
    CONTRACTS the remaining chain into fused multiply-adds, so the
    comparison allows ulp-scale drift (measured 2.4e-7 on XLA:CPU;
    bitwise-equal on the TPU Mosaic path at B=2048 in the round-5
    hardware A/B)."""
    from mpc_tpu.ops import fused as fused_mod

    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    rng = np.random.RandomState(5)
    B, T = 32, 5
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), jnp.float32)
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(jnp.float32)        # concrete shared diag
    c = jnp.asarray(p, jnp.float32)
    cfg = _cfg(T)

    def run():
        return fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                                   u_lower=jnp.float32(-2.0),
                                   u_upper=jnp.float32(2.0),
                                   interpret=True)

    fold = run()
    # folding actually engaged for this cost
    assert fused_mod._const_zero_pattern(C, (T, 4, 4)) is not None
    orig = fused_mod._const_zero_pattern
    fused_mod._const_zero_pattern = lambda a, shape: None
    try:
        nofold = run()
    finally:
        fused_mod._const_zero_pattern = orig
    np.testing.assert_allclose(np.asarray(fold.u), np.asarray(nofold.u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fold.x), np.asarray(nofold.x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fold.costs),
                               np.asarray(nofold.costs), rtol=1e-5)
    # the accepted line-search alphas must not drift at all
    assert np.array_equal(np.asarray(fold.alpha),
                          np.asarray(nofold.alpha))

    # and the folded kernel still matches the jnp path
    ref = batched_solve(cfg, x0, QuadCost(C, c), dx,
                        u_lower=-2.0, u_upper=2.0)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fold.u),
                               atol=2e-5)


def test_fused_zero_folding_long_kernel():
    """Time-invariant literal-zero folding in the fori-loop kernel's
    stage-cost path (read_cost_data folds entries of a shared concrete
    cost that are zero at EVERY t): equivalent to the unspecialized
    long kernel up to FMA-recontraction drift."""
    from mpc_tpu.ops import fused as fused_mod

    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    rng = np.random.RandomState(9)
    B, T = 32, 132                      # T > 128 routes the long kernel
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), jnp.float32)
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(jnp.float32)
    c = jnp.asarray(p, jnp.float32)
    cfg = _cfg(T)

    def run():
        return fused_batched_solve(cfg, x0, QuadCost(C, c), dx,
                                   u_lower=jnp.float32(-2.0),
                                   u_upper=jnp.float32(2.0),
                                   interpret=True)

    fold = run()
    orig = fused_mod._const_zero_pattern
    fused_mod._const_zero_pattern = lambda a, shape: None
    try:
        nofold = run()
    finally:
        fused_mod._const_zero_pattern = orig
    np.testing.assert_allclose(np.asarray(fold.u), np.asarray(nofold.u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fold.costs),
                               np.asarray(nofold.costs), rtol=1e-5)
    assert np.array_equal(np.asarray(fold.alpha),
                          np.asarray(nofold.alpha))
