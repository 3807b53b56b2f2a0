#!/usr/bin/env python
"""Multi-tile (G>1) hardware boundary sweep of the fused kernels.

The CPU suite runs the kernels in interpret mode, which executes the
kernel math but NOT Mosaic's TPU lowering - block-shape rules, SMEM
row padding, DMA descriptor lowering, and grid-sequential semantics
only bite on hardware.  Round 3 found a G>1 crash this way (the
shared-layout backward's SMEM output blocks): every B<=1024 test sat
exactly on the one-tile boundary and hid it.  This sweep drives every
fused-path mode at B=2050 (three grid programs, padded last tile) on
the real chip and checks against the jnp path on the same chip.

Usage: python benchmarks/hw_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, LinDx, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import PendulumDx

B = 2050          # 3 grid programs; last tile padded (2050 = 2*1024+2)


def _pend_x0(rng, benign=False):
    th = (0.4 if benign else np.pi) * (2 * rng.rand(B) - 1)
    return jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1),
                       jnp.float32)


def _compare(tag, cfg, run, tol_mean=1e-4, tol_frac=0.01):
    """fused vs jnp path on the same chip; bang-bang switch flips make
    isolated entries O(bound) in f32, so gate on mean + flip fraction
    (the same bound as parity_tpu check [1]).  Gates are calibrated
    per case: u_zero kinks amplify the f32 iterate divergence ~30x
    (measured growth: mean 6e-7 at lqr_iter=1-3, 1e-4 by 6 - chaotic
    switch-step amplification, identical through iteration 3, NOT a
    layout bug)."""
    u_f = np.asarray(run(cfg))
    u_j = np.asarray(run(dataclasses.replace(cfg, use_fused='never')))
    d = np.abs(u_f - u_j)
    print(f'[{tag}] max {d.max():.3e} mean {d.mean():.3e} '
          f'frac>1e-3 {np.mean(d > 1e-3):.5f}')
    assert d.mean() < tol_mean and np.mean(d > 1e-3) < tol_frac, tag


def base_cfg(**kw):
    d = dict(n_state=3, n_ctrl=1, T=20, lqr_iter=6,
             grad_method=GradMethods.AUTO_DIFF, eps=0.0,
             exit_unconverged=False, detach_unconverged=False,
             backprop=False, linesearch_decay=0.2,
             max_linesearch_iter=3)
    d.update(kw)
    return MPCConfig(**d)


def sweep_pendulum_uzero_shared():
    rng = np.random.RandomState(0)
    x0 = _pend_x0(rng)
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    C, c = jnp.diag(q).astype(jnp.float32), jnp.asarray(p, jnp.float32)
    uz = jnp.zeros((20, 1), bool).at[3:6, 0].set(True)
    cfg = base_cfg()
    _compare('uzero shared', cfg, lambda cfg_: jax.jit(
        lambda x: batched_solve(cfg_, x, QuadCost(C, c), dx,
                                u_lower=-2., u_upper=2.,
                                u_zero_I=uz).u)(x0),
             tol_mean=3e-4)


def sweep_pendulum_uzero_batched():
    rng = np.random.RandomState(1)
    x0 = _pend_x0(rng)
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    C, c = jnp.diag(q).astype(jnp.float32), jnp.asarray(p, jnp.float32)
    uz = jnp.asarray(rng.rand(20, B, 1) < 0.15)
    cfg = base_cfg()
    _compare('uzero batched', cfg, lambda cfg_: jax.jit(
        lambda x: batched_solve(cfg_, x, QuadCost(C, c), dx,
                                u_lower=-2., u_upper=2.,
                                u_zero_I=uz).u)(x0),
             tol_mean=3e-4)


def sweep_mixed_cost_layout():
    """Shared C + per-example c (round 5: the short kernel runs the
    mixed pair SPLIT - C on SMEM with literal-zero folding, c as a
    blocked VMEM operand; ops/fused.py:_layout_flags).  Also pins the
    mixed solve against the fully-broadcast fused solve: observed
    bitwise-equal on the Mosaic path, gated at ulp scale (1e-6)
    because the folding may recontract FMA chains."""
    rng = np.random.RandomState(9)
    x0 = _pend_x0(rng)
    dx = PendulumDx()
    q, _ = dx.get_true_obj()
    C = jnp.diag(q).astype(jnp.float32)                 # shared [4, 4]
    goal_th = np.pi * (2 * rng.rand(B) - 1)
    goal = np.stack([np.cos(goal_th), np.sin(goal_th),
                     np.zeros(B), np.zeros(B)], 1)
    c = jnp.asarray(np.broadcast_to(
        -(np.asarray(q)[None, None] * goal[None]),
        (20, B, 4)), jnp.float32)                       # batched goals
    cfg = base_cfg()
    run = lambda cfg_, C_: jax.jit(
        lambda x: batched_solve(cfg_, x, QuadCost(C_, c), dx,
                                u_lower=-2., u_upper=2.).u)(x0)
    _compare('mixed cost layout (shared C + batched c)', cfg,
             lambda cfg_: run(cfg_, C), tol_mean=3e-4)
    u_mixed = np.asarray(run(cfg, C))
    u_bcast = np.asarray(run(cfg, jnp.broadcast_to(C, (20, B, 4, 4))))
    derr = np.abs(u_mixed - u_bcast).max()
    assert derr <= 1e-6, f'mixed vs broadcast max|du| = {derr:.2e}'
    print(f'[mixed cost layout] split vs fully-broadcast fused '
          f'max|du| = {derr:.2e}'
          + (' (bitwise)' if derr == 0 else ''))


def sweep_pendulum_slew():
    rng = np.random.RandomState(2)
    x0 = _pend_x0(rng)
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    C, c = jnp.diag(q).astype(jnp.float32), jnp.asarray(p, jnp.float32)
    pc = jnp.asarray(0.1 * rng.randn(B, 1).astype(np.float32))
    cfg = base_cfg(slew_rate_penalty=0.5)
    _compare('slew + prev_ctrl', cfg, lambda cfg_: jax.jit(
        lambda x: batched_solve(cfg_, x, QuadCost(C, c), dx,
                                u_lower=-2., u_upper=2.,
                                prev_ctrl=pc).u)(x0))


def sweep_lindx_delta_u():
    ns, nc, T = 3, 2, 8
    ntau = ns + nc
    rng = np.random.RandomState(3)
    Cr = rng.randn(T, B, ntau, ntau).astype(np.float32)
    C = np.einsum('tbij,tbkj->tbik', Cr, Cr) + np.eye(
        ntau, dtype=np.float32)
    c = rng.randn(T, B, ntau).astype(np.float32)
    F = np.concatenate([
        np.tile(np.eye(ns, dtype=np.float32), (T - 1, B, 1, 1))
        + 0.1 * rng.randn(T - 1, B, ns, ns).astype(np.float32),
        0.4 * rng.randn(T - 1, B, ns, nc).astype(np.float32)], 3)
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    lb = jnp.asarray(-np.abs(rng.randn(T, B, nc)).astype(np.float32) - .1)
    ub = jnp.asarray(np.abs(rng.randn(T, B, nc)).astype(np.float32) + .1)
    pc = jnp.asarray(0.05 * rng.randn(B, nc).astype(np.float32))
    cfg = base_cfg(n_state=ns, n_ctrl=nc, T=T, delta_u=0.3,
                   grad_method=GradMethods.ANALYTIC, pnqp_iter=20,
                   lqr_iter=8)
    _compare('delta_u + batched bounds + prev_ctrl', cfg,
             lambda cfg_: jax.jit(
                 lambda x: batched_solve(
                     cfg_, x, QuadCost(jnp.asarray(C), jnp.asarray(c)),
                     LinDx(jnp.asarray(F), None), u_lower=lb, u_upper=ub,
                     prev_ctrl=pc).u)(x0),
             tol_mean=1e-4, tol_frac=0.01)


def sweep_lindx_long_streamed(T=140):
    """Batched LinDx + batched cost at T>128: the fori-loop kernel with
    (C|c)/(F|f) HBM DMA streams indexed by program id."""
    ns, nc = 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(4)
    Cd = np.zeros((T, B, ntau, ntau), np.float32)
    Cd[..., np.arange(ntau), np.arange(ntau)] = \
        0.5 + rng.rand(T, B, ntau).astype(np.float32)
    c = 0.3 * rng.randn(T, B, ntau).astype(np.float32)
    A = np.eye(ns, dtype=np.float32) \
        + 0.02 * rng.randn(T - 1, B, ns, ns).astype(np.float32)
    Bm = 0.1 * rng.randn(T - 1, B, ns, nc).astype(np.float32)
    F = np.concatenate([A, Bm], 3)
    f = 0.01 * rng.randn(T - 1, B, ns).astype(np.float32)
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    cfg = base_cfg(n_state=ns, n_ctrl=nc, T=T, lqr_iter=4,
                   grad_method=GradMethods.ANALYTIC)
    _compare(f'long streamed LinDx T={T}', cfg, lambda cfg_: jax.jit(
        lambda x: batched_solve(
            cfg_, x, QuadCost(jnp.asarray(Cd), jnp.asarray(c)),
            LinDx(jnp.asarray(F), jnp.asarray(f)),
            u_lower=-1., u_upper=1.).u)(x0))


def sweep_lindx_long_shared(T=140):
    """Shared LinDx + shared cost at T>128: the fori-loop kernel's SMEM
    dynamic-t reads."""
    ns, nc = 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(5)
    Cd = np.diag([1., 1., .1, .01]).astype(np.float32)
    C = np.broadcast_to(Cd, (T, ntau, ntau)).copy()
    c = 0.1 * rng.randn(T, ntau).astype(np.float32)
    A = np.eye(ns, dtype=np.float32)
    A[0, 1] = 0.01
    F = np.broadcast_to(
        np.concatenate([A, 0.05 * np.ones((ns, nc), np.float32)], 1),
        (T - 1, ns, ntau)).copy()
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    cfg = base_cfg(n_state=ns, n_ctrl=nc, T=T, lqr_iter=4,
                   grad_method=GradMethods.ANALYTIC)
    _compare(f'long shared LinDx T={T}', cfg, lambda cfg_: jax.jit(
        lambda x: batched_solve(
            cfg_, x, QuadCost(jnp.asarray(C), jnp.asarray(c)),
            LinDx(jnp.asarray(F), None), u_lower=-1., u_upper=1.).u)(x0))


def sweep_nn_param_stream():
    """hidden=100 NNDynamics: SMEM param-streaming matvec (fori-loop
    kernel) at G>1.  A stiff random MLP amplifies f32 Jacobian
    rounding into line-search alpha flips (measured: B=1024/G=1 vs
    jnp diverges identically to B=2050/G=3, mean ~8e-4 by lqr_iter=3,
    5.6e-4 max at iter 1), so fused-vs-jnp only gets a loose sanity
    gate; the sharp G>1 check is PREFIX INVARIANCE - lanes are
    independent, so the B=2050 solve restricted to the first 1024
    examples must equal the B=1024 solve BITWISE."""
    from mpc_tpu.models import NNDynamics
    rng = np.random.RandomState(6)
    dx = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                         hidden_sizes=[100])
    x0_np = rng.randn(B, 3).astype(np.float32) * 0.3
    Cd = jnp.diag(jnp.asarray([1., 1., .1, .01], jnp.float32))
    c = jnp.zeros((4,), jnp.float32)
    cfg = base_cfg(lqr_iter=3, grad_method=GradMethods.AUTO_DIFF, T=12)

    def run(cfg_, x):
        return np.asarray(jax.jit(lambda xi: batched_solve(
            cfg_, xi, QuadCost(Cd, c), dx,
            u_lower=-2., u_upper=2.).u)(jnp.asarray(x)))

    u_g3 = run(cfg, x0_np)
    u_g1 = run(cfg, x0_np[:1024])
    same = np.array_equal(u_g3[:, :1024], u_g1)
    d = np.abs(u_g3 - run(dataclasses.replace(cfg, use_fused='never'),
                          x0_np))
    print(f'[NNDynamics hidden=100 param-stream] G3-prefix==G1 '
          f'bitwise: {same}; vs jnp mean {d.mean():.3e}')
    assert same, 'G>1 changed per-lane results'
    assert d.mean() < 2e-3


def sweep_soa_cost():
    """Non-quadratic PseudoHuber cost: in-kernel quadratization at G>1."""
    from mpc_tpu.models import PseudoHuberCost
    rng = np.random.RandomState(7)
    x0 = _pend_x0(rng, benign=True)
    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    cost = PseudoHuberCost(
        w=jnp.asarray([1., 1., .1, .1], jnp.float32),
        goal=jnp.asarray([1., 0., 0., 0.], jnp.float32),
        delta=jnp.float32(0.9))
    cfg = base_cfg(lqr_iter=6)
    _compare('PseudoHuber SoA cost', cfg, lambda cfg_: jax.jit(
        lambda x: batched_solve(cfg_, x, cost, dx,
                                u_lower=-2., u_upper=2.).u)(x0))


def sweep_backward_shared(T=10):
    """Imitation gradients (shared learned cost) at G>1 through the
    fused KKT-backward kernel - the round-3 crash case."""
    rng = np.random.RandomState(8)
    x0 = _pend_x0(rng)
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(jnp.float32)
    u_exp = jnp.asarray(np.clip(rng.randn(T, B, 1), -2, 2), np.float32)
    cfg = base_cfg(T=T, lqr_iter=3, backprop=True)

    def run(cfg_):
        def loss(cv):
            sol = batched_solve(cfg_, x0, QuadCost(C, cv), dx,
                                u_lower=-2., u_upper=2.)
            return jnp.mean((sol.u - u_exp) ** 2)
        return jax.jit(jax.grad(loss))(jnp.asarray(p, jnp.float32))

    g_f = np.asarray(run(cfg))
    g_j = np.asarray(run(dataclasses.replace(cfg, use_fused='never')))
    rel = np.abs(g_f - g_j).max() / (np.abs(g_j).max() + 1e-9)
    print(f'[backward shared G=3] grad rel diff {rel:.3e}')
    assert rel < 5e-3, rel


def sweep_backward_long_shared(T=130):
    """Long-horizon backward (fori-loop kernel) at G>1.

    Checked SAME-PRIMAL: both backward layers get the identical
    converged trajectory.  (An end-to-end fused-vs-jnp gradient
    comparison is NOT a kernel check here: with ~26% of controls on
    the bounds, a 4e-5 phase-1 iterate difference flips borderline
    lanes' active-set membership and discontinuously changes their
    gradient contribution - measured 17% on the worst entry while the
    same-primal gradients agree to 2e-7.  That discontinuity is
    intrinsic to active-set differentiation, reference included.)"""
    from mpc_tpu.ops import fused_bwd
    from mpc_tpu.ops.diff import make_lqr_fixed_point

    ns, nc = 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(9)
    A = np.eye(ns, dtype=np.float32)
    A[0, 1] = 0.01
    F = jnp.asarray(np.broadcast_to(
        np.concatenate([A, 0.01 * np.ones((ns, nc), np.float32)], 1),
        (T - 1, ns, ntau)).copy())
    C = jnp.broadcast_to(
        jnp.asarray(np.diag([1., 1., .1, .01]).astype(np.float32)),
        (T, ntau, ntau))
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    u_exp = jnp.asarray(0.1 * rng.randn(T, B, nc).astype(np.float32))
    cv = jnp.zeros((T, ntau), jnp.float32)
    cfg = base_cfg(n_state=ns, n_ctrl=nc, T=T, lqr_iter=3,
                   grad_method=GradMethods.ANALYTIC)

    sol = jax.jit(lambda x: batched_solve(
        cfg, x, QuadCost(C, cv), LinDx(F, None),
        u_lower=-2., u_upper=2.))(x0)
    bx, bu = jax.lax.stop_gradient(sol.x), jax.lax.stop_gradient(sol.u)
    lb = jnp.full((T, B, nc), -2.0, jnp.float32)
    ub = jnp.full((T, B, nc), 2.0, jnp.float32)
    f_z = jnp.zeros((T - 1, ns), jnp.float32)

    def grad_from(fp):
        def run(cv_):
            _, u = fp(x0, C, cv_, F, f_z, lb, ub, bx, bu)
            return jnp.mean((u - u_exp) ** 2)
        return np.asarray(jax.jit(jax.grad(run))(cv))

    fp_k = fused_bwd.make_batched_fixed_point(ns, True, False)
    assert fused_bwd._bwd_route_long(T, ns, nc, True, True)
    fp_j_one = make_lqr_fixed_point(ns, True, False)

    def fp_j(x0_, C_, c_, F_, ff, lb_, ub_, bx_, bu_):
        return jax.vmap(fp_j_one,
                        in_axes=(0, None, None, None, None, 1, 1, 1, 1),
                        out_axes=(1, 1))(x0_, C_, c_, F_, ff, lb_, ub_,
                                         bx_, bu_)

    g_k = grad_from(fp_k)
    with jax.default_matmul_precision('float32'):
        g_j = grad_from(fp_j)
    rel = np.abs(g_k - g_j).max() / (np.abs(g_j).max() + 1e-9)
    cos = float(np.sum(g_k * g_j) /
                (np.linalg.norm(g_k) * np.linalg.norm(g_j) + 1e-30))
    print(f'[backward long shared T=130 G=3] same-primal grad rel '
          f'{rel:.3e}, cosine {cos:.6f}')
    assert rel < 1e-4, rel
    assert cos > 0.999999, cos


def sweep_backward_long_batched(T=131):
    """Long-horizon backward with BATCHED (C, c, F): per-program HBM
    stream-in of the operands and stream-out of the per-example
    (dC|dc)/(dF|df) slices at G>1 (the gi-indexed DMA descriptors).
    Same-primal check against the jnp backward layer."""
    from mpc_tpu.ops import fused_bwd
    from mpc_tpu.ops.diff import make_lqr_fixed_point

    ns, nc = 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(11)
    Cr = rng.randn(T, B, ntau, ntau).astype(np.float32)
    C = jnp.asarray(np.einsum('tbij,tbkj->tbik', Cr, Cr)
                    + np.eye(ntau, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, ntau).astype(np.float32))
    Fn = 0.3 * rng.randn(T - 1, B, ns, ntau).astype(np.float32)
    Fn[..., :, :ns] += 0.8 * np.eye(ns, dtype=np.float32)
    F = jnp.asarray(Fn)
    f = jnp.asarray(0.1 * rng.randn(T - 1, B, ns).astype(np.float32))
    xs = jnp.asarray(rng.randn(T, B, ns).astype(np.float32))
    us = np.random.RandomState(12).randn(T, B, nc).astype(np.float32)
    m = rng.rand(T, B, nc) < 0.3
    us = jnp.asarray(np.where(m, np.sign(us), us).astype(np.float32))
    lb = jnp.full((T, B, nc), -1.0, jnp.float32)
    ub = jnp.full((T, B, nc), 1.0, jnp.float32)
    gx = jnp.asarray(rng.randn(T, B, ns).astype(np.float32))
    gu = jnp.asarray(rng.randn(T, B, nc).astype(np.float32))
    x0 = jnp.zeros((B, ns), jnp.float32)

    assert fused_bwd._bwd_route_long(T, ns, nc, False, False)
    fp_k = fused_bwd.make_batched_fixed_point(ns, True, True)
    fp_j_one = make_lqr_fixed_point(ns, True, True)

    def grads(fp, vmapped):
        def run(args):
            if vmapped:
                out = jax.vmap(fp, in_axes=(0, 1, 1, 1, 1, 1, 1, 1, 1),
                               out_axes=(1, 1))(*args)
            else:
                out = fp(*args)
            return jnp.sum(out[0] * gx) + jnp.sum(out[1] * gu)
        return jax.jit(jax.grad(run))((x0, C, c, F, f, lb, ub, xs, us))

    g_k = grads(fp_k, False)
    with jax.default_matmul_precision('float32'):
        g_j = grads(fp_j_one, True)
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_k)[:5],
                    jax.tree_util.tree_leaves(g_j)[:5]):
        a, b = np.asarray(a), np.asarray(b)
        worst = max(worst, np.abs(a - b).max() /
                    (np.abs(b).max() + 1e-9))
    print(f'[backward long batched T={T} G=3] same-primal grad rel '
          f'{worst:.3e}')
    assert worst < 1e-4, worst


def sweep_backward_medium_batched(ns=16, nc=4, T=20):
    """Round-4 admission: BATCHED-layout medium-ntau KKT backward
    through the fori-loop kernel (raised scoped-VMEM stack; buffer
    sharing + dx/du aliasing).  Same-primal check vs the
    f32-precision jnp backward at G=3 — the 16s/4c config measured an
    18.3MB Mosaic stack and beat the jnp phase 2 1.19x (ntau=23:
    1.9x, exact to 6e-7; BASELINE.md round-4)."""
    from mpc_tpu.ops import fused_bwd
    from mpc_tpu.ops.diff import make_lqr_fixed_point

    ntau = ns + nc
    rng = np.random.RandomState(13)
    Cr = rng.randn(T, B, ntau, ntau).astype(np.float32)
    C = jnp.asarray(np.einsum('tbij,tbkj->tbik', Cr, Cr) / ntau
                    + np.eye(ntau, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, ntau).astype(np.float32))
    Fn = (0.3 / np.sqrt(ns)) * rng.randn(T - 1, B, ns,
                                         ntau).astype(np.float32)
    Fn[..., :, :ns] += 0.9 * np.eye(ns, dtype=np.float32)
    F = jnp.asarray(Fn)
    f = jnp.asarray(0.05 * rng.randn(T - 1, B, ns).astype(np.float32))
    xs = jnp.asarray(rng.randn(T, B, ns).astype(np.float32))
    us = rng.randn(T, B, nc).astype(np.float32)
    m = rng.rand(T, B, nc) < 0.3
    us = jnp.asarray(np.where(m, np.sign(us), us).astype(np.float32))
    lb = jnp.full((T, B, nc), -1.0, jnp.float32)
    ub = jnp.full((T, B, nc), 1.0, jnp.float32)
    gx = jnp.asarray(rng.randn(T, B, ns).astype(np.float32))
    gu = jnp.asarray(rng.randn(T, B, nc).astype(np.float32))
    x0 = jnp.zeros((B, ns), jnp.float32)

    assert fused_bwd._bwd_route_long(T, ns, nc, False, False)
    assert fused_bwd.supports_bwd(T, ns, nc, jnp.float32, False, False)
    fp_k = fused_bwd.make_batched_fixed_point(ns, True, True)
    fp_j = make_lqr_fixed_point(ns, True, True)

    def grads(fp, vmapped):
        def run(args):
            if vmapped:
                out = jax.vmap(fp, in_axes=(0, 1, 1, 1, 1, 1, 1, 1, 1),
                               out_axes=(1, 1))(*args)
            else:
                out = fp(*args)
            return jnp.sum(out[0] * gx) + jnp.sum(out[1] * gu)
        return jax.jit(jax.grad(run))((x0, C, c, F, f, lb, ub, xs, us))

    g_k = grads(fp_k, False)
    with jax.default_matmul_precision('float32'):
        g_j = grads(fp_j, True)
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_k)[:5],
                    jax.tree_util.tree_leaves(g_j)[:5]):
        a, b = np.asarray(a), np.asarray(b)
        worst = max(worst, np.abs(a - b).max() /
                    (np.abs(b).max() + 1e-9))
    print(f'[backward medium batched {ns}s/{nc}c T={T} G=3] '
          f'same-primal grad rel {worst:.3e}')
    assert worst < 1e-4, worst


if __name__ == '__main__':
    sweep_pendulum_uzero_shared()
    sweep_pendulum_uzero_batched()
    sweep_mixed_cost_layout()
    sweep_pendulum_slew()
    sweep_lindx_delta_u()
    sweep_lindx_long_streamed()
    sweep_lindx_long_shared()
    sweep_nn_param_stream()
    sweep_soa_cost()
    sweep_backward_shared()
    sweep_backward_long_shared()
    sweep_backward_long_batched()
    sweep_backward_medium_batched()
    print('ALL G>1 HARDWARE SWEEPS PASS')
