"""Medium-state (ntau > 16) problems through the fori-loop kernel.

The body-volume gate grew by hardware calibration: ntau <= 23 in
round 3 (against Mosaic's DEFAULT 16MB scoped stack, which ntau=24
overflowed by ~4KB), then ntau <= 28 in round 5 once the 40MB stack
request (round 4) removed that wall - 20s/4c runs 5.7x the jnp path at
B=1024 and 8.9x at B=2050 (G=3), 22s/4c and 24s/4c run single-tile
(4.8x/5.1x; their multi-tile VMEM estimates exceed the limit).  At
these dims fused-vs-jnp differ by ~1.6e-4 max: MUTUAL f32 iterate
divergence (both paths equidistant from the f64 oracle), not kernel
error.  These tests pin (a) interpret-mode equivalence of the kernel
at a medium ntau, (b) the dispatch gates at the calibrated boundary so
an estimator regression can't re-introduce the lowering OOM.  Hardware
parity at G=3 (B=2050) is covered by benchmarks/hw_sweep.py.

Reference scope anchor: the reference solver is dimension-generic
(mpc/mpc.py:70-105 takes any n_state/n_ctrl); the fused kernel covers
ntau <= 28 and the XLA path (with linalg.solve_spd) covers the rest.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.types import LinDx
from mpc_tpu.learning import batched_solve
from mpc_tpu.ops.fused import (fused_batched_solve, supports,
                               _long_vmem_bytes, _LONG_T_VMEM_LIMIT,
                               _LONG_T_VMEM_LIMIT_MULTI)


def _medium_problem(ns, nc, T, B, seed=0):
    rng = np.random.RandomState(seed)
    ntau = ns + nc
    A = np.eye(ns) + 0.01 * rng.randn(ns, ns)
    A /= max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
    Bm = 0.1 * rng.randn(ns, nc)
    F = jnp.asarray(np.tile(np.concatenate([A, Bm], 1)[None],
                            (T - 1, 1, 1)), jnp.float32)
    C = jnp.asarray(np.diag(np.concatenate(
        [np.ones(ns), 0.1 * np.ones(nc)])), jnp.float32)
    c = jnp.zeros(ntau, jnp.float32)
    x0 = jnp.asarray(rng.randn(B, ns), jnp.float32)
    return LinDx(F, None), QuadCost(C, c), x0


def _cfg(ns, nc, T, **kw):
    base = dict(n_state=ns, n_ctrl=nc, T=T, lqr_iter=3,
                grad_method=GradMethods.ANALYTIC, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=2, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def test_fused_medium_ntau18_box_matches_jnp():
    ns, nc, T, B = 14, 4, 6, 16
    dyn, cost, x0 = _medium_problem(ns, nc, T, B)
    cfg = _cfg(ns, nc, T)
    assert supports(cfg, cost, dyn, u_lower=jnp.float32(-1.0))
    ref = batched_solve(cfg, x0, cost, dyn, u_lower=-1.0, u_upper=1.0)
    fus = fused_batched_solve(cfg, x0, cost, dyn,
                              u_lower=jnp.float32(-1.0),
                              u_upper=jnp.float32(1.0), interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(ref.costs),
                               np.asarray(fus.costs), rtol=1e-5)


def test_fused_medium_ntau18_unconstrained_matches_jnp():
    ns, nc, T, B = 14, 4, 6, 16
    dyn, cost, x0 = _medium_problem(ns, nc, T, B, seed=1)
    cfg = _cfg(ns, nc, T)
    assert supports(cfg, cost, dyn)
    ref = batched_solve(cfg, x0, cost, dyn)
    fus = fused_batched_solve(cfg, x0, cost, dyn, interpret=True)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(fus.u),
                               atol=3e-5)


def test_medium_dispatch_gates():
    # the hardware-calibrated boundary, per grid regime.  Single tile
    # (B <= 1024, G=1): 16s/4c, 18s/4c, 19s/4c and 16s/5c at T=20 all
    # lowered + ran on a v5e, exactly matching the jnp path; 20s/4c
    # overflowed Mosaic's 16MB VMEM stack by ~4KB.  Multi tile (G>1,
    # double-buffered blocked operands): 16s/4c ran at G=3, while
    # 19s/4c OOMed at G=2 (17.54M observed) despite running at G=1 -
    # so the gate must flip on the batch size, and callers that don't
    # pass one get the conservative multi-tile answer.
    # round-4: with the raised scoped-VMEM stack (_LONG_SCOPED_VMEM)
    # the G>1 medium configs that OOM'd Mosaic's 16MB default are
    # admitted (19s/4c at G=2 hardware-validated); T=64 medium stays
    # out on VMEM.  Round-5 (probe_ntau24 + validate_ntau_boundary on
    # hardware): the body gate extends to ntau<=28 - 20s/4c runs at
    # B=1024 (5.7x jnp) AND B=2050/G=3 (8.9x; multi est 16.50MB <=
    # 17MB); 22s/4c and 24s/4c run single-tile (4.8x/5.1x) but their
    # multi-tile estimates (18.3/20.3MB) exceed the multi limit;
    # 25s/4c (ntau=29) stays out on the body gate.
    for ns, nc, T, B, expect in [
            (16, 4, 20, 1024, True), (18, 4, 20, 1024, True),
            (19, 4, 20, 1024, True), (16, 5, 20, 1024, True),
            (20, 4, 20, 1024, True), (16, 4, 64, 1024, False),
            (16, 4, 20, 2048, True), (18, 4, 20, 2048, True),
            (19, 4, 20, 2048, True), (16, 5, 20, 2048, True),
            (19, 4, 20, None, True),
            (20, 4, 20, 2048, True), (22, 4, 20, 1024, True),
            (22, 4, 20, 2048, False), (24, 4, 20, 1024, True),
            (24, 4, 20, 2048, False), (25, 4, 20, 1024, False)]:
        dyn, cost, x0 = _medium_problem(ns, nc, T, 8)
        cfg = _cfg(ns, nc, T)
        got = supports(cfg, cost, dyn, u_lower=jnp.float32(-1.0),
                       n_batch=B)
        assert got == expect, (ns, nc, T, B, got)


def test_vmem_estimate_tracks_oom_boundary():
    # the estimator must admit the largest shapes that lowered + ran
    # on hardware UNDER THE RAISED SCOPED-VMEM STACK (round 4;
    # _LONG_SCOPED_VMEM) and reject the shapes past the validated
    # operational boundary, in both grid regimes
    kw_p = dict(cost_smem=True, dyn_smem=False, bounds_smem=True,
                uz_smem=True, has_uz=False, has_bounds=True,
                has_f=False, lindx=False)
    # G=1: pendulum T=384 (est 18.17MB) lowered and ran; T=512
    # (est 24.17MB) exceeded the compile budget on this rig
    ok = _long_vmem_bytes(384, 3, 1, multi_tile=False, **kw_p)
    fail = _long_vmem_bytes(512, 3, 1, multi_tile=False, **kw_p)
    assert ok <= _LONG_T_VMEM_LIMIT < fail
    # G>1: pendulum T=256 at G=2 (est 16.17MB - the round-3 OOM
    # config on the 16MB default stack) and 19s/4c at G=2
    # (est 15.60MB) ran with the raised stack
    kw = dict(cost_smem=True, dyn_smem=True, bounds_smem=True,
              uz_smem=True, has_uz=False, has_bounds=True,
              has_f=False, lindx=True)
    ok_m = max(_long_vmem_bytes(256, 3, 1, multi_tile=True, **kw_p),
               _long_vmem_bytes(20, 19, 4, multi_tile=True, **kw))
    assert ok_m <= _LONG_T_VMEM_LIMIT_MULTI < _LONG_T_VMEM_LIMIT
