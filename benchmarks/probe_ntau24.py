"""Hardware probe: does the fori-loop kernel handle ntau=24/28 (20s/4c,
24s/4c, T=20 box) now that the scoped-VMEM stack request is 40MB?

Round-3 calibrated the _BODY_VOLUME_LIMIT gate at ntau<=23 against
Mosaic's DEFAULT 16MB scoped stack (ntau=24 overflowed it by ~4KB) and
superlinear compile time.  Round 4 raised the requested stack to 40MB
(_LONG_SCOPED_VMEM) — this probe re-tests the boundary with the raised
stack: compile time, correctness vs the jnp path, throughput.

Usage: python benchmarks/probe_ntau24.py [ntau_ns] [ntau_nc] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tpu import MPCConfig, QuadCost, LinDx, GradMethods
from mpc_tpu.learning import batched_solve
from mpc_tpu.ops import fused


def main(n_state=20, n_ctrl=4, B=1024, T=20):
    ntau = n_state + n_ctrl
    print(f'probe: {n_state}s/{n_ctrl}c (ntau={ntau}) T={T} B={B}')
    est = fused._long_vmem_bytes(
        T, n_state, n_ctrl, multi_tile=B > 1024,
        cost_smem=True, dyn_smem=True, lindx=True, has_f=False,
        has_bounds=True, bounds_smem=True, has_uz=False, uz_smem=True)
    print(f'vmem estimate: {est / 2**20:.2f} MB '
          f'(scoped stack request: {fused._LONG_SCOPED_VMEM / 2**20:.0f} MB)')

    rng = np.random.RandomState(3)
    n_sc = n_state + n_ctrl
    A = np.eye(n_state) + 0.01 * rng.randn(n_state, n_state)
    A /= max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
    Bm = 0.1 * rng.randn(n_state, n_ctrl)
    F = jnp.asarray(np.tile(np.concatenate([A, Bm], 1)[None],
                            (T - 1, 1, 1)), jnp.float32)
    C = jnp.asarray(np.diag(np.concatenate(
        [np.ones(n_state), 0.1 * np.ones(n_ctrl)])), jnp.float32)
    c = jnp.zeros(n_sc, jnp.float32)
    x0 = rng.randn(B, n_state).astype(np.float32)

    def run(use):
        cfg = MPCConfig(n_state=n_state, n_ctrl=n_ctrl, T=T, lqr_iter=10,
                        grad_method=GradMethods.ANALYTIC, eps=0.0,
                        exit_unconverged=False, detach_unconverged=False,
                        backprop=False, use_fused=use)
        fn = jax.jit(lambda x0: batched_solve(
            cfg, x0, QuadCost(C, c), LinDx(F, None),
            u_lower=-1.0, u_upper=1.0).u)
        t0 = time.perf_counter()
        compiled = fn.lower(x0).compile()
        compile_s = time.perf_counter() - t0
        ts = []
        for k in range(8):
            xk = x0 + 1e-3 * k
            t0 = time.perf_counter()
            jax.block_until_ready(compiled(xk))
            ts.append(time.perf_counter() - t0)
        dt = np.median(ts)
        print(f'  [{use}] compile {compile_s:.1f}s, {dt*1e3:.1f} ms/batch, '
              f'{B/dt:,.0f} solves/s')
        return np.asarray(compiled(x0))

    # jnp baseline first (fast compile)
    u_jnp = run('never')

    # raise the gates for the probe, restoring them afterwards so an
    # importing benchmark/test session doesn't inherit widened admission
    saved = (fused._BODY_VOLUME_LIMIT, fused._LONG_T_VMEM_LIMIT,
             fused._LONG_T_VMEM_LIMIT_MULTI)
    try:
        fused._BODY_VOLUME_LIMIT = max(fused._BODY_VOLUME_LIMIT, ntau ** 3)
        fused._LONG_T_VMEM_LIMIT = max(
            fused._LONG_T_VMEM_LIMIT, est + 2**20)
        fused._LONG_T_VMEM_LIMIT_MULTI = max(
            fused._LONG_T_VMEM_LIMIT_MULTI, est + 2**20)
        u_fused = run('always')
    finally:
        (fused._BODY_VOLUME_LIMIT, fused._LONG_T_VMEM_LIMIT,
         fused._LONG_T_VMEM_LIMIT_MULTI) = saved

    err = np.max(np.abs(u_fused - u_jnp))
    denom = np.maximum(np.abs(u_jnp), 1e-3)
    rel = np.max(np.abs(u_fused - u_jnp) / denom)
    print(f'  max |du| = {err:.3e}, max rel = {rel:.3e}')
    # self-judging: a silently-wrong kernel at the probed boundary must
    # fail loudly, not just print numbers into a log.  The bound is
    # ABSOLUTE at the mutual-f32-divergence scale: at medium ntau both
    # f32 paths drift ~1.6e-4 from the f64 oracle EQUALLY (round-5
    # probe28_analysis: jnp 1.37e-4 vs fused 1.38e-4 max), so a
    # relative criterion with a small-|u| floor flags correct kernels.
    if not (err < 5e-4 or rel < 1e-3):
        print(f'  FAIL: max |du| {err:.3e} >= 5e-4 (and rel >= 1e-3)')
        sys.exit(1)
    print('  OK (|du| within the mutual f32 divergence bound)')


if __name__ == '__main__':
    a = [int(v) for v in sys.argv[1:]]
    main(*(a or []))
