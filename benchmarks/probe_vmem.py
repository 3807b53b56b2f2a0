"""Probe: can Mosaic's scoped-VMEM limit be raised past 16MB on v5e?

Prior sessions hardware-calibrated the fused-kernel admission gates
against Mosaic lowering OOMs at ~16MB of scoped VMEM (ntau=24 at T=20
overflows by ~4KB).  But no pallas_call in the repo sets
``compiler_params.vmem_limit_bytes`` - 16MB is Mosaic's DEFAULT, not
the v5e's physical VMEM (128MB).  This probe monkeypatches a raised
limit into pl.pallas_call, lifts the dispatch gates, and runs the
previously-OOM shapes on the real chip vs the jnp path.

Usage: python benchmarks/probe_vmem.py [vmem_mb] [ns] [nc] [T] [B]
"""

import sys
import time

# This probe monkeypatches pl.pallas_call and lifts the fused-dispatch
# admission gates AT IMPORT TIME (the patch must land before mpc_tpu
# imports).  That is only safe as a standalone process — refuse import.
if __name__ != '__main__':
    raise ImportError(
        'benchmarks.probe_vmem is a standalone __main__ probe: it '
        'monkeypatches pallas_call and the fused admission gates at '
        'import time. Run it as `python benchmarks/probe_vmem.py`.')

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 100
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
NC = int(sys.argv[3]) if len(sys.argv) > 3 else 4
T = int(sys.argv[4]) if len(sys.argv) > 4 else 20
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1024

_orig = pl.pallas_call


def _patched(*a, **k):
    k.setdefault('compiler_params',
                 pltpu.CompilerParams(vmem_limit_bytes=VMEM_MB * 2 ** 20))
    return _orig(*a, **k)


pl.pallas_call = _patched

from mpc_tpu import GradMethods, MPCConfig, QuadCost          # noqa: E402
from mpc_tpu.types import LinDx                               # noqa: E402
from mpc_tpu.learning import batched_solve                    # noqa: E402
from mpc_tpu.ops import fused                                 # noqa: E402

# lift the calibrated gates for the probe
fused._BODY_VOLUME_LIMIT = 10 ** 9
fused._LONG_T_VMEM_LIMIT = VMEM_MB * 2 ** 20
fused._LONG_T_VMEM_LIMIT_MULTI = VMEM_MB * 2 ** 20


def _problem(ns, nc, T, B, seed=0):
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


def main():
    print(f'devices: {jax.devices()}')
    dyn, cost, x0 = _problem(NS, NC, T, B)
    cfg = MPCConfig(n_state=NS, n_ctrl=NC, T=T, lqr_iter=3,
                    grad_method=GradMethods.ANALYTIC, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=2, use_fused='never')
    est = fused._long_vmem_bytes(
        T, NS, NC, multi_tile=B > 1024,
        **fused._layout_flags(cfg, cost, dyn, jnp.float32(-1.0), None))
    print(f'ntau={NS+NC} T={T} B={B} vmem_limit={VMEM_MB}MB '
          f'estimate={est/2**20:.2f}MB')

    t0 = time.time()
    fus = fused.fused_batched_solve(cfg, x0, cost, dyn,
                                    u_lower=jnp.float32(-1.0),
                                    u_upper=jnp.float32(1.0))
    jax.block_until_ready(fus.u)
    print(f'fused compile+run: {time.time()-t0:.1f}s  -> LOWERED OK')

    ref = batched_solve(cfg, x0, cost, dyn, u_lower=-1.0, u_upper=1.0)
    jax.block_until_ready(ref.u)
    err = float(jnp.max(jnp.abs(ref.u - fus.u)))
    rel = float(jnp.max(jnp.abs(ref.u - fus.u)
                        / jnp.maximum(jnp.abs(ref.u), 1e-3)))
    print(f'max|u_fused - u_jnp| = {err:.3e}, max rel = {rel:.3e}')
    # absolute escape at the mutual-f32-divergence scale: at medium
    # ntau both paths drift ~1.6e-4 from the f64 oracle EQUALLY
    # (probe28_analysis), so rel-with-floor alone flags correct kernels
    if not (err < 5e-4 or rel < 1e-3):
        print(f'FAIL: max |du| {err:.3e} >= 5e-4 (and rel >= 1e-3)')
        sys.exit(1)

    # timing: async pipelined chunk, distinct inputs, single sync
    x0s = [x0 + 0.001 * i for i in range(32)]
    for xs in x0s[:2]:
        jax.block_until_ready(fused.fused_batched_solve(
            cfg, xs, cost, dyn, u_lower=jnp.float32(-1.0),
            u_upper=jnp.float32(1.0)).u)
    t0 = time.time()
    outs = [fused.fused_batched_solve(cfg, xs, cost, dyn,
                                      u_lower=jnp.float32(-1.0),
                                      u_upper=jnp.float32(1.0))
            for xs in x0s]
    jax.block_until_ready([o.u for o in outs])
    dt = (time.time() - t0) / len(x0s)
    print(f'fused: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} solves/s')

    t0 = time.time()
    outs = [batched_solve(cfg, xs, cost, dyn, u_lower=-1.0, u_upper=1.0)
            for xs in x0s]
    jax.block_until_ready([o.u for o in outs])
    dt = (time.time() - t0) / len(x0s)
    print(f'jnp:   {dt*1e3:.2f} ms/batch = {B/dt:,.0f} solves/s')


if __name__ == '__main__':
    main()
