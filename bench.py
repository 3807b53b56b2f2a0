#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json config 2 / north star): batched pendulum
swing-up MPC solves/sec on one chip - T=20, lqr_iter=10 fixed budget,
box constraints +-2, PNQP inner solver, AUTO_DIFF (jacrev) linearization,
float32.

vs_baseline is the ratio to the PyTorch reference running the identical
workload on this host's CPU (the reference publishes no numbers -
BASELINE.md); the measured denominator is cached in BENCH_BASELINE.json.

Usage:
  python bench.py                 # headline metric, one JSON line
  python bench.py --all           # also run the other BASELINE configs
  python bench.py --remeasure-baseline
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _pendulum_inputs(B, T, dtype):
    import jax.numpy as jnp
    from mpc_tpu.models import PendulumDx

    dx = PendulumDx()
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    q, p = dx.get_true_obj()
    C = jnp.broadcast_to(jnp.diag(q).astype(dtype), (T, B, 4, 4))
    c = jnp.broadcast_to(jnp.asarray(p, dtype), (T, B, 4))
    lb = jnp.full((T, B, 1), -2.0, dtype)
    ub = jnp.full((T, B, 1), 2.0, dtype)
    return dx, x0, C, c, lb, ub


def bench_pendulum(B=4096, T=20, iters=120, warmup=2, profile_dir=None,
                   device_loop=False, sustained=False, merge_cap=1048576):
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import PendulumDx

    dtype = jnp.float32
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    # batch-shared cost + scalar bounds (the workload's actual structure;
    # they ride SMEM on the fused path instead of [T, B, ...] arrays)
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)
    cfg = MPCConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=10,
        grad_method=GradMethods.AUTO_DIFF, eps=0.0,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        linesearch_decay=0.2, max_linesearch_iter=5)

    solve = lambda x0: batched_solve(
        cfg, x0, QuadCost(C, c), dx, u_lower=-2.0, u_upper=2.0).u
    fn = jax.jit(solve)

    # distinct inputs per iteration: the remote-execution layer dedupes
    # repeated identical executions, which would fake the timing
    rng = np.random.RandomState(0)
    x0s = []
    for _ in range(warmup + iters):
        th = np.pi * (2 * rng.rand(B) - 1)
        x0s.append(jnp.asarray(
            np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dtype))

    if sustained:
        # SUSTAINED serving throughput: the per-call number pays a
        # per-kernel-launch overhead that this rig's tunneled runtime
        # inflates to 0.2-1.2ms (BASELINE.md round-4 occupancy
        # analysis); a serving system under sustained load instead
        # AGGREGATES queued B-sized requests into larger kernel
        # launches (each solve is independent, results are identical
        # per request).  Merge the iters requests into launches of up
        # to ``merge_cap`` solves so the launch overhead amortizes and
        # the wall rate approaches the kernel's intrinsic ~69 ns/solve
        # (measured sweep: 11.7M at 256k/launch -> 13.8M at 1M/launch,
        # 96% of intrinsic; 2M/launch adds nothing).  Distinct inputs
        # per request (the remote layer dedupes identical executions).
        # at least 3 launches so the first launch's queueing doesn't
        # dominate, each as many B-request multiples as the cap allows
        per_launch = max(B, min((merge_cap // B) * B,
                                (iters // 3) * B if iters >= 3 else B))
        n_launch = max(1, (iters * B) // per_launch)

        def mk_chunk(seed):
            r = np.random.RandomState(seed)
            th = np.pi * (2 * r.rand(per_launch) - 1)
            return jnp.asarray(np.stack(
                [np.cos(th), np.sin(th), np.zeros(per_launch)], 1), dtype)

        chunks = [mk_chunk(100 + k) for k in range(n_launch)]
        jax.block_until_ready(fn(mk_chunk(7)))       # warm the shape
        if profile_dir:
            prof = jax.profiler.trace(profile_dir,
                                      create_perfetto_trace=True)
        else:
            import contextlib
            prof = contextlib.nullcontext()
        with prof:
            t0 = time.perf_counter()
            outs = [fn(ch) for ch in chunks]
            jax.block_until_ready(outs)
            wall = time.perf_counter() - t0
        total = per_launch * n_launch
        return total / wall, wall / (total // B)

    if device_loop:
        # device-resident serving loop: ONE dispatch runs all iters as a
        # lax.map over stacked distinct inputs, so per-call dispatch
        # overhead (the tunneled runtime's weak spot - see the roofline
        # occupancy analysis in BASELINE.md) is paid once instead of
        # per batch.  Same solves, same distinct inputs.  The warmup
        # chunk must have the SAME leading length (a different length
        # is a different shape -> the timed call would recompile) and
        # DISTINCT data (the remote layer dedupes identical executions).
        loop = jax.jit(lambda xs: jax.lax.map(solve, xs))
        rng_w = np.random.RandomState(1)
        th_w = np.pi * (2 * rng_w.rand(iters, B) - 1)
        xs_w = jnp.asarray(np.stack(
            [np.cos(th_w), np.sin(th_w), np.zeros((iters, B))], 2), dtype)
        xs = jnp.stack(x0s[warmup:])
        jax.block_until_ready(loop(xs_w))
        if profile_dir:
            prof = jax.profiler.trace(profile_dir,
                                      create_perfetto_trace=True)
        else:
            import contextlib
            prof = contextlib.nullcontext()
        with prof:
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xs))
            dt = (time.perf_counter() - t0) / iters
        return B / dt, dt

    for k in range(warmup):
        jax.block_until_ready(fn(x0s[k]))
    # one large async-pipelined chunk with a single final sync: the
    # tunnel round-trip (tens of ms, drifting) is paid once and
    # amortized over all iters, so the estimate is a slight
    # UNDER-estimate of throughput - stable and conservative
    rest = x0s[warmup:]
    if profile_dir:
        # jax.profiler trace of the timed section (inspect with
        # tensorboard or xprof); SURVEY section 5 tracing subsystem
        import contextlib
        # perfetto JSON alongside the xplane pb: benchmarks/roofline.py
        # parses it for trace-derived occupancy / achieved-FLOP numbers
        prof = jax.profiler.trace(profile_dir,
                                  create_perfetto_trace=True)
    else:
        import contextlib
        prof = contextlib.nullcontext()
    with prof:
        t0 = time.perf_counter()
        outs = [fn(x) for x in rest]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / len(rest)
    return B / dt, dt


def measure_reference_baseline(B=256, T=20, runs=3):
    """Run the PyTorch reference on the identical workload (CPU)."""
    sys.path.insert(0, '/root/reference')
    import torch
    torch.set_num_threads(max(1, os.cpu_count()))
    from mpc import mpc as ref_mpc
    from mpc.mpc import QuadCost, GradMethods

    class TorchPendulum(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.params = torch.tensor([10., 1., 1.])

        def forward(self, x, u):
            g, m, l = torch.unbind(self.params)
            dt = 0.05
            u = torch.clamp(u, -2., 2.)[:, 0]
            cos_th, sin_th, dth = torch.unbind(x, dim=1)
            newdth = dth + dt * (-3. * g / (2. * l) * (-sin_th)
                                 + 3. * u / (m * l ** 2))
            newth = torch.atan2(sin_th, cos_th) + newdth * dt
            return torch.stack(
                (torch.cos(newth), torch.sin(newth), newdth), dim=1)

    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = torch.tensor(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1),
                      dtype=torch.float32)
    Q = torch.diag(torch.tensor([1., 1., 0.1, 0.001]))
    p = torch.tensor([-1., 0., 0., 0.])
    dx = TorchPendulum()

    def solve():
        ctrl = ref_mpc.MPC(3, 1, T, -2.0, 2.0, lqr_iter=10, n_batch=B,
                           backprop=False, exit_unconverged=False,
                           detach_unconverged=False, verbose=-1, eps=0.0,
                           grad_method=GradMethods.AUTO_DIFF,
                           linesearch_decay=0.2, max_linesearch_iter=5)
        return ctrl(x0, QuadCost(Q, p), dx)

    solve()  # warmup
    t0 = time.perf_counter()
    for _ in range(runs):
        solve()
    dt = (time.perf_counter() - t0) / runs
    return B / dt


def _baseline_value(remeasure=False):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'BENCH_BASELINE.json')
    if not remeasure and os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)['reference_solves_per_sec']
    try:
        val = measure_reference_baseline()
        with open(path, 'w') as fh:
            json.dump({
                'metric': 'pendulum MPC solves/sec (T=20, lqr_iter=10, '
                          'fixed budget, float32)',
                'reference_solves_per_sec': round(val, 1),
                'provenance': 'measured by bench.py on this host',
            }, fh, indent=2)
        return val
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=4096)
    ap.add_argument('--iters', type=int, default=1024)
    ap.add_argument('--remeasure-baseline', action='store_true')
    ap.add_argument('--all', action='store_true',
                    help='also run the secondary BASELINE configs')
    ap.add_argument('--profile', metavar='DIR', default=None,
                    help='capture a jax.profiler trace of the timed '
                         'section into DIR')
    ap.add_argument('--device-loop', action='store_true',
                    help='run the timed iters as ONE device-resident '
                         'lax.map dispatch instead of per-call '
                         'async-pipelined dispatches')
    ap.add_argument('--per-call-only', action='store_true',
                    help='report only the per-call (one kernel launch '
                         'per B-sized request) number, the pre-round-4 '
                         'headline mode')
    args = ap.parse_args()

    if args.device_loop or args.per_call_only:
        solves_per_sec, dt = bench_pendulum(B=args.batch, iters=args.iters,
                                            profile_dir=args.profile,
                                            device_loop=args.device_loop)
        per_call = None
    else:
        # headline = SUSTAINED serving throughput (requests of B solves
        # aggregated into large kernel launches — per-launch overhead
        # amortized; see BASELINE.md round-4 occupancy resolution);
        # the per-call rate (one launch per request) rides along
        per_call, _ = bench_pendulum(B=args.batch, iters=args.iters)
        solves_per_sec, dt = bench_pendulum(B=args.batch, iters=args.iters,
                                            profile_dir=args.profile,
                                            sustained=True)
    base = _baseline_value(args.remeasure_baseline)
    vs = (solves_per_sec / base) if base else None

    if args.all:
        from benchmarks.configs import run_all_secondary
        run_all_secondary()

    out = {
        'metric': 'pendulum_mpc_solves_per_sec_per_chip',
        'value': round(solves_per_sec, 1),
        'unit': (f'solves/s (B={args.batch} per request, T=20, '
                 f'lqr_iter=10, f32'
                 + ('' if (args.device_loop or args.per_call_only)
                    else ', sustained: requests aggregated into '
                         '<=1048576-solve kernel launches') + ')'),
        'vs_baseline': round(vs, 2) if vs is not None else None,
    }
    if per_call is not None:
        out['per_call_solves_per_sec'] = round(per_call, 1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
