"""Trace-derived roofline for the fused iLQR kernel.

The FLOP-accounting row (``bench_flops_accounting``) divides measured
solves/s by an *assumed* VPU peak; this tool replaces the assumption
with numbers extracted from a captured profiler trace (SURVEY section 5
tracing subsystem):

  1. run the headline config's timed section under
     ``jax.profiler.trace(..., create_perfetto_trace=True)``
     (``bench.bench_pendulum(profile_dir=...)``);
  2. parse the perfetto JSON trace: per-process busy time as the
     interval UNION of its 'X' slices (nested/overlapping slices are
     not double-counted), device processes identified by name;
  3. report wall time, device busy time, occupancy (busy/wall), ns per
     solve, and achieved FLOP/s on busy time vs on wall time against
     the analytic per-solve FLOP count (``solve_flops``).

occupancy < 1 separates DISPATCH-bound configs (device idle between
kernels - the B=4096 vs B=65536 gap) from COMPUTE-bound ones; achieved
FLOP/s on *busy* time is the kernel's intrinsic rate, the number to
compare across kernel changes.

Usage:  python benchmarks/roofline.py [--batch 4096] [--iters 66]
Writes one JSON line per config; BASELINE.md cites the output.
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load_perfetto(trace_dir):
    """Newest perfetto_trace.json.gz under trace_dir -> event list."""
    paths = glob.glob(os.path.join(trace_dir, '**', '*.json.gz'),
                      recursive=True)
    paths = [p for p in paths if 'perfetto' in os.path.basename(p)] or paths
    if not paths:
        raise FileNotFoundError(f'no trace under {trace_dir}')
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, 'rt') as fh:
        data = json.load(fh)
    ev = data['traceEvents'] if isinstance(data, dict) else data
    return path, ev


def _union_us(intervals):
    """Total length of the union of [start, end) intervals (us)."""
    total, cur_s, cur_e = 0.0, None, None
    for s, e in sorted(intervals):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def analyze(trace_dir):
    """Per-process busy/span table from a perfetto trace."""
    path, ev = _load_perfetto(trace_dir)
    pnames = {}
    for e in ev:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pnames[e['pid']] = e['args']['name']
    by_pid = {}
    tmin, tmax = float('inf'), 0.0
    for e in ev:
        if e.get('ph') != 'X':
            continue
        ts, dur = e.get('ts', 0.0), e.get('dur', 0.0)
        by_pid.setdefault(e['pid'], []).append((ts, ts + dur))
        tmin, tmax = min(tmin, ts), max(tmax, ts + dur)
    rows = []
    for pid, iv in by_pid.items():
        rows.append({
            'pid': pid,
            'name': pnames.get(pid, str(pid)),
            'busy_s': _union_us(iv) / 1e6,
            'slices': len(iv),
        })
    rows.sort(key=lambda r: -r['busy_s'])
    span = (tmax - tmin) / 1e6 if tmax > tmin else 0.0
    return {'trace': path, 'span_s': span, 'processes': rows}


def _device_row(report):
    """The device-side process (TPU track), if the backend emitted one."""
    for r in report['processes']:
        name = r['name'].lower()
        if 'tpu' in name or ('device' in name and 'cpu' not in name):
            return r
    return None


def roofline(B=4096, iters=66, T=20):
    import bench as headline
    from benchmarks.configs import solve_flops, VPU_F32_PEAK

    trace_dir = f'/tmp/mpc_tpu_trace_b{B}'
    solves_per_sec, dt = headline.bench_pendulum(
        B=B, iters=iters, profile_dir=trace_dir)
    rep = analyze(trace_dir)
    dev = _device_row(rep)
    fl = solve_flops(3, 1, T, lqr_iter=10, ls_iter=5)
    wall_s = dt * iters
    out = {
        'metric': f'roofline_b{B}',
        'solves_per_sec': round(solves_per_sec),
        'flop_per_solve': fl,
        'wall_s': round(wall_s, 4),
        'achieved_tflops_wall': round(solves_per_sec * fl / 1e12, 3),
        'assumed_vpu_peak_tflops': round(VPU_F32_PEAK / 1e12, 2),
        'trace': rep['trace'],
    }
    if dev is not None:
        busy = dev['busy_s']
        n_solves = B * iters
        out.update({
            'device_track': dev['name'],
            'device_busy_s': round(busy, 4),
            'occupancy': round(busy / wall_s, 3) if wall_s else None,
            'ns_per_solve_busy': round(busy / n_solves * 1e9, 1),
            'achieved_tflops_busy': round(n_solves * fl / busy / 1e12, 3)
            if busy else None,
        })
    else:
        out['device_track'] = None
        out['note'] = ('no device-side track in the trace (tunneled '
                       'backend may not export device events); '
                       'wall-time numbers only')
    return out


def in_dispatch(B=4096, iters=120, T=20):
    """Occupancy INSIDE one compiled dispatch (the round-3 verdict's
    open question): run the device-loop mode (ALL timed iters as one
    lax.map dispatch) under the profiler and split the per-iteration
    wall cost into

      * module time  — the XLA while-loop's own device timeline
        (per-iteration Riccati kernel + input-select fusions), and
      * residual     — wall minus module: time the tunneled runtime
        spends around each pallas_call that never appears on the
        device track (its per-launch handling; round-4 bisection in
        BASELINE.md shows it is independent of kernel content, code
        size, and device work).

    in_dispatch_occupancy = pallas busy / module span.  ~0.99 here:
    the compiled program has no internal idle; the residual is the
    runtime, which request aggregation (bench.py --sustained, larger
    grids per launch) amortizes away.
    """
    import bench as headline
    from benchmarks.configs import solve_flops

    trace_dir = f'/tmp/mpc_tpu_dl_trace_b{B}'
    solves_per_sec, dt = headline.bench_pendulum(
        B=B, iters=iters, device_loop=True, profile_dir=trace_dir)
    rep = analyze(trace_dir)
    dev = _device_row(rep)
    fl = solve_flops(3, 1, T, lqr_iter=10, ls_iter=5)
    out = {
        'metric': f'in_dispatch_b{B}',
        'solves_per_sec_wall': round(solves_per_sec),
        'wall_us_per_iter': round(dt * 1e6, 1),
        'trace': rep['trace'],
    }
    if dev is not None:
        busy = dev['busy_s']
        # the module (while) slice nests every op slice; busy is the
        # union, i.e. the module span — per-iteration device time
        mod_us = busy / iters * 1e6
        out.update({
            'module_us_per_iter': round(mod_us, 1),
            'residual_us_per_iter': round(dt * 1e6 - mod_us, 1),
            'ns_per_solve_module': round(busy / (B * iters) * 1e9, 1),
            'achieved_tflops_module': round(B * iters * fl / busy / 1e12,
                                            3),
        })
        # pallas busy vs module span = in-dispatch occupancy
        path, ev = _load_perfetto(trace_dir)
        pallas = sum(e.get('dur', 0.0) for e in ev
                     if e.get('ph') == 'X' and 'closed_call'
                     in str(e.get('name', '')))
        if pallas:
            out['in_dispatch_occupancy'] = round(pallas / 1e6 / busy, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, nargs='*', default=[4096, 65536])
    ap.add_argument('--iters', type=int, default=66)
    ap.add_argument('--analyze-only', metavar='DIR', default=None,
                    help='just parse an existing trace directory')
    ap.add_argument('--in-dispatch', action='store_true',
                    help='device-loop trace: in-dispatch occupancy + '
                         'module-vs-residual split per iteration')
    args = ap.parse_args()
    if args.analyze_only:
        rep = analyze(args.analyze_only)
        print(json.dumps(rep, indent=2, default=str))
        return
    if args.in_dispatch:
        for B in args.batch:
            print(json.dumps(in_dispatch(B=B, iters=max(args.iters, 24))),
                  flush=True)
        return
    for B in args.batch:
        print(json.dumps(roofline(B=B, iters=args.iters)), flush=True)


if __name__ == '__main__':
    main()
