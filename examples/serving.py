#!/usr/bin/env python
"""Serve an exported MPC controller from a process WITHOUT the solver.

Deployment demo for ``mpc_tpu.utils.export`` (the reference has no
serving story — SURVEY.md §5): the EXPORT step traces the batched
pendulum controller and writes a self-contained StableHLO artifact;
the SERVE step runs in a fresh subprocess whose only dependency is
``jax.export.deserialize`` — it never imports ``mpc_tpu`` — and
answers solve requests from the artifact bytes.  The same bytes load
from any PJRT runtime (C++ serving via the PJRT C API included).

Usage:
  python serving.py                # export, then serve in a subprocess
  python serving.py --serve F.bin  # serve-only mode (what a fleet runs)

Serve-only mode reads the request payload (the cost arrays C and c —
runtime inputs of the artifact, i.e. the per-request data a real
service would receive over the wire) from ``F.bin.C.npy`` /
``F.bin.c.npy`` sidecar files written at export time.
"""

import argparse
import os
import subprocess
import sys

import numpy as np


def _set_platform(platform):
    if platform:
        import jax
        # env JAX_PLATFORMS is overridden by this rig's sitecustomize,
        # so pin the backend through jax.config instead
        jax.config.update('jax_platforms', platform)


def export_artifact(path, B=64, T=20, platform=None, flexible=False):
    _set_platform(platform)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), '..'))
    import jax.numpy as jnp

    from mpc_tpu import GradMethods, MPCConfig, QuadCost
    from mpc_tpu.models import PendulumDx
    from mpc_tpu.utils.export import export_solve

    dx = PendulumDx()
    q, p = dx.get_true_obj()
    dtype = jnp.zeros(0).dtype                   # f32, or f64 under x64
    x0 = jnp.zeros((B, 3), dtype)
    C = jnp.broadcast_to(jnp.diag(q).astype(dtype), (T, B, 4, 4))
    c = jnp.broadcast_to(jnp.asarray(p, dtype), (T, B, 4))
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=5)
    # --flexible: ONE batch-polymorphic artifact serving any request
    # size b <= B (pad-to-tile; keeps the fused kernel on tpu targets)
    data = export_solve(cfg, dx, QuadCost(C, c), x0,
                        u_lower=-2.0, u_upper=2.0,
                        polymorphic_batch=flexible,
                        max_batch=B if flexible else None)
    with open(path, 'wb') as fh:
        fh.write(data)
    print(f'[export] {path}: {len(data) / 1e6:.2f} MB '
          f'(B={B}, T={T}, controller + config baked in)')
    return np.asarray(C), np.asarray(c)


def serve(path, platform=None, batch=None):
    """The serving side: jax.export only — no mpc_tpu import.  The
    artifact carries the controller; C/c are per-request data, stood in
    for here by .npy sidecars written at export time."""
    _set_platform(platform)
    import jax
    import jax.numpy as jnp

    with open(path, 'rb') as fh:
        exported = jax.export.deserialize(bytearray(fh.read()))
    fn = jax.jit(exported.call)
    B = exported.in_avals[0].shape[0]            # x_init is [B, n_state]
    if not isinstance(B, int):
        # batch-polymorphic artifact: the leading dim is a symbolic
        # expression, so the demo batch size must come from the caller
        if batch is None:
            raise SystemExit(
                f'{path} is batch-polymorphic (x_init leading dim is '
                f'symbolic: {B}); pass --batch to pick a request size')
        B = batch
    dt = exported.in_avals[0].dtype
    # one synthetic request batch: random initial angles
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1), dt)
    # per-request cost data; a flexible artifact's batched inputs must
    # share the request's batch size, so slice the sidecars to B
    C = jnp.asarray(np.load(path + '.C.npy')[:, :B], dt)
    c = jnp.asarray(np.load(path + '.c.npy')[:, :B], dt)
    x, u, costs = fn(x0, C, c)
    print(f'[serve] answered batch of {B}: '
          f'|u| <= {float(jnp.abs(u).max()):.3f} (bound 2.0), '
          f'mean cost {float(costs.mean()):.3f}')
    assert float(jnp.abs(u).max()) <= 2.0 + 1e-6
    print('[serve] OK')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--serve', metavar='ARTIFACT', default=None)
    ap.add_argument('--path', default='/tmp/mpc_controller.bin')
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--horizon', type=int, default=20)
    ap.add_argument('--platform', default=None,
                    help='pin the jax backend (e.g. cpu); an artifact '
                         'runs on the platform(s) it was exported for')
    ap.add_argument('--flexible', action='store_true',
                    help='export ONE batch-polymorphic pad-to-tile '
                         'artifact serving any request size <= --batch '
                         '(demo serves at half the max)')
    args = ap.parse_args()
    if args.serve:
        serve(args.serve, platform=args.platform, batch=args.batch)
        return
    C, c = export_artifact(args.path, B=args.batch, T=args.horizon,
                           platform=args.platform, flexible=args.flexible)
    np.save(args.path + '.C.npy', C)
    np.save(args.path + '.c.npy', c)
    # fresh interpreter: the artifact is the only thing it needs
    cmd = [sys.executable, os.path.abspath(__file__),
           '--serve', args.path]
    if args.flexible:
        # a smaller request through the same artifact
        cmd += ['--batch', str(max(1, args.batch // 2))]
    if args.platform:
        cmd += ['--platform', args.platform]
    subprocess.run(cmd, check=True)


if __name__ == '__main__':
    main()
