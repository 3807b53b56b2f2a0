"""Secondary benchmark configs (BASELINE.json configs 1, 3, 4, 5).

Each prints one JSON line; the headline pendulum config lives in
bench.py at the repo root.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time(fn, args_list, iters=None, warmup=2):
    """Time fn over a list of DISTINCT argument tuples (the tunneled TPU
    runtime dedupes repeated identical executions, so identical-input
    timing loops report fantasy numbers)."""
    import jax
    for k in range(warmup):
        jax.block_until_ready(fn(*args_list[k]))
    # async-pipelined: submit a chunk of batches, sync once (per-call
    # blocking would charge the tunnel round-trip latency to each
    # batch); best-of-3 chunks to shed tunnel jitter.  Every call gets
    # DISTINCT inputs: the remote layer dedupes identical executions.
    rest = args_list[warmup:]
    # one large async-pipelined chunk, single final sync: the tunnel
    # round-trip is amortized over all iters (slight conservative bias)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in rest]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(rest)


def _perturb(rng, arrays, index=0, scale=1e-3, n=66):
    """Produce n distinct argument tuples by perturbing one array."""
    import jax.numpy as jnp
    outs = []
    base = [jnp.asarray(a) for a in arrays]
    for _ in range(n):
        a = list(base)
        noise = scale * rng.randn(*np.shape(arrays[index])).astype(
            np.asarray(arrays[index]).dtype)
        a[index] = jnp.asarray(np.asarray(arrays[index]) + noise)
        outs.append(tuple(a))
    return outs


def bench_tvlqr(B=128, n_state=3, n_ctrl=4, T=5):
    """Config 1: random batched TVLQR, unconstrained (exact Riccati)."""
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, LinDx
    from mpc_tpu.learning import batched_solve

    dtype = jnp.float32
    n_sc = n_state + n_ctrl
    rng = np.random.RandomState(1)
    C = rng.randn(T, B, n_sc, n_sc).astype(np.float32)
    C = np.einsum('tbij,tbkj->tbik', C, C)
    c = rng.randn(T, B, n_sc).astype(np.float32)
    F = np.concatenate([
        np.tile(np.eye(n_state, dtype=np.float32), (T - 1, B, 1, 1))
        + 0.1 * rng.randn(T - 1, B, n_state, n_state).astype(np.float32),
        0.5 * rng.randn(T - 1, B, n_state, n_ctrl).astype(np.float32)], 3)
    f = rng.randn(T - 1, B, n_state).astype(np.float32)
    x0 = rng.randn(B, n_state).astype(np.float32)

    cfg = MPCConfig(n_state=n_state, n_ctrl=n_ctrl, T=T, lqr_iter=10,
                    eps=0.0, exit_unconverged=False,
                    detach_unconverged=False, backprop=False)
    solve = lambda x0, C, c, F, f: batched_solve(
        cfg, x0, QuadCost(C, c), LinDx(F, f)).u
    fn = jax.jit(solve)
    dt = _time(fn, _perturb(rng, (x0, C, c, F, f), index=0))

    # device-loop view (round-3 VERDICT #7): at B=128 the per-call
    # number is the tunnel's per-launch floor (~40 us of compute inside
    # a 0.2-1.2 ms launch cost, BASELINE.md round-4), so also measure
    # the SAME solves as one lax.map dispatch over stacked distinct
    # instances — solver cost with the launch handling paid per
    # in-loop kernel launch instead of per host dispatch.
    import time as _t
    n_loop = 128
    Cj, Fj, fj = jnp.asarray(C), jnp.asarray(F), jnp.asarray(f)
    # perturb x0/c per instance (distinct executions for the remote
    # dedupe layer); C stays the PSD matrix, F/f the same system
    xs = jnp.stack([jnp.asarray(x0) + 0.01 * k for k in range(n_loop)])
    cs = jnp.stack([jnp.asarray(c) + 0.01 * k for k in range(n_loop)])
    loop = jax.jit(lambda xs, cs: jax.lax.map(
        lambda o: solve(o[0], Cj, o[1], Fj, fj), (xs, cs)))
    jax.block_until_ready(loop(xs + 1e-3, cs + 1e-3))
    t0 = _t.perf_counter()
    jax.block_until_ready(loop(xs, cs))
    dt_loop = (_t.perf_counter() - t0) / n_loop
    # NB (round-4): async-pipelined per-call dispatch OVERLAPS the
    # runtime's per-launch handling, while the in-loop launches
    # serialize it — per-call is the faster, truer throughput view
    # (76us/call ~ the 40us compute reality + amortized overhead); the
    # device-loop rate is kept as the serialized serving-loop shape.
    return {'metric': 'tvlqr_solves_per_sec',
            'value': round(B / dt, 1),
            'unit': f'solves/s (B={B}, T={T}, {n_state}s/{n_ctrl}c, f32)',
            'device_loop_solves_per_sec': round(B / dt_loop, 1)}


def bench_medium_state(B=2048, T=20):
    """Medium/large state dims, box-constrained.  Three regimes:

    - 16s/4c (ntau=20) at B=2048 (multi-tile grid): inside the
      fori-loop kernel's hardware-calibrated body/VMEM budgets
      (ops/fused.py _BODY_VOLUME_LIMIT/_LONG_T_VMEM_LIMIT_MULTI) -
      the fused path, ~10x the jnp path.
    - 19s/4c (ntau=23) at B=1024: fused at G=1; at G>1 Mosaic
      double-buffers the blocked operands past the multi-tile VMEM
      limit, so B>1024 routes to the XLA path.
    - 24s/4c (ntau=28, the round-5 body-gate ceiling) at B=1024:
      fused single-tile (~5x the jnp path; round-5 boundary
      validation); its multi-tile estimate exceeds the VMEM limit, so
      B>1024 runs the XLA fallback, whose PNQP Newton systems and
      masked Riccati gain solves go through linalg.solve_spd's
      unrolled Cholesky (batched pivoted LU is ~10-17x slower on TPU
      for these tiny systems) - reported at both batch regimes.
    """
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, LinDx, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.ops import fused

    rows = []
    rng = np.random.RandomState(3)
    for n_state, n_ctrl, Bi, path in [(16, 4, B, 'fused'),
                                      (19, 4, min(B, 1024), 'fused'),
                                      (24, 4, min(B, 1024), 'fused'),
                                      (24, 4, B, 'jnp')]:
        n_sc = n_state + n_ctrl
        A = np.eye(n_state) + 0.01 * rng.randn(n_state, n_state)
        A /= max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
        Bm = 0.1 * rng.randn(n_state, n_ctrl)
        F = jnp.asarray(np.tile(np.concatenate([A, Bm], 1)[None],
                                (T - 1, 1, 1)), jnp.float32)
        C = jnp.asarray(np.diag(np.concatenate(
            [np.ones(n_state), 0.1 * np.ones(n_ctrl)])), jnp.float32)
        c = jnp.zeros(n_sc, jnp.float32)
        x0 = rng.randn(Bi, n_state).astype(np.float32)

        # the jnp row is FORCED to the XLA path: since round 5 the
        # 24s/4c shape is fused-admissible at B <= 1024, so auto
        # dispatch would measure the kernel twice at small B instead
        # of the fallback this row characterizes
        cfg = MPCConfig(n_state=n_state, n_ctrl=n_ctrl, T=T, lqr_iter=10,
                        grad_method=GradMethods.ANALYTIC, eps=0.0,
                        exit_unconverged=False, detach_unconverged=False,
                        backprop=False,
                        use_fused='auto' if path == 'fused' else 'never')
        if path == 'fused':
            assert fused.supports(cfg, QuadCost(C, c), LinDx(F, None),
                                  u_lower=jnp.float32(-1.0),
                                  n_batch=Bi), (n_state, Bi)
        fn = jax.jit(lambda x0, cfg=cfg, C=C, c=c, F=F: batched_solve(
            cfg, x0, QuadCost(C, c), LinDx(F, None),
            u_lower=-1.0, u_upper=1.0).u)
        dt = _time(fn, _perturb(rng, (x0,), index=0, n=18))
        rows.append({'metric': 'medium_state_box_solves_per_sec',
                     'value': round(Bi / dt, 1),
                     'unit': f'solves/s (B={Bi}, T={T}, '
                             f'{n_state}s/{n_ctrl}c, box, {path} path, '
                             'f32)'})
    return rows


def bench_cartpole(B=512, T=25):
    """Config 3: cartpole, box-constrained, ANALYTIC linearization."""
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import CartpoleDx

    dtype = jnp.float32
    dx = CartpoleDx()
    rng = np.random.RandomState(2)
    th = 0.5 * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack(
        [np.zeros(B), np.zeros(B), np.cos(th), np.sin(th),
         np.zeros(B)], 1), dtype)
    q, p = dx.get_true_obj()
    # batch-shared cost + scalar bounds (the workload's actual structure)
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)

    cfg = MPCConfig(n_state=5, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.5,
                    max_linesearch_iter=2)
    fn = jax.jit(lambda x0, C, c: batched_solve(
        cfg, x0, QuadCost(C, c), dx, u_lower=-100.0, u_upper=100.0).u)
    dt = _time(fn, _perturb(rng, (x0, C, c), index=0))
    return {'metric': 'cartpole_solves_per_sec', 'value': round(B / dt, 1),
            'unit': f'solves/s (B={B}, T={T}, f32)'}


def bench_goal_tracking(B=2048, T=20):
    """Mixed cost layout: batch-shared weights C with PER-EXAMPLE goal
    vectors c [T, B, ntau] (each scenario tracks its own reference
    trajectory) - the canonical batched goal-tracking workload.  The
    reference broadcasts C and c independently (mpc/mpc.py:205-226), so
    this mixed pair is valid reference input; the short fused kernel
    runs it SPLIT - shared C on SMEM, per-example c as a blocked VMEM
    operand (ops/fused.py:_layout_flags; round-5 A/B: +5.6% vs the old
    broadcast, bitwise-equal outputs, and no [T, B, ntau, ntau] HBM
    materialization).  Reports fused and jnp side by side."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import PendulumDx

    dtype = jnp.float32
    dx = PendulumDx()
    rng = np.random.RandomState(7)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack(
        [np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    q, _ = dx.get_true_obj()
    C = jnp.diag(q).astype(dtype)                      # shared [4, 4]
    # per-example goal angles -> per-example linear terms
    goal_th = np.pi * (2 * rng.rand(B) - 1)
    goal = np.stack([np.cos(goal_th), np.sin(goal_th),
                     np.zeros(B), np.zeros(B)], 1)     # [B, 4]
    c = jnp.asarray(-(np.asarray(q)[None, None] * goal[None]) *
                    np.ones((T, 1, 1)), dtype)         # [T, B, 4]

    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=5)
    args = _perturb(rng, (x0, C, c), index=2)
    fn = jax.jit(lambda x0, C, c: batched_solve(
        cfg, x0, QuadCost(C, c), dx, u_lower=-2.0, u_upper=2.0).u)
    dt = _time(fn, args)
    cfg_j = dataclasses.replace(cfg, use_fused='never')
    fn_j = jax.jit(lambda x0, C, c: batched_solve(
        cfg_j, x0, QuadCost(C, c), dx, u_lower=-2.0, u_upper=2.0).u)
    dt_j = _time(fn_j, args[:18])
    return {'metric': 'goal_tracking_solves_per_sec',
            'value': round(B / dt, 1),
            'unit': (f'solves/s (B={B}, T={T}, shared C + per-example '
                     f'goals c, f32); jnp path {B / dt_j:.0f}')}


def bench_imitation(B=1024, T=10, n_chunk=66, _return_dt=False):
    """Config 4: differentiable-MPC imitation learning step throughput.

    The learned cost is BATCH-SHARED (one diag(q)/p for the whole
    batch, the structure of the reference workload it mirrors,
    examples/gym_pendulum_approximate.py:100-147), so it rides the
    forward kernel's SMEM fast path and the backward kernel's
    in-kernel-reduced gradient path - no [T, B, ntau, ntau]
    materialization anywhere.  ``n_chunk`` distinct pipelined calls
    with one final sync; 66 is in the converged regime (see
    bench_imitation_convergence and the BASELINE.md round-3 note on
    the round-2 official-vs-controlled gap, which was chunk-length
    understatement)."""
    import jax
    import jax.numpy as jnp
    import optax
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import TrainState, make_imitation_train_step
    from mpc_tpu.models import PendulumDx

    dtype = jnp.float32
    dx = PendulumDx()
    rng = np.random.RandomState(3)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack(
        [np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    u_expert = jnp.asarray(np.clip(rng.randn(T, B, 1), -2, 2), dtype)

    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=5,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    linesearch_decay=0.2, max_linesearch_iter=3)

    q, p = dx.get_true_obj()
    theta0 = {'q_log': jnp.log(jnp.asarray(q, dtype) + 1e-3),
              'p': jnp.asarray(p, dtype)}

    def make_cost(theta):
        return QuadCost(jnp.diag(jnp.exp(theta['q_log'])), theta['p'])

    opt = optax.adam(1e-2)
    step = make_imitation_train_step(cfg, opt, make_cost, lambda th: dx,
                                     u_lower=-2.0, u_upper=2.0)
    state = TrainState(theta0, opt.init(theta0), jnp.asarray(0))

    def fn(state, x0, u_expert):
        st, loss = step(state, x0, u_expert)
        return loss
    args_list = [(state, x, u_expert)
                 for (x,) in [(a[1],) for a in _perturb(
                     rng, (u_expert, x0), index=1, n=n_chunk)]]
    dt = _time(fn, args_list)
    if _return_dt:
        return dt
    out = {'metric': 'imitation_examples_per_sec',
           'value': round(B / dt, 1),
           'unit': f'examples/s fwd+bwd (B={B}, T={T}, f32)'}
    if B == 1024:
        # the B=1024 config is launch-overhead-bound (283us of device
        # work per fwd+bwd launch pair; BASELINE.md round-4): the same
        # training step at B=8192 shows the kernel-limited rate a
        # gradient-accumulation or larger-batch run achieves
        dt8 = bench_imitation(B=8192, T=T, n_chunk=max(10, n_chunk // 4),
                              _return_dt=True)
        out['aggregated_b8192_examples_per_sec'] = round(8192 / dt8, 1)
    return out


def bench_imitation_long(B=4096, T=160, n_chunk=34):
    """Long-horizon differentiable-MPC training: gradients through a
    T=160 box-constrained LQR fixed point, batch-shared learned
    quadratic cost over shared LinDx dynamics.  Forward runs the
    fori-loop kernel; the backward runs the round-3 fori-loop
    KKT-backward kernel (ops/fused_bwd.py:_make_bwd_kernel_long) -
    the unrolled kernels cap near T~100, and the jnp path measures
    ~5x slower on this config (BASELINE.md round-3)."""
    import jax
    import jax.numpy as jnp
    from mpc_tpu import LinDx, MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve

    dtype = jnp.float32
    ns, nc = 3, 1
    ntau = ns + nc
    rng = np.random.RandomState(5)
    A = np.eye(ns, dtype=np.float32)
    A[0, 1] = 0.01
    Fsh = np.concatenate([A, 0.01 * np.ones((ns, nc), np.float32)], 1)
    F = jnp.asarray(np.broadcast_to(Fsh, (T - 1, ns, ntau)).copy())
    C = jnp.broadcast_to(
        jnp.asarray(np.diag([1., 1., 0.1, 0.01]).astype(np.float32)),
        (T, ntau, ntau))
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    u_expert = jnp.asarray(
        0.1 * rng.randn(T, B, nc).astype(np.float32))

    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=4,
                    grad_method=GradMethods.ANALYTIC, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=True, linesearch_decay=0.2,
                    max_linesearch_iter=3)

    @jax.jit
    def fn(cv, x0):
        def loss(cv):
            sol = batched_solve(cfg, x0, QuadCost(C, cv),
                                LinDx(F, None), u_lower=-2., u_upper=2.)
            return jnp.mean((sol.u - u_expert) ** 2)
        return jax.value_and_grad(loss)(cv)

    cv0 = jnp.zeros((T, ntau), dtype)
    args_list = _perturb(rng, (cv0, x0), index=1, n=n_chunk)
    dt = _time(fn, args_list)
    return {'metric': 'imitation_long_examples_per_sec',
            'value': round(B / dt, 1),
            'unit': f'examples/s fwd+bwd (B={B}, T={T}, f32)'}


def bench_closed_loop(Bs=(1, 16, 256), T=20, steps=100, reps=8):
    """Fully on-device receding-horizon stepping
    (mpc_tpu.make_closed_loop): N solve->act->shift steps as ONE
    lax.scan dispatch, no host in the loop.  Measured round 3:
    ~550 us/env-step at B=1..256 - i.e. the per-step cost is the
    SOLVE's serial dependency-chain latency on-chip, not host/tunnel
    dispatch (which adds only ~100-300 us to the host-loop figures in
    bench_latency).  Compare bench_latency (host loop)."""
    import time

    import jax
    import jax.numpy as jnp
    from mpc_tpu import (GradMethods, MPCConfig, QuadCost,
                         make_closed_loop)
    from mpc_tpu.models import PendulumDx

    dx = PendulumDx()
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q).astype(jnp.float32),
                    jnp.asarray(p, jnp.float32))
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=5)
    rng = np.random.RandomState(0)
    rows = []
    for B in Bs:
        th = np.pi * (2 * rng.rand(B) - 1)
        x0 = jnp.asarray(np.stack(
            [np.cos(th), np.sin(th), np.zeros(B)], 1), jnp.float32)
        roll = make_closed_loop(cfg, cost, dx, u_lower=-2., u_upper=2.)
        out = jax.block_until_ready(roll(x0, steps))
        t0 = time.perf_counter()
        for k in range(reps):
            out = roll(x0 + 1e-4 * k, steps)
        jax.block_until_ready(out)
        us = (time.perf_counter() - t0) / (reps * steps) * 1e6
        rows.append({'metric': f'closed_loop_us_per_step_b{B}',
                     'value': round(us, 1),
                     'unit': f'us/env-step on-device (T={T}, '
                             f'lqr_iter=10, {steps}-step scan)'})
    return rows


def bench_imitation_convergence(B=1024, T=10, chunks=(10, 18, 34, 66,
                                                      130)):
    """Round-2 verdict item 6: show the imitation metric converges as
    the pipelined chunk grows (the tunneled runtime charges fixed
    per-chunk overheads, so short chunks understate throughput).  Run
    manually; the converged figure is what bench_imitation reports."""
    rows = []
    for n in chunks:
        dt = bench_imitation(B=B, T=T, n_chunk=n, _return_dt=True)
        rows.append({'metric': f'imitation_examples_per_sec_chunk{n}',
                     'value': round(B / dt, 1),
                     'unit': f'examples/s (chunk={n})'})
    return rows


def bench_pod(B=16384, T=20):
    """Config 5: pod sweep - B scenarios sharded over every available
    device via solve_sharded (shard_map + the fused kernel per shard).
    On a single chip this measures the large-batch headline; on a pod
    slice the same code path shards over ICI with zero collectives."""
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.models import PendulumDx
    from mpc_tpu.parallel import make_mesh, solve_sharded

    dtype = jnp.float32
    dx = PendulumDx()
    rng = np.random.RandomState(4)
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=5)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    B = (B // n_dev) * n_dev

    def fn(x0):
        return solve_sharded(cfg, mesh, x0, QuadCost(C, c), dx,
                             u_lower=-2.0, u_upper=2.0).u

    def x0s():
        th = np.pi * (2 * rng.rand(B) - 1)
        return (jnp.asarray(np.stack(
            [np.cos(th), np.sin(th), np.zeros(B)], 1), dtype),)
    dt = _time(fn, [x0s() for _ in range(14)])
    return {'metric': 'pod_sweep_solves_per_sec',
            'value': round(B / dt, 1),
            'unit': f'solves/s (B={B}, T={T}, {n_dev} device(s), '
                    f'shard_map)'}


def bench_latency(Bs=(1, 16, 256), T=20, steps=64):
    """Receding-horizon single-step solve LATENCY (the reference's
    canonical workload: solve -> act -> shift warm start,
    examples/gym_pendulum.py:87-107).

    Unlike the throughput benches, the chain is DEPENDENT: each step's
    x_init comes from the previous step's solution (first control
    applied through the true dynamics) and the warm start is the
    shifted previous controls, so steps serialize on-device and
    total/steps is the true per-step latency with the tunnel round-trip
    amortized (single final sync).
    """
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import PendulumDx

    dtype = jnp.float32
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)
    out = []
    for B in Bs:
        cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                        grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                        exit_unconverged=False, detach_unconverged=False,
                        backprop=False, linesearch_decay=0.2,
                        max_linesearch_iter=5)

        @jax.jit
        def env_step(x0, u_warm):
            sol = batched_solve(cfg, x0, QuadCost(C, c), dx,
                                u_init=u_warm, u_lower=-2.0, u_upper=2.0)
            act = sol.u[0]
            x_next = jax.vmap(dx)(x0, act)
            u_shift = jnp.concatenate(
                [sol.u[1:], jnp.zeros_like(sol.u[:1])], 0)
            return x_next, u_shift

        rng = np.random.RandomState(7)
        th = np.pi * (2 * rng.rand(B) - 1)
        x0 = jnp.asarray(np.stack(
            [np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
        u_warm = jnp.zeros((T, B, 1), dtype)
        # warmup/compile
        xw, uw = env_step(x0, u_warm)
        jax.block_until_ready(xw)
        t0 = time.perf_counter()
        x, u = x0, u_warm
        for _ in range(steps):
            x, u = env_step(x, u)
        jax.block_until_ready(x)
        us = (time.perf_counter() - t0) / steps * 1e6
        out.append({'metric': f'pendulum_mpc_latency_us_b{B}',
                    'value': round(us, 1),
                    'unit': f'us/step (B={B}, T={T}, lqr_iter=10, '
                            'dependent chain, f32)'})
    return out


def solve_flops(ns, nc, T, lqr_iter, ls_iter, dyn_flops=40):
    """Analytic FLOP count for ONE box-constrained iLQR solve (fused
    kernel arithmetic; same algebra as the jnp path).

    Counts multiply-adds as 2 FLOPs.  NOTE (round 5): for trace-time-
    concrete shared costs the kernel's literal-zero folding DROPS the
    zero-entry cost products from the emitted code (a diagonal C skips
    ~3/4 of each quadratic form / cb row), so for the headline workload
    this analytic count now OVERSTATES executed FLOPs by roughly the
    folded cost terms and the achieved-TFLOPs figure is an upper bound
    on the algebra, not the instruction stream.  Per outer iteration:
      * linearization: (T-1) JVP columns x (ns+nc) tangents;
      * Riccati per t: W = V F (2 ns^2 ntau), Qt symmetric assembly
        (ns (ntau^2+ntau)), qt (2 ns ntau), control solve (~closed-form
        1-D or ~2/3 nc^3 + nc^2 ns Cholesky), V/v update
        (~4 ns^2 nc + 2 ns nc^2 + 3 ns nc);
      * line search: ls_iter rollouts x T x (gain apply 2 nc ns +
        dynamics dyn_flops + cost (ntau^2 + 3 ntau)).
    """
    ntau = ns + nc
    lin = (T - 1) * ntau * dyn_flops
    riccati_t = (2 * ns * ns * ntau + ns * (ntau * ntau + ntau)
                 + 2 * ns * ntau
                 + (4 if nc == 1 else (2 * nc ** 3 // 3
                                       + 2 * nc * nc * ns))
                 + 4 * ns * ns * nc + 2 * ns * nc * nc + 3 * ns * nc)
    rollout_t = 2 * nc * ns + dyn_flops + ntau * ntau + 3 * ntau
    per_iter = lin + T * riccati_t + ls_iter * T * rollout_t
    return lqr_iter * per_iter


# assumed VPU f32 peak for one v5e chip: 8x128 lanes x 2 FLOP/FMA x
# ~1.74 GHz single-issue ~ 3.6 TFLOP/s (order-of-magnitude roofline
# anchor for the solves/s numbers; the MXU's 197 TFLOP/s bf16 peak is
# irrelevant here - the workload is elementwise lane arithmetic)
VPU_F32_PEAK = 8 * 128 * 2 * 1.74e9


def bench_flops_accounting(B=4096, T=20):
    """Achieved FLOP/s + VPU-utilization estimate for the headline
    pendulum config (answers 'is N solves/s actually good for one
    chip')."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    import bench as headline
    solves_per_sec, _ = headline.bench_pendulum(B=B, T=T, iters=66)
    fl = solve_flops(3, 1, T, lqr_iter=10, ls_iter=5)
    achieved = solves_per_sec * fl
    return {'metric': 'pendulum_achieved_tflops',
            'value': round(achieved / 1e12, 3),
            'unit': (f'TFLOP/s ({fl} FLOP/solve x '
                     f'{round(solves_per_sec):,} solves/s; '
                     f'~{100 * achieved / VPU_F32_PEAK:.0f}% of assumed '
                     f'{VPU_F32_PEAK / 1e12:.1f} TFLOP/s VPU f32 peak)')}


def bench_long_horizon(B=16, T=512):
    """Long-horizon solve: sequential-scan Riccati vs the O(log T)
    associative-scan path (parallel_riccati) inside a FULL iLQR solve
    (unconstrained pendulum tracking, jnp path - T=512 exceeds the
    fused kernel's VMEM budget)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import PendulumDx

    dtype = jnp.float32
    dx = PendulumDx()
    rng = np.random.RandomState(9)
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=5,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=3, use_fused='never',
                    # the default is now 'auto' (pscan at T >= 128);
                    # the baseline arm must pin the sequential scan or
                    # both arms measure the same path
                    parallel_riccati=False)

    def make(cfg_i):
        return jax.jit(lambda x0: batched_solve(
            cfg_i, x0, QuadCost(C, c), dx).u)

    def x0s(n):
        outs = []
        for _ in range(n):
            th = np.pi * (2 * rng.rand(B) - 1)
            outs.append((jnp.asarray(np.stack(
                [np.cos(th), np.sin(th), np.zeros(B)], 1), dtype),))
        return outs

    dt_seq = _time(make(cfg), x0s(18))
    dt_par = _time(make(dataclasses.replace(cfg, parallel_riccati=True)),
                   x0s(18))
    return {'metric': 'long_horizon_pscan_speedup',
            'value': round(dt_seq / dt_par, 2),
            'unit': (f'x sequential (T={T}, B={B}, full solve: '
                     f'{round(B / dt_seq, 1)} -> {round(B / dt_par, 1)} '
                     'solves/s)')}


def bench_nn_dynamics(B=2048, T=20, hidden=100):
    """Reference-default learned dynamics: NNDynamics with
    hidden_sizes=[100] (mpc/dynamics.py:9-13), ~800 params, through the
    param-streaming in-kernel path (weights in SMEM, lax.fori_loop over
    hidden units).  Quadratic pendulum objective, box +-2."""
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, GradMethods
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.models import NNDynamics, PendulumDx

    dtype = jnp.float32
    dx = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                         hidden_sizes=(hidden,))
    rng = np.random.RandomState(4)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack(
        [np.cos(th), np.sin(th), np.zeros(B)], 1), dtype)
    q, p = PendulumDx().get_true_obj()
    C = jnp.diag(q).astype(dtype)
    c = jnp.asarray(p, dtype)
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=3)
    fn = jax.jit(lambda x0, C, c: batched_solve(
        cfg, x0, QuadCost(C, c), dx, u_lower=-2.0, u_upper=2.0).u)
    dt = _time(fn, _perturb(rng, (x0, C, c), index=0))
    return {'metric': 'nn_dynamics_solves_per_sec',
            'value': round(B / dt, 1),
            'unit': f'solves/s (B={B}, T={T}, hidden={hidden}, f32)'}


def run_all_secondary():
    for fn in [bench_tvlqr, bench_cartpole, bench_goal_tracking,
               bench_imitation, bench_imitation_long, bench_pod,
               bench_long_horizon, bench_nn_dynamics,
               bench_flops_accounting]:
        print(json.dumps(fn()))
    for row in bench_medium_state():
        print(json.dumps(row))
    for row in bench_latency():
        print(json.dumps(row))
    for row in bench_closed_loop():
        print(json.dumps(row))


if __name__ == '__main__':
    run_all_secondary()
