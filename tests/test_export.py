"""AOT export artifacts (utils/export.py): serialize -> deserialize ->
execute must reproduce the live solver exactly.

The reference has no serving subsystem (SURVEY.md section 5); these pin
the TPU-native one: jax.export round-trips of the batched solve (array
and baked scalar bounds, batch-polymorphic), an exported GRADIENT
program (the differentiable-MPC backward inside the artifact), and the
on-device closed loop.
"""
import dataclasses

import numpy as np
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu import (GradMethods, LinDx, MPCConfig, QuadCost,
                     batched_solve, make_closed_loop)
from mpc_tpu.models import PendulumDx
from mpc_tpu.utils.export import (export_closed_loop, export_fn,
                                  export_solve, load_fn)


def _lin_setup(B=3, T=5, ns=3, nc=2):
    rng = np.random.RandomState(7)
    ntau = ns + nc
    F = jnp.asarray(rng.uniform(-0.6, 0.6, (T - 1, B, ns, ntau)))
    f = jnp.asarray(0.1 * rng.randn(T - 1, B, ns))
    Cq = rng.randn(T, B, ntau, ntau)
    C = jnp.asarray(np.matmul(Cq, Cq.transpose(0, 1, 3, 2)) / 2
                    + 0.5 * np.eye(ntau))
    c = jnp.asarray(rng.randn(T, B, ntau))
    x0 = jnp.asarray(rng.randn(B, ns))
    lb = jnp.full((T, B, nc), -0.7)
    ub = jnp.full((T, B, nc), 0.7)
    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=8, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False)
    return cfg, LinDx(F, f), QuadCost(C, c), x0, lb, ub


def test_solve_roundtrip_array_bounds():
    cfg, dx, cost, x0, lb, ub = _lin_setup()
    data = export_solve(cfg, dx, cost, x0, u_lower=lb, u_upper=ub)
    assert isinstance(data, bytes) and len(data) > 0
    fn = load_fn(data)
    x, u, costs = fn(x0, cost.C, cost.c, dx.F, dx.f, lb, ub)
    ref = batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=ub)
    # bitwise CANARY: today a deserialized StableHLO module recompiles
    # to the same program as the live jit in-process.  If an XLA/jax
    # upgrade makes this fail while the 1e-6 checks below pass, the
    # artifact is still correct — relax this one assertion.
    npt.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-12)
    npt.assert_allclose(np.asarray(x), np.asarray(ref.x), atol=1e-6)
    npt.assert_allclose(np.asarray(costs), np.asarray(ref.costs),
                        atol=1e-6)
    # fresh cost data through the SAME artifact (serving shape)
    c2 = cost.c * 0.5
    _, u2, _ = fn(x0, cost.C, c2, dx.F, dx.f, lb, ub)
    ref2 = batched_solve(cfg, x0, QuadCost(cost.C, c2), dx,
                         u_lower=lb, u_upper=ub)
    npt.assert_allclose(np.asarray(u2), np.asarray(ref2.u), atol=1e-6)


def test_solve_scalar_bounds_baked():
    """Python-float bounds are baked into the artifact (the reference's
    scalar-bounds broadcast, mpc/mpc.py:127-130): the callable takes
    only (x_init, C, c)."""
    cfg, dx, cost, x0, _, _ = _lin_setup()
    data = export_solve(cfg, dx, cost, x0, u_lower=-0.7, u_upper=0.7)
    fn = load_fn(data)
    _, u, _ = fn(x0, cost.C, cost.c, dx.F, dx.f)
    ref = batched_solve(cfg, x0, cost, dx, u_lower=-0.7, u_upper=0.7)
    npt.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-6)
    assert np.abs(np.asarray(u)).max() <= 0.7 + 1e-12


def test_solve_polymorphic_batch():
    """One artifact serves every batch size (jnp path, symbolic b).
    The reference solve pins use_fused='never' to match the artifact's
    forced jnp path (fused-vs-jnp parity is only ~1e-5 on TPU)."""
    cfg, dx, cost, x0, lb, ub = _lin_setup(B=3)
    data = export_solve(cfg, dx, cost, x0, u_lower=lb, u_upper=ub,
                        polymorphic_batch=True)
    fn = load_fn(data)
    for B in (2, 5):
        cfgB, dxB, costB, x0B, lbB, ubB = _lin_setup(B=B)
        cfgB = dataclasses.replace(cfgB, use_fused='never')
        _, u, _ = fn(x0B, costB.C, costB.c, dxB.F, dxB.f, lbB, ubB)
        ref = batched_solve(cfgB, x0B, costB, dxB,
                            u_lower=lbB, u_upper=ubB)
        npt.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-10)


def test_solve_flexible_batch_pad_to_tile():
    """polymorphic_batch + max_batch: ONE artifact serves any b <=
    max_batch by padding to the static batch (with copies of example 0,
    like the kernel's own edge padding) and slicing outputs back.  On
    TPU this keeps the fused kernel (validated on hardware: bitwise vs
    live at B in {1, 100, 1024}, BASELINE.md round-4); here the cpu
    lowering exercises the same pad/slice program on the jnp path."""
    cfg, dx, cost, x0, lb, ub = _lin_setup(B=8)
    data = export_solve(cfg, dx, cost, x0, u_lower=lb, u_upper=ub,
                        polymorphic_batch=True, max_batch=8)
    fn = load_fn(data)
    for B in (1, 3, 8):
        sl = lambda a, ax: jnp.take(a, jnp.arange(B), axis=ax)
        args = (x0[:B], sl(cost.C, 1), sl(cost.c, 1), sl(dx.F, 1),
                sl(dx.f, 1), sl(lb, 1), sl(ub, 1))
        x, u, costs = fn(*args)
        assert u.shape == (cfg.T, B, 2)
        ref = batched_solve(cfg, x0[:B], QuadCost(args[1], args[2]),
                            LinDx(args[3], args[4]),
                            u_lower=args[5], u_upper=args[6])
        npt.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-10)
        npt.assert_allclose(np.asarray(costs), np.asarray(ref.costs),
                            atol=1e-10)


def test_flexible_batch_keeps_kernel_for_tpu():
    """The pad-to-tile artifact exported for platforms=['tpu'] embeds
    the fused kernel (the plain polymorphic path forces jnp)."""
    from mpc_tpu.models import PendulumDx

    dx = PendulumDx()
    T, ns, nc, ntau, Bmax = 5, 3, 1, 4, 16
    C = jnp.broadcast_to(
        jnp.diag(jnp.array([1., 1., .1, .001], jnp.float32)),
        (T, ntau, ntau))
    c = jnp.broadcast_to(jnp.array([-1., 0., 0., 0.], jnp.float32),
                         (T, ntau))
    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=2,
                    backprop=False, exit_unconverged=False,
                    detach_unconverged=False)
    with jax.enable_x64(False):
        data = export_solve(cfg, dx, QuadCost(C, c),
                            jnp.zeros((Bmax, ns), jnp.float32),
                            u_lower=-2.0, u_upper=2.0,
                            polymorphic_batch=True, max_batch=Bmax,
                            platforms=['tpu'])
    exp = jax.export.deserialize(bytearray(data))
    assert 'tpu_custom_call' in exp.mlir_module()
    assert str(exp.in_avals[0].shape[0]) == 'b'


def test_exported_gradient_program():
    """jax.grad THROUGH the KKT fixed point traces before export, so a
    gradient program exports like any other: the artifact computes the
    differentiable-MPC backward (mpc/lqr_step.py:311-407) standalone."""
    cfg, dx, cost, x0, _, _ = _lin_setup()
    cfg = dataclasses.replace(cfg, backprop=True)
    lb = jnp.full((cfg.T, x0.shape[0], 2), -50.0)
    ub = jnp.full((cfg.T, x0.shape[0], 2), 50.0)

    def loss(c):
        sol = batched_solve(cfg, x0, QuadCost(cost.C, c), dx,
                            u_lower=lb, u_upper=ub)
        return (sol.u ** 2).sum()

    grad = jax.grad(loss)
    data = export_fn(grad, cost.c)
    g_art = load_fn(data)(cost.c)
    npt.assert_allclose(np.asarray(g_art), np.asarray(grad(cost.c)),
                        atol=1e-6)
    assert float(jnp.abs(g_art).max()) > 0


def test_closed_loop_roundtrip():
    """The on-device receding-horizon rollout exports as one artifact
    and reproduces the live closed loop exactly."""
    dx = PendulumDx()
    B, T, n_steps = 2, 6, 3
    rng = np.random.RandomState(1)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), jnp.asarray(p))
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=2,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=2)
    data = export_closed_loop(cfg, cost, dx, x0, n_steps,
                              u_lower=-2.0, u_upper=2.0)
    out = load_fn(data)(x0)
    ref = make_closed_loop(cfg, cost, dx, u_lower=-2.0, u_upper=2.0)(
        x0, n_steps)
    for k in ('xs', 'us', 'costs'):
        npt.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                            atol=1e-6)


def test_bounds_none_mismatch_raises():
    """One-sided bounds would silently clamp against 0.0 downstream
    (ops/lqr.py substitutes zeros for a missing side); both entry
    points must reject them like MPC's constructor assert does."""
    import pytest
    cfg, dx, cost, x0, lb, _ = _lin_setup()
    with pytest.raises(ValueError, match='both'):
        export_solve(cfg, dx, cost, x0, u_lower=-0.7, u_upper=None)
    with pytest.raises(ValueError, match='both'):
        batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=None)


def test_tpu_only_artifact_from_cpu_host_bakes_kernel():
    """Exporting platforms=['tpu'] from a non-TPU host must bake the
    fused Pallas kernel (Mosaic lowers without a physical TPU), not the
    trace-time backend's jnp path (ADVICE round 3: batched_solve keys
    dispatch on jax.default_backend(), wrong at export time)."""
    dx = PendulumDx()
    T, B, ns, nc = 5, 8, 3, 1
    ntau = ns + nc
    C = jnp.broadcast_to(
        jnp.diag(jnp.array([1., 1., 0.1, 0.001], jnp.float32)),
        (T, ntau, ntau))
    c = jnp.broadcast_to(jnp.array([-1., 0., 0., 0.], jnp.float32),
                         (T, ntau))
    x0 = jnp.asarray(np.random.RandomState(0).randn(B, ns), jnp.float32)
    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=2,
                    backprop=False, exit_unconverged=False,
                    detach_unconverged=False)
    assert jax.default_backend() != 'tpu'  # conftest pins cpu
    # the kernel is f32-only; under the suite's x64 mode python-float
    # constants trace as weak f64, which Mosaic refuses to cast down
    with jax.enable_x64(False):
        data = export_solve(cfg, dx, QuadCost(C, c), x0,
                            u_lower=-2.0, u_upper=2.0, platforms=['tpu'])
    exp = jax.export.deserialize(bytearray(data))
    assert [p.lower() for p in exp.platforms] == ['tpu']
    assert 'tpu_custom_call' in exp.mlir_module()


def test_multi_platform_rejects_forced_kernel():
    """use_fused='always' with a non-tpu platform in the list cannot be
    honored (the Pallas kernel only lowers for tpu) — loud error, not a
    broken artifact."""
    import pytest
    cfg, dx, cost, x0, lb, ub = _lin_setup()
    cfg = dataclasses.replace(cfg, use_fused='always')
    with pytest.raises(ValueError, match='non-tpu'):
        export_solve(cfg, dx, cost, x0, u_lower=lb, u_upper=ub,
                     platforms=['cpu', 'tpu'])


def test_serving_example_smoke(tmp_path):
    """examples/serving.py: export an artifact, then answer a request
    from a FRESH process that never imports mpc_tpu."""
    import os
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'examples', 'serving.py')
    out = subprocess.run(
        [_sys.executable, script, '--path', str(tmp_path / 'ctrl.bin'),
         '--batch', '2', '--horizon', '6', '--platform', 'cpu'],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert '[serve] OK' in out.stdout, out.stdout


def test_multi_platform_artifact():
    """One artifact lowered for BOTH cpu and tpu (jnp path, f32): the
    suite executes the cpu lowering; the tpu lowering was validated on
    hardware (BASELINE.md round-3 session 6: cpu-vs-tpu max |du|
    3.3e-5, the usual f32 cross-backend reduction-order difference)."""
    cfg, dx, cost, x0, lb, ub = _lin_setup()
    cfg = dataclasses.replace(cfg, use_fused='never')
    f32 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    dx, cost, x0, lb, ub = f32((dx, cost, x0, lb, ub))
    data = export_solve(cfg, dx, cost, x0, u_lower=lb, u_upper=ub,
                        platforms=['cpu', 'tpu'])
    exp = jax.export.deserialize(bytearray(data))
    assert {p.lower() for p in exp.platforms} == {'cpu', 'tpu'}
    _, u, _ = jax.jit(exp.call)(x0, cost.C, cost.c, dx.F, dx.f, lb, ub)
    ref = batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=ub)
    npt.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=2e-5)
