"""On-device closed-loop rollout vs the host loop."""
import numpy as np
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu import (GradMethods, MPCConfig, QuadCost, batched_solve,
                     make_closed_loop)
from mpc_tpu.models import PendulumDx


def _setup(B=4, T=8):
    dx = PendulumDx()
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), jnp.asarray(p))
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=4,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=3)
    return dx, x0, cost, cfg


def test_closed_loop_matches_host_loop():
    """One compiled lax.scan must reproduce the host-side receding-
    horizon loop (same shift-left warm-start protocol) exactly."""
    dx, x0, cost, cfg = _setup()
    n_steps = 6
    roll = make_closed_loop(cfg, cost, dx, u_lower=-2.0, u_upper=2.0)
    out = roll(x0, n_steps)

    # host loop with the identical protocol
    x = x0
    u_warm = jnp.zeros((cfg.T, x0.shape[0], 1), x0.dtype)
    xs, us = [x], []
    for _ in range(n_steps):
        sol = batched_solve(cfg, x, cost, dx, u_init=u_warm,
                            u_lower=-2.0, u_upper=2.0)
        u0 = sol.u[0]
        x = dx(x, u0)
        u_warm = jnp.concatenate([sol.u[1:], jnp.zeros_like(sol.u[:1])],
                                 axis=0)
        xs.append(x)
        us.append(u0)

    npt.assert_allclose(np.asarray(out['us']),
                        np.asarray(jnp.stack(us)), atol=1e-5)
    npt.assert_allclose(np.asarray(out['xs']),
                        np.asarray(jnp.stack(xs)), atol=1e-4)


def test_closed_loop_swings_up():
    """100 compiled steps stabilize the pendulum (the product demo as
    one device program)."""
    dx, x0, cost, cfg = _setup(B=4, T=20)
    roll = make_closed_loop(cfg, cost, dx, u_lower=-2.0, u_upper=2.0)
    out = roll(x0, 100)
    cos_th = np.asarray(out['xs'][-1][:, 0])
    assert np.all(cos_th > 0.9), cos_th


def test_closed_loop_model_mismatch():
    """env_dynamics decoupled from the controller's internal model."""
    dx, x0, cost, cfg = _setup()
    dx_wrong = PendulumDx(params=jnp.asarray([10.0, 1.2, 1.0]))
    roll = make_closed_loop(cfg, cost, dx_wrong, env_dynamics=dx,
                            u_lower=-2.0, u_upper=2.0)
    out = roll(x0, 4)
    # environment states must follow the TRUE dynamics
    x1 = dx(x0, out['us'][0])
    npt.assert_allclose(np.asarray(out['xs'][1]), np.asarray(x1),
                        atol=1e-6)


def test_closed_loop_slew_threads_prev_ctrl():
    """With a slew-rate penalty the next solve must see the last
    APPLIED control as prev_ctrl; must match a host loop doing the
    same threading."""
    import dataclasses

    dx, x0, cost, cfg = _setup()
    cfg = dataclasses.replace(cfg, slew_rate_penalty=0.5)
    n_steps = 4
    roll = make_closed_loop(cfg, cost, dx, u_lower=-2.0, u_upper=2.0)
    out = roll(x0, n_steps)

    x = x0
    u_warm = jnp.zeros((cfg.T, x0.shape[0], 1), x0.dtype)
    prev = jnp.zeros((x0.shape[0], 1), x0.dtype)
    us = []
    for _ in range(n_steps):
        sol = batched_solve(cfg, x, cost, dx, u_init=u_warm,
                            u_lower=-2.0, u_upper=2.0, prev_ctrl=prev)
        u0 = sol.u[0]
        x = dx(x, u0)
        prev = u0
        u_warm = jnp.concatenate([sol.u[1:], jnp.zeros_like(sol.u[:1])],
                                 axis=0)
        us.append(u0)

    npt.assert_allclose(np.asarray(out['us']),
                        np.asarray(jnp.stack(us)), atol=1e-5)


def test_closed_loop_single_instance_env():
    """env_dynamics follows the library-wide SINGLE-INSTANCE dynamics
    contract (solver.rollout vmaps callables): a callable that matmuls
    against its [n_state] input — valid as MPC dynamics — must work
    unchanged as env_dynamics.  Before round 4 the rollout called
    env(x_batch, u_batch) directly, so this env produced shape errors."""
    dx, x0, cost, cfg = _setup()
    A = jnp.asarray(np.diag([0.9, 0.9, 0.8]))
    Bm = jnp.asarray(np.array([[0.0], [0.1], [0.5]]))

    def env(x, u):                      # [3], [1] -> [3]: matmul form
        return A @ x + Bm @ u

    roll = make_closed_loop(cfg, cost, dx, env_dynamics=env,
                            u_lower=-2.0, u_upper=2.0)
    n_steps = 3
    out = roll(x0, n_steps)

    # host loop with the explicitly-batched equivalent
    x = x0
    u_warm = jnp.zeros((cfg.T, x0.shape[0], 1), x0.dtype)
    for i in range(n_steps):
        sol = batched_solve(cfg, x, cost, dx, u_init=u_warm,
                            u_lower=-2.0, u_upper=2.0)
        u0 = sol.u[0]
        x = x @ A.T + u0 @ Bm.T
        u_warm = jnp.concatenate([sol.u[1:], jnp.zeros_like(sol.u[:1])],
                                 axis=0)
        npt.assert_allclose(np.asarray(out['xs'][i + 1]), np.asarray(x),
                            atol=1e-6)


def test_closed_loop_lindx_env():
    """A LinDx environment steps with its first-timestep system
    x' = F_0 [x; u] + f_0."""
    from mpc_tpu import LinDx

    dx, x0, cost, cfg = _setup()
    rng = np.random.RandomState(5)
    F = jnp.asarray(rng.uniform(-0.4, 0.4, (cfg.T - 1, 3, 4)))
    f = jnp.asarray(0.05 * rng.randn(cfg.T - 1, 3))
    roll = make_closed_loop(cfg, cost, dx, env_dynamics=LinDx(F, f),
                            u_lower=-2.0, u_upper=2.0)
    out = roll(x0, 2)
    sol = batched_solve(cfg, x0, cost, dx,
                        u_init=jnp.zeros((cfg.T, x0.shape[0], 1),
                                         x0.dtype),
                        u_lower=-2.0, u_upper=2.0)
    xu = jnp.concatenate([x0, sol.u[0]], axis=1)
    expect = xu @ F[0].T + f[0]
    npt.assert_allclose(np.asarray(out['xs'][1]), np.asarray(expect),
                        atol=1e-6)
