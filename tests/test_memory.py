"""Resource-stability regression tests.

The reference guards against per-solve memory growth (test_memory,
tests/test_mpc.py:864-936: RSS delta == 0 after repeated solver use).
The JAX-native equivalent hazards are unbounded COMPILE caches: the
receding-horizon pattern re-creates the MPC object every step
(reference examples/gym_pendulum.py:92-95), and each fresh instance
must reuse the module-level compiled-solver cache rather than add an
entry per call.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPC, QuadCost
from mpc_tpu.models import PendulumDx
import mpc_tpu.mpc as mpc_mod


def test_solver_cache_bounded():
    dx = PendulumDx()
    q, p = dx.get_true_obj()
    cost = QuadCost(jnp.diag(q), p)
    B, T = 2, 6
    th = np.linspace(-2, 2, B)
    x = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))

    def solve_once(u_init):
        ctrl = MPC(3, 1, T, u_lower=-2., u_upper=2., lqr_iter=2,
                   n_batch=B, u_init=u_init,
                   grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                   exit_unconverged=False, backprop=False,
                   linesearch_decay=0.2, max_linesearch_iter=2)
        _, us, _ = ctrl(x, cost, dx)
        return us

    u = solve_once(None)
    n_after_first = len(mpc_mod._SOLVER_CACHE)
    for _ in range(5):
        u = solve_once(u)          # fresh MPC instance every step
    n_after = len(mpc_mod._SOLVER_CACHE)
    # first warm-started call may add one more entry (u_init present);
    # beyond that the cache must not grow
    assert n_after <= n_after_first + 1, (
        f'solver cache grew from {n_after_first} to {n_after} across '
        f'identical re-created controllers')


def test_solver_cache_lru_bound_under_config_churn():
    """Sweeping distinct configs / fresh lambda costs must not pin
    compiled programs forever: the cache is LRU-bounded
    (round-2 verdict item 9; mirrors _SHARDED_CACHE's discipline)."""
    B = 2
    th = np.linspace(-2, 2, B)
    x = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))
    from mpc_tpu import LinDx

    F = jnp.tile(0.9 * jnp.eye(3, 4)[None], (5, 1, 1))
    dx_lin = LinDx(F, None)

    prev_max = mpc_mod._SOLVER_CACHE_MAX
    mpc_mod._SOLVER_CACHE_MAX = 4
    try:
        for i in range(8):
            C = jnp.tile(jnp.eye(4)[None], (6, 1, 1))
            c = jnp.zeros((6, 4))
            # distinct config (eps varies) AND fresh cost arrays
            ctrl = MPC(3, 1, 6, lqr_iter=1, n_batch=B, eps=1e-7 * (i + 1),
                       grad_method=GradMethods.AUTO_DIFF,
                       exit_unconverged=False, backprop=False,
                       max_linesearch_iter=2)
            ctrl.solve(x, QuadCost(C, c), dx_lin)
        assert len(mpc_mod._SOLVER_CACHE) <= 4, (
            f'cache has {len(mpc_mod._SOLVER_CACHE)} entries, LRU bound 4')
    finally:
        mpc_mod._SOLVER_CACHE_MAX = prev_max


def test_sharded_cache_bounded():
    from mpc_tpu import MPCConfig
    from mpc_tpu.parallel import make_mesh, solve_sharded
    import mpc_tpu.parallel.mesh as mesh_mod

    dx = PendulumDx()
    q, p = dx.get_true_obj()
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=5, lqr_iter=2, eps=0.0,
                    grad_method=GradMethods.AUTO_DIFF,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, max_linesearch_iter=2)
    mesh = make_mesh(jax.devices()[:2])
    B = 4
    rng = np.random.RandomState(0)
    n0 = len(mesh_mod._SHARDED_CACHE)
    for _ in range(3):
        th = np.pi * (2 * rng.rand(B) - 1)
        x = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))
        solve_sharded(cfg, mesh, x, QuadCost(jnp.diag(q), p), dx,
                      u_lower=-2.0, u_upper=2.0)
    assert len(mesh_mod._SHARDED_CACHE) <= n0 + 1
