"""Linearization cross-method consistency
(reference test_lqr_linearization, tests/test_mpc.py:747-799, and
tests/test_dynamics.py:25-56)."""

import numpy as np
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, rollout, linearize_dynamics
from mpc_tpu.models import NNDynamics


def _setup(activation):
    n_batch, n_state, n_ctrl, T = 2, 3, 4, 5
    dyn = NNDynamics.init(jax.random.PRNGKey(1), n_state, n_ctrl,
                          hidden_sizes=(10,), activation=activation,
                          dtype=jnp.float64)
    key = jax.random.PRNGKey(2)
    u = jax.random.normal(key, (T, n_batch, n_ctrl), jnp.float64)
    x_init = jax.random.normal(jax.random.PRNGKey(3),
                               (n_batch, n_state), jnp.float64)
    x = jax.vmap(lambda x0, uu: rollout(dyn, x0, uu),
                 in_axes=(0, 1), out_axes=1)(x_init, u)
    return dyn, x, u


def _linearize(dyn, x, u, method):
    return jax.vmap(
        lambda xs, us: linearize_dynamics(dyn, xs, us, method),
        in_axes=1, out_axes=1)(x, u)


def test_linearization_methods_agree():
    dyn, x, u = _setup('sigmoid')
    Fan, fan = _linearize(dyn, x, u, GradMethods.ANALYTIC)
    Fau, fau = _linearize(dyn, x, u, GradMethods.AUTO_DIFF)
    npt.assert_allclose(np.asarray(Fan), np.asarray(Fau), atol=1e-4)
    npt.assert_allclose(np.asarray(fan), np.asarray(fau), atol=1e-4)

    Ffd, ffd = _linearize(dyn, x, u, GradMethods.FINITE_DIFF)
    npt.assert_allclose(np.asarray(Fan), np.asarray(Ffd), atol=1e-4)
    npt.assert_allclose(np.asarray(fan), np.asarray(ffd), atol=1e-4)


def test_nn_grad_input_vs_autodiff():
    # reference tests/test_dynamics.py:25-56 (relu and sigmoid)
    for act in ['relu', 'sigmoid', 'elu']:
        dyn = NNDynamics.init(jax.random.PRNGKey(4), 3, 2,
                              hidden_sizes=(8, 8), activation=act,
                              dtype=jnp.float64)
        x = jax.random.normal(jax.random.PRNGKey(5), (3,), jnp.float64)
        u = jax.random.normal(jax.random.PRNGKey(6), (2,), jnp.float64)
        R_an, S_an = dyn.grad_input(x, u)
        R_ad, S_ad = jax.jacrev(dyn, argnums=(0, 1))(x, u)
        npt.assert_allclose(np.asarray(R_an), np.asarray(R_ad), atol=1e-8)
        npt.assert_allclose(np.asarray(S_an), np.asarray(S_ad), atol=1e-8)


def test_analytic_check_trajectory_wide():
    """ANALYTIC_CHECK must catch a hand-rolled Jacobian that is correct
    AT x_init but wrong away from it (the reference's dead branch,
    mpc/mpc.py:552-567, intended a per-timestep check inside the
    linearization loop; a single-point check at (x_init, u_init[0])
    passes this model)."""
    import pytest
    from mpc_tpu import MPC, QuadCost

    ns, nc, T, B = 3, 1, 6, 2
    x0 = jnp.full((B, ns), 0.5)
    x0_frozen = x0[0]
    Bm = jnp.asarray(np.array([[0.1], [0.2], [0.3]]))

    class FrozenJac:
        """f(x,u) = 0.9 x + 0.1 x^3 + B u, but grad_input returns the
        TRUE Jacobian evaluated at the initial state regardless of x:
        exact at t=0, wrong at every later trajectory point."""

        def __call__(self, x, u):
            return 0.9 * x + 0.1 * x ** 3 + Bm @ u

        def grad_input(self, x, u):
            return jnp.diag(0.9 + 0.3 * x0_frozen ** 2), Bm

    C = jnp.eye(ns + nc)
    c = jnp.zeros(ns + nc)
    ctrl = MPC(ns, nc, T, n_batch=B, lqr_iter=2,
               grad_method=GradMethods.ANALYTIC_CHECK,
               exit_unconverged=False, backprop=False)
    with pytest.raises(AssertionError, match='trajectory step'):
        ctrl(x0, QuadCost(C, c), FrozenJac())

    class TrueJac(FrozenJac):
        def grad_input(self, x, u):
            return jnp.diag(0.9 + 0.3 * x ** 2), Bm

    xs, us, costs = ctrl(x0, QuadCost(C, c), TrueJac())
    assert np.all(np.isfinite(np.asarray(us)))
