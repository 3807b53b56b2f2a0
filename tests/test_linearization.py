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
