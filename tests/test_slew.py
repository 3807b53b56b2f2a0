"""Slew-rate penalty behavioral tests
(reference test_lqr_slew_rate, tests/test_mpc.py:802-861)."""

import numpy as np
import numpy.random as npr
import numpy.testing as npt

import jax.numpy as jnp

from mpc_tpu import MPC, QuadCost
from mpc_tpu.models import AffineDynamics


def _setup():
    npr.seed(1)
    n_batch, n_state, n_ctrl, T = 2, 3, 4, 5
    n_sc = n_state + n_ctrl
    alpha = 0.2
    C = npr.randn(T, n_batch, n_sc, n_sc)
    C = np.matmul(C.transpose(0, 1, 3, 2), C)
    c = npr.randn(T, n_batch, n_sc)
    x_init = npr.randn(n_batch, n_state)
    R = np.eye(n_state) + alpha * npr.randn(n_state, n_state)
    S = npr.randn(n_state, n_ctrl)
    f = npr.randn(n_state)
    dyn = AffineDynamics(jnp.asarray(R), jnp.asarray(S), jnp.asarray(f))
    return (n_state, n_ctrl, T), C, c, x_init, dyn


def _solve(dims, C, c, x_init, dyn, slew):
    n_state, n_ctrl, T = dims
    ctrl = MPC(n_state, n_ctrl, T, None, None, lqr_iter=10,
               backprop=False, exit_unconverged=False, eps=1e-4,
               slew_rate_penalty=slew)
    return ctrl(jnp.asarray(x_init), QuadCost(jnp.asarray(C),
                                              jnp.asarray(c)), dyn)


def test_slew_rate():
    dims, C, c, x_init, dyn = _setup()

    x, u, objs = _solve(dims, C, c, x_init, dyn, None)

    # penalty -> 0 must recover the unpenalized solution
    # (reference tests/test_mpc.py:831-844)
    x_eps, u_eps, _ = _solve(dims, C, c, x_init, dyn, 1e-6)
    npt.assert_allclose(np.asarray(x), np.asarray(x_eps), atol=1e-3)
    npt.assert_allclose(np.asarray(u), np.asarray(u_eps), atol=1e-3)

    # penalty = 1: original objective rises, control slew shrinks
    # (reference tests/test_mpc.py:846-861)
    x_slew, u_slew, objs_slew = _solve(dims, C, c, x_init, dyn, 1.0)
    # objs_slew includes the penalty term; compare the true original
    # objective of the trajectories like the reference does via objs
    assert bool(np.all(np.asarray(objs) < np.asarray(objs_slew)))

    d = float(jnp.linalg.norm(u[:-1] - u[1:]))
    d_slew = float(jnp.linalg.norm(u_slew[:-1] - u_slew[1:]))
    assert d_slew < d
