"""Linear-quadratic solve tests vs the dense-QP oracle.

Ports of the reference's cvxpy-oracle tests (tests/test_mpc.py:91-240):
unbounded (plus bounded-solver-with-huge-bounds equivalence), bounded,
and the delta_u trust region property test.
"""

import numpy as np
import numpy.random as npr
import numpy.testing as npt

import jax.numpy as jnp

from mpc_tpu import MPC, QuadCost, LinDx
from mpc_tpu.models import AffineDynamics

from oracles import lqr_dense


def _problem(seed=1, n_batch=2, n_state=3, n_ctrl=4, T=5, S_scale=1.0):
    npr.seed(seed)
    n_sc = n_state + n_ctrl
    C = npr.randn(T, n_batch, n_sc, n_sc)
    C = np.matmul(C.transpose(0, 1, 3, 2), C)
    c = npr.randn(T, n_batch, n_sc)
    alpha = 0.2
    R = np.tile(np.eye(n_state) + alpha * npr.randn(n_state, n_state),
                (T, n_batch, 1, 1))
    S = S_scale * np.tile(npr.randn(n_state, n_ctrl), (T, n_batch, 1, 1))
    F = np.concatenate((R, S), axis=3)
    f = np.tile(npr.randn(n_state), (T, n_batch, 1))
    x_init = npr.randn(n_batch, n_state)
    return C, c, F, f, x_init


def test_lqr_linear_unbounded():
    n_batch, n_state, n_ctrl, T = 2, 3, 4, 5
    C, c, F, f, x_init = _problem(1, n_batch, n_state, n_ctrl, T)

    x_or, u_or = lqr_dense(C[:, 0], c[:, 0], F[:T - 1, 0], f[:T - 1, 0],
                           x_init[0], T, n_state, n_ctrl)

    # bounded solver with huge bounds must equal the unbounded solution
    # (reference tests/test_mpc.py:110-138)
    u_lower = -1e4 * np.ones((T, n_batch, n_ctrl))
    u_upper = 1e4 * np.ones((T, n_batch, n_ctrl))
    x, u, _ = MPC(n_state, n_ctrl, T, jnp.asarray(u_lower),
                  jnp.asarray(u_upper), lqr_iter=10, backprop=False,
                  exit_unconverged=True)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)),
        LinDx(jnp.asarray(F), jnp.asarray(f)))
    npt.assert_allclose(x_or, np.asarray(x)[:, 0], rtol=1e-3)
    npt.assert_allclose(u_or, np.asarray(u)[:, 0], rtol=1e-3)

    # plain unbounded path (reference tests/test_mpc.py:140-149)
    x, u, _ = MPC(n_state, n_ctrl, T, None, None, lqr_iter=10,
                  backprop=False, exit_unconverged=False)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)),
        LinDx(jnp.asarray(F), jnp.asarray(f)))
    npt.assert_allclose(u_or, np.asarray(u)[:, 0], rtol=1e-3)


def test_lqr_linear_unbounded_module_dynamics():
    # AffineDynamics module instead of LinDx (reference passes a module
    # at tests/test_mpc.py:126-135)
    n_batch, n_state, n_ctrl, T = 2, 3, 4, 5
    C, c, F, f, x_init = _problem(1, n_batch, n_state, n_ctrl, T)
    dyn = AffineDynamics(jnp.asarray(F[0, 0, :, :n_state]),
                         jnp.asarray(F[0, 0, :, n_state:]),
                         jnp.asarray(f[0, 0]))
    _, u_or = lqr_dense(C[:, 0], c[:, 0], F[:T - 1, 0], f[:T - 1, 0],
                        x_init[0], T, n_state, n_ctrl)
    x, u, _ = MPC(n_state, n_ctrl, T, None, None, lqr_iter=10,
                  backprop=False, exit_unconverged=False)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)), dyn)
    npt.assert_allclose(u_or, np.asarray(u)[:, 0], rtol=1e-3)


def test_lqr_linear_bounded():
    # reference tests/test_mpc.py:152-194
    n_batch, n_state, n_ctrl, T = 2, 3, 4, 5
    C, c, F, f, x_init = _problem(1, n_batch, n_state, n_ctrl, T)
    npr.seed(7)
    u_lower = -npr.random((T, n_batch, n_ctrl))
    u_upper = npr.random((T, n_batch, n_ctrl))

    x, u, _ = MPC(n_state, n_ctrl, T, jnp.asarray(u_lower),
                  jnp.asarray(u_upper), lqr_iter=20, backprop=False,
                  exit_unconverged=False)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)),
        LinDx(jnp.asarray(F), jnp.asarray(f)))

    for b in range(n_batch):
        x_or, u_or = lqr_dense(
            C[:, b], c[:, b], F[:T - 1, b], f[:T - 1, b], x_init[b],
            T, n_state, n_ctrl, u_lower[:, b], u_upper[:, b])
        npt.assert_allclose(u_or, np.asarray(u)[:, b], rtol=1e-3, atol=1e-4)
        npt.assert_allclose(x_or, np.asarray(x)[:, b], rtol=1e-3, atol=1e-4)


def test_lqr_linear_bounded_delta():
    # delta_u trust region: |u| <= delta_u after 1 iteration from zero
    # warm start (reference tests/test_mpc.py:197-240)
    n_batch, n_state, n_ctrl, T = 2, 3, 4, 5
    C, c, F, f, x_init = _problem(1, n_batch, n_state, n_ctrl, T,
                                  S_scale=0.01)
    npr.seed(8)
    u_lower = -npr.random((T, n_batch, n_ctrl))
    u_upper = npr.random((T, n_batch, n_ctrl))

    delta_u = 0.1
    x, u, _ = MPC(n_state, n_ctrl, T, jnp.asarray(u_lower),
                  jnp.asarray(u_upper), lqr_iter=1, delta_u=delta_u,
                  backprop=False, exit_unconverged=False)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)),
        LinDx(jnp.asarray(F), jnp.asarray(f)))
    assert float(jnp.abs(u).max()) <= delta_u + 1e-12
