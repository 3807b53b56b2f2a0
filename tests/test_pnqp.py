"""PNQP tests vs a scipy oracle (reference test_lqr_qp,
tests/test_mpc.py:65-88: n=100, batch=2, rtol 1e-3)."""

import numpy as np
import numpy.random as npr
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu.ops.pnqp import pnqp

from oracles import box_qp


def test_pnqp_vs_scipy():
    npr.seed(1)
    n_batch, n = 2, 100
    C = npr.randn(n_batch, n, n)
    C = np.matmul(C.transpose(0, 2, 1), C)
    c = npr.randn(n_batch, n)
    lower = -npr.random((n_batch, n))
    upper = npr.random((n_batch, n))

    opt_oracle = np.stack(
        [box_qp(C[i], c[i], lower[i], upper[i]) for i in range(n_batch)])

    res = jax.vmap(lambda H, q, lo, hi: pnqp(H, q, lo, hi))(
        jnp.asarray(C), jnp.asarray(c), jnp.asarray(lower),
        jnp.asarray(upper))

    npt.assert_allclose(opt_oracle, np.asarray(res.x), rtol=1e-3, atol=1e-6)
    assert bool(res.converged.all())


def test_pnqp_small_warmstart():
    npr.seed(2)
    n_batch, n = 8, 3
    C = npr.randn(n_batch, n, n)
    C = np.matmul(C.transpose(0, 2, 1), C) + 0.1 * np.eye(n)
    c = npr.randn(n_batch, n)
    lower = -np.ones((n_batch, n))
    upper = np.ones((n_batch, n))

    solve = jax.vmap(lambda H, q, lo, hi, x0: pnqp(H, q, lo, hi, x_init=x0))
    x0 = jnp.zeros((n_batch, n))
    res = solve(jnp.asarray(C), jnp.asarray(c), jnp.asarray(lower),
                jnp.asarray(upper), x0)
    oracle = np.stack(
        [box_qp(C[i], c[i], lower[i], upper[i]) for i in range(n_batch)])
    npt.assert_allclose(oracle, np.asarray(res.x), rtol=1e-3, atol=1e-6)


def test_pnqp_unconstrained_interior():
    # with huge bounds the solution equals the Newton point
    npr.seed(3)
    n = 5
    C = npr.randn(n, n)
    C = C.T @ C + 0.5 * np.eye(n)
    c = npr.randn(n)
    res = pnqp(jnp.asarray(C), jnp.asarray(c),
               jnp.full((n,), -1e6), jnp.full((n,), 1e6))
    npt.assert_allclose(np.linalg.solve(C, -c), np.asarray(res.x),
                        rtol=1e-6, atol=1e-8)
