"""The reference-parity batched-linalg surface (mpc/util.py:30-70).

These primitives are the building blocks the solver composes under
vmap; each is pinned against numpy so the public surface mirrors the
reference's ``util`` module behavior exactly.
"""

import numpy as np
import numpy.testing as npt

import jax.numpy as jnp

from mpc_tpu.ops import linalg


def test_batched_primitives():
    rng = np.random.RandomState(0)
    x = rng.randn(4)
    y = rng.randn(4)
    Q = rng.randn(4, 4)
    npt.assert_allclose(np.asarray(linalg.bmv(jnp.asarray(Q),
                                              jnp.asarray(x))), Q @ x)
    npt.assert_allclose(np.asarray(linalg.bger(jnp.asarray(x),
                                               jnp.asarray(y))),
                        np.outer(x, y))
    npt.assert_allclose(np.asarray(linalg.bquad(jnp.asarray(x),
                                                jnp.asarray(Q))),
                        x @ Q @ x)
    npt.assert_allclose(np.asarray(linalg.bdot(jnp.asarray(x),
                                               jnp.asarray(y))),
                        np.dot(x, y))
    npt.assert_allclose(np.asarray(linalg.bdiag(jnp.asarray(x))),
                        np.diag(x))
    npt.assert_allclose(
        np.asarray(linalg.eclamp(jnp.asarray(x), -0.5, 0.5)),
        np.clip(x, -0.5, 0.5))


def test_solve_psd_pinv_semidefinite():
    """The reference's pinverse path must survive singular Q_uu
    (mpc/lqr_step.py:89-94): least-norm solution on the range."""
    rng = np.random.RandomState(1)
    A = rng.randn(4, 2)
    H = A @ A.T                      # rank-2 PSD
    b = H @ rng.randn(4)             # in range(H)
    x = np.asarray(linalg.solve_psd_pinv(jnp.asarray(H), jnp.asarray(b)))
    npt.assert_allclose(H @ x, b, atol=1e-8)


def test_masked_free_matrix_block_decouples():
    rng = np.random.RandomState(2)
    H = rng.randn(5, 5)
    H = H @ H.T + np.eye(5)
    free = np.array([True, False, True, True, False])
    Hm = np.asarray(linalg.masked_free_matrix(jnp.asarray(H),
                                              jnp.asarray(free)))
    b = rng.randn(5) * free
    x = np.asarray(linalg.solve_sym(jnp.asarray(Hm), jnp.asarray(b)))
    # clamped entries come out exactly zero; free block solves untouched
    assert abs(x[1]) < 1e-12 and abs(x[4]) < 1e-12
    sub = np.ix_(free, free)
    npt.assert_allclose(H[sub] @ x[free], b[free], atol=1e-9)
