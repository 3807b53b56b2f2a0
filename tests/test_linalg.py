"""The reference-parity batched-linalg surface (mpc/util.py:30-70).

These primitives are the building blocks the solver composes under
vmap; each is pinned against numpy so the public surface mirrors the
reference's ``util`` module behavior exactly.
"""

import numpy as np
import numpy.testing as npt

import jax
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


def test_solve_spd_matches_lu_vector_and_matrix_rhs():
    # solve_spd (unrolled Cholesky, the TPU-fast path for the PNQP
    # Newton and masked Riccati gain solves) must agree with the
    # general LU solve on SPD systems, for both RHS shapes.
    rng = np.random.RandomState(7)
    for n in [2, 4, 7, 16]:
        A = rng.randn(n, n)
        H = jnp.asarray(A @ A.T + n * np.eye(n))
        b = jnp.asarray(rng.randn(n))
        Bm = jnp.asarray(rng.randn(n, 3))
        npt.assert_allclose(np.asarray(linalg.solve_spd(H, b)),
                            np.asarray(linalg.solve_sym(H, b)),
                            rtol=1e-9, atol=1e-10)
        npt.assert_allclose(np.asarray(linalg.solve_spd(H, Bm)),
                            np.asarray(linalg.solve_sym(H, Bm)),
                            rtol=1e-9, atol=1e-10)


def test_solve_spd_large_n_cho_solve_path():
    # n > _UNROLL_CHOL_N falls back to batched cholesky+cho_solve
    rng = np.random.RandomState(8)
    n = linalg._UNROLL_CHOL_N + 8
    A = rng.randn(n, n)
    H = jnp.asarray(A @ A.T + n * np.eye(n))
    b = jnp.asarray(rng.randn(n))
    npt.assert_allclose(np.asarray(linalg.solve_spd(H, b)),
                        np.asarray(linalg.solve_sym(H, b)),
                        rtol=1e-8, atol=1e-9)


def test_solve_spd_vmaps_with_masked_free_matrix():
    # the PNQP composition: masked SPD system under vmap, clamped rows
    # come out exactly zero
    rng = np.random.RandomState(9)
    B, n = 64, 4
    A = rng.randn(B, n, n)
    H = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + np.eye(n))
    free = jnp.asarray(rng.rand(B, n) > 0.3)
    b = jnp.asarray(rng.randn(B, n)) * free
    Hm = jax.vmap(linalg.masked_free_matrix)(H, free)
    x = jax.vmap(linalg.solve_spd)(Hm, b)
    assert np.all(np.abs(np.asarray(x)[~np.asarray(free)]) < 1e-12)
    ref = jax.vmap(linalg.solve_sym)(Hm, b)
    npt.assert_allclose(np.asarray(x), np.asarray(ref),
                        rtol=1e-8, atol=1e-9)
