"""Backward-pass tests vs a finite-difference oracle.

Ports of the reference's numdifftools-oracle tests
(tests/test_mpc.py:303-744): gradients of the solver output u* w.r.t.
c, F, f, x_init in the unconstrained-interior and actively-constrained
cases, module-vs-LinDx gradient equivalence, and NN-dynamics parameter
gradients (plus the slew-rate variant).  Everything in float64.
"""

import numpy as np
import numpy.random as npr
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu import MPC, QuadCost, LinDx, GradMethods
from mpc_tpu.models import AffineDynamics, NNDynamics
from mpc_tpu.utils.fd import fd_jacobian


def _problem(beta, seed=0):
    npr.seed(seed)
    n_batch, n_state, n_ctrl, T = 1, 2, 2, 3
    n_sc = n_state + n_ctrl
    C = 10. * npr.randn(T, n_batch, n_sc, n_sc)
    C = np.matmul(C.transpose(0, 1, 3, 2), C)
    c = 10. * npr.randn(T, n_batch, n_sc)
    x_init = npr.randn(n_batch, n_state)
    u_lower = -beta * np.ones((T, n_batch, n_ctrl))
    u_upper = beta * np.ones((T, n_batch, n_ctrl))
    F = npr.randn(T - 1, n_batch, n_state, n_sc)
    f = npr.randn(T - 1, n_batch, n_state)
    return (n_batch, n_state, n_ctrl, T), (C, c, F, f, x_init,
                                           u_lower, u_upper)


def _solve_u(dims, C, c, F, f, x_init, u_lower, u_upper, **kw):
    n_batch, n_state, n_ctrl, T = dims
    ctrl = MPC(n_state, n_ctrl, T, jnp.asarray(u_lower),
               jnp.asarray(u_upper), lqr_iter=kw.pop('lqr_iter', 40),
               exit_unconverged=False, detach_unconverged=True,
               max_linesearch_iter=kw.pop('max_linesearch_iter', 2), **kw)
    x, u, _ = ctrl(jnp.asarray(x_init),
                   QuadCost(jnp.asarray(C), jnp.asarray(c)),
                   LinDx(jnp.asarray(F), jnp.asarray(f)))
    return u.reshape(-1)


def _check_grads(beta, assert_boundary):
    dims, (C, c, F, f, x_init, lb, ub) = _problem(beta)
    n_batch, n_state, n_ctrl, T = dims
    n_sc = n_state + n_ctrl

    u0 = np.asarray(_solve_u(dims, C, c, F, f, x_init, lb, ub,
                             backprop=False))
    if assert_boundary:
        # solution strictly partially on the boundary
        # (reference tests/test_mpc.py:452-454)
        on = (np.abs(np.abs(u0) - beta) < 1e-8)
        assert on.any() and (~on).any()
    else:
        assert (np.abs(np.abs(u0) - beta) > 1e-8).all()

    du_dc_fd = fd_jacobian(
        lambda z: np.asarray(_solve_u(
            dims, C, z.reshape(c.shape), F, f, x_init, lb, ub,
            backprop=False)), c.reshape(-1), eps=1e-5)
    du_dF_fd = fd_jacobian(
        lambda z: np.asarray(_solve_u(
            dims, C, c, z.reshape(F.shape), f, x_init, lb, ub,
            backprop=False)), F.reshape(-1), eps=1e-5)
    du_df_fd = fd_jacobian(
        lambda z: np.asarray(_solve_u(
            dims, C, c, F, z.reshape(f.shape), x_init, lb, ub,
            backprop=False)), f.reshape(-1), eps=1e-5)
    du_dx0_fd = fd_jacobian(
        lambda z: np.asarray(_solve_u(
            dims, C, c, F, f, z.reshape(x_init.shape), lb, ub,
            backprop=False)), x_init.reshape(-1), eps=1e-5)

    jac = jax.jacrev(
        lambda cc, FF, ff, x0: _solve_u(dims, C, cc, FF, ff, x0, lb, ub,
                                        lqr_iter=20),
        argnums=(0, 1, 2, 3))
    du_dc, du_dF, du_df, du_dx0 = [
        np.asarray(j).reshape(u0.size, -1)
        for j in jac(jnp.asarray(c), jnp.asarray(F), jnp.asarray(f),
                     jnp.asarray(x_init))]

    npt.assert_allclose(du_dc_fd, du_dc, atol=1e-4)
    npt.assert_allclose(du_dF_fd, du_dF, atol=1e-4)
    npt.assert_allclose(du_df_fd, du_df, atol=1e-4)
    npt.assert_allclose(du_dx0_fd, du_dx0, atol=1e-4)


def test_backward_linear_dynamics_unconstrained():
    # reference tests/test_mpc.py:303-395 (beta=100: interior solution)
    _check_grads(beta=100., assert_boundary=False)


def test_backward_linear_dynamics_constrained():
    # reference tests/test_mpc.py:398-500 (beta=0.5: active constraints)
    _check_grads(beta=0.5, assert_boundary=True)


def test_backward_affine_dynamics_module_matches_lindx():
    # gradient equivalence of module-based and LinDx-based dynamics
    # (reference tests/test_mpc.py:503-558)
    npr.seed(0)
    n_batch, n_state, n_ctrl, T = 1, 2, 2, 2
    n_sc = n_state + n_ctrl
    C = 10. * npr.randn(T, n_batch, n_sc, n_sc)
    C = np.matmul(C.transpose(0, 1, 3, 2), C)
    c = 10. * npr.randn(T, n_batch, n_sc)
    x_init = npr.randn(n_batch, n_state)
    beta = 2.0
    lb = -beta * np.ones((T, n_batch, n_ctrl))
    ub = beta * np.ones((T, n_batch, n_ctrl))
    F0 = npr.randn(n_state, n_sc)
    F = np.tile(F0, (T - 1, n_batch, 1, 1))

    def u_of_F_lindx(Fflat):
        Fb = jnp.broadcast_to(Fflat.reshape(1, 1, n_state, n_sc),
                              (T - 1, n_batch, n_state, n_sc))
        ctrl = MPC(n_state, n_ctrl, T, jnp.asarray(lb), jnp.asarray(ub),
                   lqr_iter=20, exit_unconverged=False)
        _, u, _ = ctrl(jnp.asarray(x_init),
                       QuadCost(jnp.asarray(C), jnp.asarray(c)),
                       LinDx(Fb, None))
        return u.reshape(-1)

    def u_of_F_module(Fflat):
        Fm = Fflat.reshape(n_state, n_sc)
        dyn = AffineDynamics(Fm[:, :n_state], Fm[:, n_state:])
        ctrl = MPC(n_state, n_ctrl, T, jnp.asarray(lb), jnp.asarray(ub),
                   lqr_iter=20, exit_unconverged=False,
                   grad_method=GradMethods.ANALYTIC)
        _, u, _ = ctrl(jnp.asarray(x_init),
                       QuadCost(jnp.asarray(C), jnp.asarray(c)), dyn)
        return u.reshape(-1)

    F0j = jnp.asarray(F0.reshape(-1))
    du_dF_lin = np.asarray(jax.jacrev(u_of_F_lindx)(F0j))
    du_dF_mod = np.asarray(jax.jacrev(u_of_F_module)(F0j))
    npt.assert_allclose(du_dF_lin, du_dF_mod, atol=1e-4)


def _nn_problem(slew):
    npr.seed(0)
    n_batch, n_state, n_ctrl, T = 1, 2, 2, 2
    n_sc = n_state + n_ctrl
    C = 10. * npr.randn(T, n_batch, n_sc, n_sc)
    C = np.matmul(C.transpose(0, 1, 3, 2), C)
    c = 10. * npr.randn(T, n_batch, n_sc)
    x_init = npr.randn(n_batch, n_state)
    beta = 1.
    lb = -beta * np.ones((T, n_batch, n_ctrl))
    ub = beta * np.ones((T, n_batch, n_ctrl))

    dyn = NNDynamics.init(jax.random.PRNGKey(0), n_state, n_ctrl,
                          hidden_sizes=(10, 10), activation='sigmoid',
                          dtype=jnp.float64)

    def solve_u(fc0b, cc, diff):
        params = list(dyn.params)
        params[0] = (params[0][0], fc0b)
        d = NNDynamics(params, dyn.activation, dyn.passthrough,
                       n_state, n_ctrl)
        ctrl = MPC(n_state, n_ctrl, T, jnp.asarray(lb), jnp.asarray(ub),
                   lqr_iter=40 if not diff else 20,
                   exit_unconverged=False, backprop=diff,
                   max_linesearch_iter=1,
                   grad_method=GradMethods.ANALYTIC,
                   slew_rate_penalty=slew)
        _, u, _ = ctrl(jnp.asarray(x_init),
                       QuadCost(jnp.asarray(cc), jnp.asarray(c)), d)
        return u.reshape(-1)

    return dyn, C, c, solve_u, beta


def _check_nn_grads(slew):
    dyn, C, c, solve_u, beta = _nn_problem(slew)
    fc0b = dyn.params[0][1]

    u0 = np.asarray(solve_u(fc0b, C, diff=False))
    on = (np.abs(np.abs(u0) - beta) < 1e-8)
    assert on.any() and (~on).any()

    # FD w.r.t. the first-layer bias (reference tests/test_mpc.py:603-613)
    du_dfc0b_fd = fd_jacobian(
        lambda z: np.asarray(solve_u(jnp.asarray(z), C, diff=False)),
        np.asarray(fc0b), eps=1e-5)

    du_dfc0b = np.asarray(jax.jacrev(
        lambda z: solve_u(z, C, diff=True))(fc0b))
    npt.assert_allclose(du_dfc0b_fd, du_dfc0b, atol=1e-3)


def test_backward_nn_dynamics_param_grads():
    # reference tests/test_mpc.py:560-649
    _check_nn_grads(slew=None)


def test_backward_nn_dynamics_param_grads_slew():
    # reference tests/test_mpc.py:652-744
    _check_nn_grads(slew=1.0)


def test_kkt_backward_pins_matmul_precision():
    """The custom_vjp KKT backward must bind its dot_generals with an
    EXPLICIT precision: a jax.default_matmul_precision context around
    the solve call does not reach the bwd trace (it runs during the
    backward sweep, after the context exits), so without the internal
    pin the backward executes at TPU's bf16 default.  Round-5 hardware
    measurement at 20s/4c T=10: leaked gradients 2.6e-4 (rel) from the
    f64 oracle vs 9e-8 pinned.  This traces the grad on CPU and walks
    the jaxpr: every dot_general in the backward must carry a
    non-default precision."""
    import jax
    import jax.numpy as jnp
    from mpc_tpu import MPCConfig, QuadCost, LinDx, GradMethods
    from mpc_tpu.learning import batched_solve

    ns, nc, T, B = 4, 2, 4, 3
    ntau = ns + nc
    rng = np.random.RandomState(0)
    F = jnp.asarray(np.tile(np.concatenate(
        [np.eye(ns), 0.3 * rng.randn(ns, nc)], 1)[None],
        (T - 1, 1, 1)), jnp.float32)
    C = jnp.asarray(np.eye(ntau), jnp.float32)
    c = jnp.asarray(0.1 * rng.randn(ntau), jnp.float32)
    x0 = jnp.asarray(rng.randn(B, ns), jnp.float32)
    cfg = MPCConfig(n_state=ns, n_ctrl=nc, T=T, lqr_iter=2,
                    grad_method=GradMethods.ANALYTIC, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=True, use_fused='never')

    def loss(cv):
        sol = batched_solve(cfg, x0, QuadCost(C, cv), LinDx(F, None))
        return (sol.u ** 2).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss))(c)

    def walk(jx, out):
        for eqn in jx.eqns:
            if eqn.primitive.name == 'dot_general':
                out.append(eqn.params.get('precision'))
            for v in eqn.params.values():
                if hasattr(v, 'jaxpr'):
                    walk(v.jaxpr, out)
                elif isinstance(v, (list, tuple)):
                    for vi in v:
                        if hasattr(vi, 'jaxpr'):
                            walk(vi.jaxpr, out)
        return out

    precisions = walk(jaxpr.jaxpr, [])
    assert precisions, 'no dot_generals found (trace shape changed?)'
    n_default = sum(1 for p in precisions if p is None)
    assert n_default == 0, (
        f'{n_default}/{len(precisions)} dot_generals bind at DEFAULT '
        '(bf16 on TPU) precision - the KKT backward precision pin '
        '(ops/diff.py make_lqr_fixed_point) leaked')
