"""Observability parity with the reference (round-2 verdict item 8):
initial-cost print, table_log row, and the unconverged warning
(reference mpc/mpc.py:238-243, 287-297, 326-328)."""

import numpy as np
import numpy.testing as npt

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPC, QuadCost
from mpc_tpu.models import PendulumDx


def _problem(B=4, T=6):
    dx = PendulumDx()
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = jnp.asarray(np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1))
    q, p = dx.get_true_obj()
    return dx, x0, jnp.diag(q), jnp.asarray(p)


def test_verbose_prints_initial_cost_and_table(capsys):
    dx, x0, C, c = _problem()
    ctrl = MPC(3, 1, 6, u_lower=-2.0, u_upper=2.0, lqr_iter=2,
               grad_method=GradMethods.AUTO_DIFF, eps=0.0, verbose=1,
               exit_unconverged=False, detach_unconverged=False,
               backprop=False, max_linesearch_iter=2)
    ctrl.solve(x0, QuadCost(C, c), dx)
    out = capsys.readouterr().out
    assert 'Initial mean(cost):' in out            # mpc/mpc.py:238-243
    assert 'mean(cost)' in out                     # table_log header
    assert '||full_du||_max' in out
    assert 'total_qp_iters' in out


def test_unconverged_warning(capsys):
    """verbose >= 0 (the default) warns when detaching unconverged
    examples instead of raising (reference mpc/mpc.py:326-328)."""
    dx, x0, C, c = _problem()
    ctrl = MPC(3, 1, 6, u_lower=-2.0, u_upper=2.0, lqr_iter=1,
               grad_method=GradMethods.AUTO_DIFF, eps=1e-10,
               exit_unconverged=False, detach_unconverged=True,
               backprop=False, max_linesearch_iter=2, use_fused='never')
    ctrl(x0, QuadCost(C, c), dx)
    out = capsys.readouterr().out
    assert 'LQR Warning' in out

    # verbose=-1 is silent (reference semantics)
    ctrl2 = MPC(3, 1, 6, u_lower=-2.0, u_upper=2.0, lqr_iter=1,
                grad_method=GradMethods.AUTO_DIFF, eps=1e-10, verbose=-1,
                exit_unconverged=False, detach_unconverged=True,
                backprop=False, max_linesearch_iter=2, use_fused='never')
    ctrl2(x0, QuadCost(C, c), dx)
    assert 'LQR Warning' not in capsys.readouterr().out


def test_slew_rate_cost_matches_reference_semantics():
    """SlewRateCost(tau_aug) == cost(true_tau) + 0.5 tau^T slew_C tau
    (reference mpc/mpc.py:36-52)."""
    from mpc_tpu import SlewRateCost

    rng = np.random.RandomState(1)
    ns, nc = 3, 2
    naug = ns + 2 * nc
    slew_C = rng.randn(naug, naug)
    slew_C = slew_C + slew_C.T

    def base_cost(tau):
        return jnp.sum(tau ** 2) + jnp.sum(tau)

    src = SlewRateCost(base_cost, jnp.asarray(slew_C), ns, nc)
    tau = rng.randn(naug)
    want = (float(base_cost(jnp.asarray(tau[nc:])))
            + 0.5 * tau @ slew_C @ tau)
    got = float(src(jnp.asarray(tau)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pod_mesh_single_process():
    """make_pod_mesh on one process: (1, n_local) grid; pod_batch_spec
    shards a batch over every device."""
    import jax

    from mpc_tpu.parallel import make_pod_mesh, pod_batch_spec

    mesh = make_pod_mesh()
    n = len(jax.devices())
    assert mesh.devices.shape == (1, n)
    assert mesh.axis_names == ('hosts', 'chips')
    sh = pod_batch_spec(mesh)
    x = jax.device_put(jnp.arange(4 * n, dtype=jnp.float32), sh)
    assert len(x.addressable_shards) == n


def test_debug_helpers():
    """NaN-debugging layer (SURVEY section 5 sanitizer analog)."""
    import jax
    import pytest

    from mpc_tpu import Solution
    from mpc_tpu.utils import assert_finite, finite_mask, nan_checks

    B, T = 3, 4
    ok = Solution(
        x=jnp.zeros((T, B, 3)), u=jnp.zeros((T, B, 1)),
        costs=jnp.zeros(B), full_du_norm=jnp.zeros(B),
        n_iter=jnp.zeros(B, jnp.int32), n_qp_iter=jnp.zeros(B, jnp.int32),
        converged=jnp.ones(B, bool), alpha=jnp.ones(B))
    m = finite_mask(ok)
    assert m.shape == (B,) and bool(jnp.all(m))

    bad = ok._replace(u=ok.u.at[1, 2, 0].set(jnp.nan))
    m2 = finite_mask(bad)
    assert list(np.asarray(m2)) == [True, True, False]
    # finite_mask is jittable
    m3 = jax.jit(finite_mask)(bad)
    assert list(np.asarray(m3)) == [True, True, False]

    with pytest.raises(FloatingPointError, match='u'):
        assert_finite(bad, 'solution')
    assert_finite(ok)

    with pytest.raises(FloatingPointError):
        with nan_checks():
            jax.jit(lambda a: a / a)(jnp.zeros(3)).block_until_ready()
    assert not jax.config.jax_debug_nans


def test_checkpoint_roundtrip(tmp_path):
    """save/load a TrainState (params + adam state + step) through
    orbax; restored pytree must match bitwise and keep dtypes."""
    import optax
    from mpc_tpu.learning import TrainState
    from mpc_tpu.utils import load_checkpoint, save_checkpoint

    theta = {'q_log': jnp.asarray([0.1, -0.2, 0.3, 0.0], jnp.float32),
             'p': jnp.asarray([-1.0, 0.0, 0.0, 0.0], jnp.float32)}
    opt = optax.adam(1e-2)
    state = TrainState(theta, opt.init(theta), jnp.asarray(7))

    path = save_checkpoint(str(tmp_path / 'ckpt'), state)
    like = TrainState(
        jax.tree_util.tree_map(jnp.zeros_like, theta),
        opt.init(jax.tree_util.tree_map(jnp.zeros_like, theta)),
        jnp.asarray(0))
    restored = load_checkpoint(path, like)

    assert isinstance(restored, TrainState)
    assert int(restored.step) == 7
    for k in theta:
        got = restored.theta[k]
        assert got.dtype == theta[k].dtype
        npt.assert_array_equal(np.asarray(got), np.asarray(theta[k]))
    flat_a = jax.tree_util.tree_leaves(state.opt_state)
    flat_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        npt.assert_array_equal(np.asarray(a), np.asarray(b))
