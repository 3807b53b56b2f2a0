"""Learned (NNDynamics) models inside the fused kernel.

NNDynamics gained the SoA protocol: weights ride SMEM as scalars, each
neuron's activation is one lane register, and the kernel extracts
Jacobians with in-kernel jax.linearize (replacing the reference's
hand-rolled grad_input reverse product, mpc/dynamics.py:81-130).
Comparisons exclude alpha: at f32, near-equal line-search costs can
flip the accepted alpha between the paths (documented tie-breaking;
the trajectories still agree to ~1e-4).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import NNDynamics
from mpc_tpu.ops.fused import fused_batched_solve, supports


def _problem(B=8, T=5, ns=3, nc=1, act='sigmoid', hidden=(8,)):
    dx = NNDynamics.init(jax.random.PRNGKey(0), ns, nc,
                         hidden_sizes=hidden, activation=act,
                         dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, ns).astype(np.float32))
    C = jnp.broadcast_to(jnp.eye(ns + nc, dtype=jnp.float32),
                         (T, ns + nc, ns + nc))
    c = jnp.zeros((T, ns + nc), jnp.float32)
    return dx, x0, QuadCost(C, c)


def _cfg(T, **kw):
    base = dict(n_state=3, n_ctrl=1, T=T, lqr_iter=2,
                grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False, linesearch_decay=0.2,
                max_linesearch_iter=2, use_fused='never')
    base.update(kw)
    return MPCConfig(**base)


def _compare(cfg, x0, cost, dx, lb, ub, atol=5e-4):
    ref = batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=ub)
    fus = fused_batched_solve(cfg, x0, cost, dx, u_lower=lb, u_upper=ub,
                              interpret=True)
    for f in ('u', 'x', 'costs'):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(fus, f)), atol=atol)


def test_soa_step_matches_call():
    """soa_step (lane-component form) is bit-exact vs __call__ for every
    activation."""
    for act in ('sigmoid', 'relu', 'elu'):
        dx, x0, _ = _problem(act=act)
        xs = tuple(x0[0][i] for i in range(3))
        got = jnp.stack(dx.soa_step(xs, jnp.float32(0.3), dx.soa_params()))
        want = dx(x0[0], jnp.asarray([0.3], jnp.float32))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_nn_bounded():
    """hidden=8 (67 params) routes through the fori-loop kernel
    (>_UNROLL_PARAM_LIMIT scalars)."""
    T = 5
    dx, x0, cost = _problem(T=T)
    lb = jnp.full((T, 8, 1), -1.0, jnp.float32)
    _compare(_cfg(T), x0, cost, dx, lb, -lb)


def test_fused_nn_tiny_short_kernel():
    """hidden=4 (35 params) stays on the unrolled short kernel."""
    T = 4
    dx, x0, cost = _problem(T=T, hidden=(4,))
    assert len(dx.soa_params()) <= 64
    lb = jnp.full((T, 8, 1), -1.0, jnp.float32)
    _compare(_cfg(T), x0, cost, dx, lb, -lb)


def test_fused_nn_unbounded_relu():
    T = 4
    dx, x0, cost = _problem(T=T, act='relu')
    _compare(_cfg(T), x0, cost, dx, None, None)


def test_fused_nn_slew():
    """Slew-rate penalty with NN dynamics: the _SlewSoA passthrough
    wrapper composes with the MLP SoA step."""
    T = 4
    dx, x0, cost = _problem(T=T)
    lb = jnp.full((T, 8, 1), -1.0, jnp.float32)
    cfg = _cfg(T, slew_rate_penalty=0.5)
    _compare(cfg, x0, cost, dx, lb, -lb)


def test_param_budget_gate():
    """The reference's default hidden=100 MLP (>512 scalars) falls back
    to the jnp path; small MLPs are in scope."""
    dx, x0, cost = _problem()
    cfg = _cfg(5)
    assert supports(cfg, cost, dx)
    big = NNDynamics.init(jax.random.PRNGKey(0), 3, 1, hidden_sizes=(100,))
    assert not supports(cfg, cost, big)
