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
    """soa_step (lane-component form) matches __call__ for every
    activation (sigmoid goes through the tanh form in the SoA path for
    JVP stability, so it matches to float tolerance, not bitwise)."""
    for act in ('sigmoid', 'relu', 'elu'):
        dx, x0, _ = _problem(act=act)
        xs = tuple(x0[0][i] for i in range(3))
        got = jnp.stack(dx.soa_step(xs, jnp.float32(0.3), dx.soa_params()))
        want = dx(x0[0], jnp.asarray([0.3], jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_soa_sigmoid_jvp_stable_when_saturated():
    """Saturated pre-activations (|v| >> 88) must give finite Jacobians
    in the SoA path - the naive 1/(1+exp(-v)) overflows and its JVP is
    NaN."""
    dx = NNDynamics.init(jax.random.PRNGKey(1), 3, 1, hidden_sizes=(4,),
                         activation='sigmoid', dtype=jnp.float32)
    # scale the first layer so pre-activations saturate hard
    (W0, b0), tail = dx.params[0], dx.params[1:]
    dx = NNDynamics([(W0 * 500.0, b0 - 200.0)] + list(tail),
                    'sigmoid', True, 3, 1)
    xs = (jnp.float32(1.0), jnp.float32(-1.0), jnp.float32(2.0))

    def step(xs_, u_):
        return dx.soa_step(xs_, u_, dx.soa_params())

    _, lin = jax.linearize(step, xs, jnp.float32(0.3))
    for j in range(3):
        col = lin(tuple(jnp.float32(1.0 if i == j else 0.0)
                        for i in range(3)), jnp.float32(0.0))
        assert all(np.isfinite(np.asarray(v)) for v in col), col


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
    """Single-hidden MLPs of any practical width - including the
    reference's default hidden=100 (mpc/dynamics.py:9-13) - are in
    scope via the param-streaming path; DEEP MLPs (no streaming form)
    still hit the 512-scalar tuple cap; absurd widths hit the SMEM
    cap."""
    dx, x0, cost = _problem()
    cfg = _cfg(5)
    assert supports(cfg, cost, dx)
    default = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                              hidden_sizes=(100,))
    assert default.soa_streaming and default.soa_param_count() > 512
    assert supports(cfg, cost, default)
    deep = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                           hidden_sizes=(32, 32))
    assert not deep.soa_streaming and deep.soa_param_count() > 512
    assert not supports(cfg, cost, deep)
    huge = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                           hidden_sizes=(8192,))
    assert not supports(cfg, cost, huge)


def test_stream_step_matches_tuple():
    """soa_stream_step accumulates in the same order as soa_step
    (0 + x == x), so the two match to the last ulp modulo compiler
    rewrites inside the streamed loop (XLA fuses exp(v)-1 -> expm1 for
    elu, a 1-ulp difference); relu/sigmoid are exact here."""
    for act in ('sigmoid', 'relu', 'elu'):
        dx = NNDynamics.init(jax.random.PRNGKey(2), 3, 1,
                             hidden_sizes=(17,), activation=act,
                             dtype=jnp.float32)
        flat = dx.soa_params_flat()
        assert flat.shape[0] == dx.soa_param_count()
        xs = (jnp.float32(0.3), jnp.float32(-1.2), jnp.float32(0.7))
        u = jnp.float32(0.5)
        got = dx.soa_stream_step(xs, u, lambda i: flat[i])
        want = dx.soa_step(xs, u, dx.soa_params())
        for g, w in zip(got, want):
            np.testing.assert_allclose(float(g), float(w), rtol=3e-7,
                                       atol=1e-7)


def test_stream_jac_matches_linearize():
    """soa_stream_jac (the fused analytic Jacobian) matches
    jax.linearize of the tuple step - the two in-kernel Jacobian
    sources the dispatch can pick between."""
    for act in ('sigmoid', 'relu', 'elu'):
        dx = NNDynamics.init(jax.random.PRNGKey(3), 3, 2,
                             hidden_sizes=(23,), activation=act,
                             dtype=jnp.float32)
        flat = dx.soa_params_flat()
        xs = (jnp.float32(0.3), jnp.float32(-1.2), jnp.float32(0.7))
        u = (jnp.float32(0.5), jnp.float32(-0.4))
        J = dx.soa_stream_jac(xs, u, lambda i: flat[i])

        def step(xs_, u_):
            return dx.soa_step(xs_, u_, dx.soa_params())

        _, lin = jax.linearize(step, xs, u)
        for j in range(3):
            col = lin(tuple(jnp.float32(1.0 if i == j else 0.0)
                            for i in range(3)),
                      (jnp.float32(0.0),) * 2)
            for i in range(3):
                np.testing.assert_allclose(float(J[i][j]), float(col[i]),
                                           atol=1e-6)
        for j in range(2):
            col = lin((jnp.float32(0.0),) * 3,
                      tuple(jnp.float32(1.0 if i == j else 0.0)
                            for i in range(2)))
            for i in range(3):
                np.testing.assert_allclose(float(J[i][3 + j]),
                                           float(col[i]), atol=1e-6)


def test_stream_step_multi_matches_single():
    """soa_stream_step_multi (one weight sweep for several points, the
    fused multi-alpha line search's inner step) is BITWISE identical to
    independent soa_stream_step calls: same per-point accumulation
    order, only the SMEM read schedule is shared."""
    for act in ('sigmoid', 'relu', 'elu'):
        dx = NNDynamics.init(jax.random.PRNGKey(5), 3, 1,
                             hidden_sizes=(100,), activation=act,
                             dtype=jnp.float32)
        flat = dx.soa_params_flat()
        rng = np.random.RandomState(7)
        pts = []
        for _ in range(4):
            xs = tuple(jnp.float32(v) for v in rng.randn(3))
            u = jnp.float32(rng.randn())
            pts.append((xs, u))
        multi = jax.jit(lambda: dx.soa_stream_step_multi(
            pts, lambda i: flat[i]))()
        for p, (xs, u) in enumerate(pts):
            single = jax.jit(lambda xs=xs, u=u: dx.soa_stream_step(
                xs, u, lambda i: flat[i]))()
            for g, w in zip(multi[p], single):
                np.testing.assert_array_equal(np.float32(g),
                                              np.float32(w))


def test_fused_nn_hidden100_streaming():
    """The reference's default hidden=100 MLP runs IN-KERNEL through
    the param-streaming path; interpret-mode equivalence vs the jnp
    path (reference default: mpc/dynamics.py:9-13)."""
    T = 5
    dx, x0, cost = _problem(T=T, hidden=(100,))
    assert supports(_cfg(T), cost, dx)
    lb = jnp.full((T, 8, 1), -1.0, jnp.float32)
    _compare(_cfg(T), x0, cost, dx, lb, -lb)


def test_fused_nn_hidden100_slew_streaming():
    """Slew augmentation composes with the streaming path (_SlewSoA
    passthrough rows in the analytic Jacobian)."""
    T = 4
    dx, x0, cost = _problem(T=T, hidden=(100,))
    lb = jnp.full((T, 8, 1), -1.0, jnp.float32)
    _compare(_cfg(T, slew_rate_penalty=0.5), x0, cost, dx, lb, -lb)


def test_combined_param_budget_gate():
    """The kernel unrolls dynamics + cost scalars from one SMEM row, so
    the 512 budget applies to their SUM for non-streaming (tuple-path)
    dynamics; a streaming-capable dynamics escapes the shared budget
    (its weights never unroll) but the cost alone must still fit."""

    class FatCost:
        def __init__(self, n):
            self.n = n

        def __call__(self, tau):
            return jnp.sum(tau ** 2)

        def soa_params(self):
            return tuple(jnp.float32(0.0) for _ in range(self.n))

        def soa_cost(self, xs, us, params):
            return sum(v * v for v in xs) + us * us

    # deep MLP: no streaming form -> combined tuple budget applies
    deep = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                           hidden_sizes=(16, 8))
    assert not deep.soa_streaming and deep.soa_param_count() <= 512
    room = 512 - deep.soa_param_count()
    assert supports(_cfg(5), FatCost(room), deep)
    assert not supports(_cfg(5), FatCost(room + 1), deep)

    # streaming MLP: dynamics escape the budget, cost alone is capped
    wide = NNDynamics.init(jax.random.PRNGKey(0), 3, 1,
                           hidden_sizes=(100,))
    assert supports(_cfg(5), FatCost(300), wide)
    assert not supports(_cfg(5), FatCost(513), wide)


def test_long_kernel_vmem_gate_at_short_T():
    """Param-heavy SoA models route through the fori-loop kernel even
    at T <= 128, so its VMEM budget must gate dispatch there too
    (ns=8, nc=4 at T=64 exceeds it)."""
    import dataclasses
    ns, nc = 8, 4
    dx = NNDynamics.init(jax.random.PRNGKey(0), ns, nc, hidden_sizes=(16,))
    assert 64 < dx.soa_param_count() <= 512
    C = jnp.eye(ns + nc, dtype=jnp.float32)
    c = jnp.zeros(ns + nc, jnp.float32)
    cfg = dataclasses.replace(_cfg(64), n_state=ns, n_ctrl=nc)
    assert not supports(cfg, QuadCost(C, c), dx)
    # the same model at small T stays on the unrolled kernel? no - the
    # param-count routing is T-independent, but a short horizon fits
    cfg2 = dataclasses.replace(_cfg(8), n_state=ns, n_ctrl=nc)
    assert supports(cfg2, QuadCost(C, c), dx)
