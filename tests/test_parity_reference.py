"""Parity tests against the PyTorch reference implementation.

The reference (locuslab/mpc.pytorch) is mounted read-only at
/root/reference and torch (CPU) is available, so the strongest oracle is
the reference itself: identical problems are solved by both frameworks
and control sequences are compared within the BASELINE tolerance
(max-abs u error <= 1e-3, float64).
"""

import sys

import numpy as np
import numpy.random as npr
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference')

from mpc import mpc as ref_mpc                       # noqa: E402
from mpc.mpc import QuadCost as RefQuadCost          # noqa: E402
from mpc.mpc import LinDx as RefLinDx                # noqa: E402
from mpc.mpc import GradMethods as RefGradMethods    # noqa: E402

from mpc_tpu import MPC, QuadCost, LinDx, GradMethods  # noqa: E402
from mpc_tpu.models import PendulumDx                  # noqa: E402


def _tvlqr_problem(seed=1, n_batch=4, n_state=3, n_ctrl=4, T=5):
    npr.seed(seed)
    n_sc = n_state + n_ctrl
    C = npr.randn(T, n_batch, n_sc, n_sc)
    C = np.matmul(C.transpose(0, 1, 3, 2), C)
    c = npr.randn(T, n_batch, n_sc)
    alpha = 0.2
    R = np.tile(np.eye(n_state) + alpha * npr.randn(n_state, n_state),
                (T - 1, n_batch, 1, 1))
    S = np.tile(npr.randn(n_state, n_ctrl), (T - 1, n_batch, 1, 1))
    F = np.concatenate((R, S), axis=3)
    f = np.tile(npr.randn(n_state), (T - 1, n_batch, 1))
    x_init = npr.randn(n_batch, n_state)
    u_lower = -npr.random((T, n_batch, n_ctrl))
    u_upper = npr.random((T, n_batch, n_ctrl))
    return C, c, F, f, x_init, u_lower, u_upper


def test_parity_tvlqr_bounded():
    n_batch, n_state, n_ctrl, T = 4, 3, 4, 5
    C, c, F, f, x_init, lb, ub = _tvlqr_problem(
        1, n_batch, n_state, n_ctrl, T)

    tt = lambda a: torch.tensor(a, dtype=torch.float64)
    x_ref, u_ref, _ = ref_mpc.MPC(
        n_state, n_ctrl, T, tt(lb), tt(ub),
        lqr_iter=20, backprop=False, exit_unconverged=False,
        verbose=-1)(
        tt(x_init), RefQuadCost(tt(C), tt(c)), RefLinDx(tt(F), tt(f)))

    x, u, _ = MPC(n_state, n_ctrl, T, jnp.asarray(lb), jnp.asarray(ub),
                  lqr_iter=20, backprop=False, exit_unconverged=False)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)),
        LinDx(jnp.asarray(F), jnp.asarray(f)))

    err_u = np.abs(u_ref.numpy() - np.asarray(u)).max()
    err_x = np.abs(x_ref.numpy() - np.asarray(x)).max()
    assert err_u <= 1e-3, f'control parity {err_u:.2e} > 1e-3'
    assert err_x <= 1e-3, f'state parity {err_x:.2e} > 1e-3'


def test_parity_tvlqr_unbounded():
    n_batch, n_state, n_ctrl, T = 4, 3, 4, 5
    C, c, F, f, x_init, _, _ = _tvlqr_problem(2, n_batch, n_state,
                                              n_ctrl, T)
    tt = lambda a: torch.tensor(a, dtype=torch.float64)
    x_ref, u_ref, _ = ref_mpc.MPC(
        n_state, n_ctrl, T, None, None,
        lqr_iter=10, backprop=False, exit_unconverged=False,
        verbose=-1)(
        tt(x_init), RefQuadCost(tt(C), tt(c)), RefLinDx(tt(F), tt(f)))
    x, u, _ = MPC(n_state, n_ctrl, T, None, None,
                  lqr_iter=10, backprop=False, exit_unconverged=False)(
        jnp.asarray(x_init), QuadCost(jnp.asarray(C), jnp.asarray(c)),
        LinDx(jnp.asarray(F), jnp.asarray(f)))
    npt.assert_allclose(u_ref.numpy(), np.asarray(u), atol=1e-3)


class _TorchPendulum(torch.nn.Module):
    """The reference pendulum forward (mpc/env_dx/pendulum.py:49-84)
    re-stated for the parity test (gym-free)."""

    def __init__(self):
        super().__init__()
        self.params = torch.tensor([10., 1., 1.], dtype=torch.float64)

    def forward(self, x, u):
        g, m, l = torch.unbind(self.params)
        dt = 0.05
        u = torch.clamp(u, -2., 2.)[:, 0]
        cos_th, sin_th, dth = torch.unbind(x, dim=1)
        th = torch.atan2(sin_th, cos_th)
        newdth = dth + dt * (-3. * g / (2. * l) * (-sin_th)
                             + 3. * u / (m * l ** 2))
        newth = th + newdth * dt
        return torch.stack(
            (torch.cos(newth), torch.sin(newth), newdth), dim=1)


def test_parity_pendulum_model_step():
    """Dynamics parity: one step of our PendulumDx equals the reference's."""
    dx = PendulumDx()
    tp = _TorchPendulum()
    npr.seed(3)
    x = npr.randn(16, 3)
    u = npr.randn(16, 1)
    ours = np.asarray(dx(jnp.asarray(x), jnp.asarray(u)))
    theirs = tp(torch.tensor(x), torch.tensor(u)).numpy()
    npt.assert_allclose(ours, theirs, atol=1e-12)


def test_parity_pendulum_solve():
    """Full solve parity on the pendulum swing-up (BASELINE config 2
    shrunk): max-abs u error <= 1e-3 at the same horizon and iteration
    budget."""
    n_batch, T = 4, 15
    dx = PendulumDx()
    tp = _TorchPendulum()

    npr.seed(4)
    th = np.pi * (2 * npr.random(n_batch) - 1) * 0.9
    x0 = np.stack([np.cos(th), np.sin(th), np.zeros(n_batch)], axis=1)

    q, p = dx.get_true_obj()
    Q = np.diag(np.asarray(q))
    pn = np.asarray(p)

    tt = lambda a: torch.tensor(a, dtype=torch.float64)
    x_ref, u_ref, _ = ref_mpc.MPC(
        3, 1, T, -2.0, 2.0,
        lqr_iter=10, backprop=False, exit_unconverged=False,
        detach_unconverged=False, verbose=-1, n_batch=n_batch,
        eps=1e-4,
        grad_method=RefGradMethods.AUTO_DIFF,
        linesearch_decay=0.2, max_linesearch_iter=5)(
        tt(x0), RefQuadCost(tt(Q), tt(pn)), tp.double())

    x, u, _ = MPC(3, 1, T, -2.0, 2.0,
                  lqr_iter=10, backprop=False, exit_unconverged=False,
                  detach_unconverged=False, n_batch=n_batch,
                  eps=1e-4,
                  grad_method=GradMethods.AUTO_DIFF,
                  linesearch_decay=0.2, max_linesearch_iter=5)(
        jnp.asarray(x0), QuadCost(jnp.asarray(Q), jnp.asarray(pn)), dx)

    err = np.abs(u_ref.detach().numpy() - np.asarray(u)).max()
    assert err <= 1e-3, f'pendulum control parity {err:.2e} > 1e-3'


class _TorchCartpole(torch.nn.Module):
    """The reference cartpole forward (mpc/env_dx/cartpole.py:63-96)
    re-stated for the parity test (gym-free)."""

    def __init__(self):
        super().__init__()
        self.params = torch.tensor([9.8, 1.0, 0.1, 0.5],
                                   dtype=torch.float64)
        self.force_mag = 100.
        self.dt = 0.05

    def forward(self, state, u):
        gravity, masscart, masspole, length = torch.unbind(self.params)
        total_mass = masspole + masscart
        polemass_length = masspole * length
        u = torch.clamp(u[:, 0], -self.force_mag, self.force_mag)
        x, dx, cos_th, sin_th, dth = torch.unbind(state, dim=1)
        th = torch.atan2(sin_th, cos_th)
        cart_in = (u + polemass_length * dth ** 2 * sin_th) / total_mass
        th_acc = (gravity * sin_th - cos_th * cart_in) / \
            (length * (4. / 3. - masspole * cos_th ** 2 / total_mass))
        xacc = cart_in - polemass_length * th_acc * cos_th / total_mass
        x = x + self.dt * dx
        dx = dx + self.dt * xacc
        th = th + self.dt * dth
        dth = dth + self.dt * th_acc
        return torch.stack((x, dx, torch.cos(th), torch.sin(th), dth), 1)


def test_parity_cartpole_model_step():
    """Dynamics parity: one step of our CartpoleDx equals the
    reference's (mpc/env_dx/cartpole.py:63-96)."""
    from mpc_tpu.models import CartpoleDx

    dx = CartpoleDx()
    tc = _TorchCartpole()
    npr.seed(5)
    th = np.pi * (2 * npr.random(16) - 1)
    x = np.stack([0.5 * npr.randn(16), 0.5 * npr.randn(16),
                  np.cos(th), np.sin(th), 0.5 * npr.randn(16)], axis=1)
    u = 20.0 * npr.randn(16, 1)
    ours = np.asarray(dx(jnp.asarray(x), jnp.asarray(u)))
    theirs = tc(torch.tensor(x), torch.tensor(u)).numpy()
    npt.assert_allclose(ours, theirs, atol=1e-12)


def test_parity_cartpole_solve():
    """Full solve parity on the cartpole balance task (BASELINE config 3
    shrunk): max-abs u error <= 1e-3 at the same horizon and iteration
    budget."""
    from mpc_tpu.models import CartpoleDx

    n_batch, T = 3, 10
    dx = CartpoleDx()
    tc = _TorchCartpole()

    npr.seed(6)
    th = 0.5 * (2 * npr.random(n_batch) - 1)
    x0 = np.stack([0.2 * npr.randn(n_batch), np.zeros(n_batch),
                   np.cos(th), np.sin(th), np.zeros(n_batch)], axis=1)

    q, p = dx.get_true_obj()
    Q = np.diag(np.asarray(q))
    pn = np.asarray(p)

    tt = lambda a: torch.tensor(a, dtype=torch.float64)
    _, u_ref, _ = ref_mpc.MPC(
        5, 1, T, -100.0, 100.0,
        lqr_iter=8, backprop=False, exit_unconverged=False,
        detach_unconverged=False, verbose=-1, n_batch=n_batch,
        eps=1e-4,
        grad_method=RefGradMethods.AUTO_DIFF,
        linesearch_decay=0.5, max_linesearch_iter=2)(
        tt(x0), RefQuadCost(tt(Q), tt(pn)), tc.double())

    _, u, _ = MPC(5, 1, T, -100.0, 100.0,
                  lqr_iter=8, backprop=False, exit_unconverged=False,
                  detach_unconverged=False, n_batch=n_batch,
                  eps=1e-4,
                  grad_method=GradMethods.AUTO_DIFF,
                  linesearch_decay=0.5, max_linesearch_iter=2)(
        jnp.asarray(x0), QuadCost(jnp.asarray(Q), jnp.asarray(pn)), dx)

    err = np.abs(u_ref.detach().numpy() - np.asarray(u)).max()
    assert err <= 1e-3, f'cartpole control parity {err:.2e} > 1e-3'


class _RefTorchPendulum:
    """The reference's pendulum physics as a torch module
    (mpc/env_dx/pendulum.py:49-84, simple parameterization)."""

    def __new__(cls):
        class M(torch.nn.Module):
            def forward(self, x, u):
                g, m, l = 10., 1., 1.
                dt = 0.05
                u = torch.clamp(u, -2., 2.)[:, 0]
                cos_th, sin_th, dth = torch.unbind(x, dim=1)
                newdth = dth + dt * (-3. * g / (2. * l) * (-sin_th)
                                     + 3. * u / (m * l ** 2))
                newth = torch.atan2(sin_th, cos_th) + newdth * dt
                return torch.stack(
                    (torch.cos(newth), torch.sin(newth), newdth), dim=1)
        return M().double()


def test_parity_pendulum_nonlinear():
    """Nonlinear box-constrained iLQR parity on the pendulum swing-up:
    the iterates must track the reference exactly (f64), INCLUDING at
    bang-bang (saturated) controls.  Regression test for the clamp
    boundary-gradient convention: jnp.clip's min/max JVP gives 0.5 at
    exact ties while torch.clamp gives 1, which halves the control
    Jacobian at saturation and sends the iterates on a different path
    (hard_clip in ops/math.py restores torch semantics)."""
    from mpc_tpu.learning import batched_solve
    from mpc_tpu.types import MPCConfig

    B, T = 8, 15
    npr.seed(11)
    th = np.pi * (2 * npr.rand(B) - 1)
    x0 = np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1)

    tt = lambda a: torch.tensor(a, dtype=torch.float64)
    Q = torch.diag(tt(np.array([1., 1., 0.1, 0.001])))
    p = tt(np.array([-1., 0., 0., 0.]))

    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float64))
    q_j, p_j = dx.get_true_obj()

    for lqr_iter in (2, 5):
        ctrl = ref_mpc.MPC(
            3, 1, T, -2.0, 2.0, lqr_iter=lqr_iter, n_batch=B,
            backprop=False, exit_unconverged=False,
            detach_unconverged=False, verbose=-1, eps=0.0,
            grad_method=RefGradMethods.AUTO_DIFF,
            linesearch_decay=0.2, max_linesearch_iter=5)
        _, u_ref, _ = ctrl(tt(x0), RefQuadCost(Q, p), _RefTorchPendulum())

        cfg = MPCConfig(
            n_state=3, n_ctrl=1, T=T, lqr_iter=lqr_iter,
            grad_method=GradMethods.AUTO_DIFF, eps=0.0,
            exit_unconverged=False, detach_unconverged=False,
            backprop=False, linesearch_decay=0.2, max_linesearch_iter=5,
            use_fused='never')
        sol = batched_solve(cfg, jnp.asarray(x0),
                            QuadCost(jnp.diag(q_j), p_j), dx,
                            u_lower=-2.0, u_upper=2.0)
        npt.assert_allclose(np.asarray(sol.u),
                            u_ref.detach().numpy(), atol=1e-6)


def test_parity_pendulum_f32_bound():
    """Pins the documented float32 parity bound vs the f64 reference
    (BASELINE.md): f32 switch-step flips are isolated - the bulk of the
    controls match to ~1e-5, at most a small tail exceeds 1e-3, and
    nothing exceeds 5e-3.  (The unconditional <=1e-3 target holds in
    f64 - the tests above; this pins the f32 behavior explicitly.)"""
    n_batch, T = 32, 20
    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float32))
    tp = _RefTorchPendulum()

    npr.seed(7)
    th = np.pi * (2 * npr.random(n_batch) - 1)
    x0 = np.stack([np.cos(th), np.sin(th), np.zeros(n_batch)], axis=1)
    q, p = dx.get_true_obj()
    Q = np.diag(np.asarray(q, np.float64))
    pn = np.asarray(p, np.float64)

    tt = lambda a: torch.tensor(a, dtype=torch.float64)
    _, u_ref, _ = ref_mpc.MPC(
        3, 1, T, -2.0, 2.0,
        lqr_iter=10, backprop=False, exit_unconverged=False,
        detach_unconverged=False, verbose=-1, n_batch=n_batch, eps=0.0,
        grad_method=RefGradMethods.AUTO_DIFF,
        linesearch_decay=0.2, max_linesearch_iter=5)(
        tt(x0), RefQuadCost(tt(Q), tt(pn)), tp)

    _, u, _ = MPC(3, 1, T, -2.0, 2.0,
                  lqr_iter=10, backprop=False, exit_unconverged=False,
                  detach_unconverged=False, n_batch=n_batch, eps=0.0,
                  grad_method=GradMethods.AUTO_DIFF,
                  linesearch_decay=0.2, max_linesearch_iter=5)(
        jnp.asarray(x0, jnp.float32),
        QuadCost(jnp.asarray(Q, jnp.float32), jnp.asarray(pn, jnp.float32)),
        dx)

    err = np.abs(u_ref.detach().numpy() - np.asarray(u, np.float64))
    assert np.median(err) <= 1e-4, f'f32 bulk parity {np.median(err):.2e}'
    assert np.mean(err > 1e-3) <= 0.02, \
        f'f32 tail fraction {np.mean(err > 1e-3):.4f} > 2%'
    assert err.max() <= 5e-3, f'f32 worst-case {err.max():.2e} > 5e-3'
