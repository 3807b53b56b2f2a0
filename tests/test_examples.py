"""Smoke tests for the examples layer (reference examples/ + env_dx/control.py).

Runs the shared receding-horizon step (examples/control.py) for both
environments on tiny shapes; checks the loop advances the state and that
the pendulum makes progress toward upright under MPC.
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'examples'))

from control import build_solver, make_env  # noqa: E402


def _run(env_name, steps, T, lqr_iter, n_batch=2, seed=0):
    rng = np.random.RandomState(seed)
    dx, init_state, _ = make_env(env_name)
    dtype = jnp.asarray(dx.params).dtype      # f64 under jax_enable_x64
    state = jnp.asarray(init_state(rng, n_batch), dtype)
    u_warm = jnp.zeros((T, n_batch, dx.n_ctrl), dtype)
    step = build_solver(dx, T, n_batch, lqr_iter, dtype=dtype)
    states = [state]
    for _ in range(steps):
        state, u_warm, act, costs = step(state, u_warm)
        states.append(state)
    return np.asarray(jnp.stack(states)), np.asarray(costs)


def test_control_pendulum_smoke():
    states, costs = _run('pendulum', steps=8, T=8, lqr_iter=3)
    assert np.all(np.isfinite(states))
    assert np.all(np.isfinite(costs))
    # the state must actually evolve
    assert np.max(np.abs(states[-1] - states[0])) > 1e-3


def test_control_cartpole_smoke():
    states, costs = _run('cartpole', steps=4, T=6, lqr_iter=3)
    assert np.all(np.isfinite(states))
    assert np.all(np.isfinite(costs))
    assert np.max(np.abs(states[-1] - states[0])) > 1e-4


def test_pod_imitation_smoke(tmp_path):
    """examples/pod_imitation.py end-to-end on the local (virtual)
    mesh: loss decreases, checkpoint round-trips."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'examples', 'pod_imitation.py')
    ck = str(tmp_path / 'ck')
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, script, '--batch', '32', '--horizon', '6',
         '--steps', '6', '--checkpoint', ck, '--platform', 'cpu'],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    losses = [float(line.split()[-1]) for line in out.stdout.splitlines()
              if line.strip().startswith('step')]
    assert len(losses) >= 2 and losses[-1] < losses[0], out.stdout
    assert 'saved TrainState' in out.stdout
    # resume from the checkpoint
    out2 = subprocess.run(
        [sys.executable, script, '--batch', '32', '--horizon', '6',
         '--steps', '2', '--resume', ck, '--platform', 'cpu'],
        capture_output=True, text=True, env=env, timeout=600)
    assert out2.returncode == 0, out2.stdout + out2.stderr
    assert 'resumed from' in out2.stdout
