"""The three example notebooks (the reference ships them as .ipynb:
examples/Time Varying Linear-Quadratic Control.ipynb, Pendulum
Control.ipynb, Cartpole Control.ipynb) must execute end-to-end.

Runs each with fast env-gated settings (MPC_NB_*) in a fresh kernel
pinned to cpu; content parity with the reference notebooks is covered
by the example scripts' tests."""
import os
import subprocess
import sys

import pytest

NB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')

NOTEBOOKS = ['Time Varying Linear-Quadratic Control.ipynb',
             'Pendulum Control.ipynb',
             'Cartpole Control.ipynb']


@pytest.mark.parametrize('name', NOTEBOOKS)
def test_notebook_executes(name):
    pytest.importorskip('nbclient')
    env = dict(os.environ, MPC_NB_PLATFORM='cpu', MPC_NB_STEPS='2',
               MPC_NB_LQR_ITER='2', MPC_NB_BATCH='2')
    out = subprocess.run(
        [sys.executable, '-m', 'jupyter', 'nbconvert', '--to', 'notebook',
         '--execute', '--stdout', os.path.join(NB_DIR, name)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=NB_DIR)
    assert out.returncode == 0, out.stderr[-3000:]
