"""Model library: environment dynamics, learnable dynamics models, and
non-quadratic cost models."""

from .dynamics import AffineDynamics, CtrlPassthroughDynamics, NNDynamics
from .pendulum import PendulumDx
from .cartpole import CartpoleDx
from .cost import PseudoHuberCost

__all__ = ['NNDynamics', 'AffineDynamics', 'CtrlPassthroughDynamics',
           'PendulumDx', 'CartpoleDx', 'PseudoHuberCost']


def _run_example(script):
    """Run a repo example script (the env modules' ``__main__`` demos,
    mirroring the reference env_dx mains).  The examples ship in the
    repository, not the installed package - fail with a pointer, not a
    FileNotFoundError from runpy."""
    import os
    import runpy
    import sys
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '..', '..', 'examples', script)
    if not os.path.exists(path):
        sys.exit(f'examples/{script} not found (the demo scripts ship '
                 'in the source repository, not the installed package); '
                 'clone the repo and run examples/' + script)
    runpy.run_path(path, run_name='__main__')
