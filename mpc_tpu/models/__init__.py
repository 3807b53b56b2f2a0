"""Model library: environment dynamics, learnable dynamics models, and
non-quadratic cost models."""

from .dynamics import AffineDynamics, CtrlPassthroughDynamics, NNDynamics
from .pendulum import PendulumDx
from .cartpole import CartpoleDx
from .cost import PseudoHuberCost

__all__ = ['NNDynamics', 'AffineDynamics', 'CtrlPassthroughDynamics',
           'PendulumDx', 'CartpoleDx', 'PseudoHuberCost']
