"""Model library: environment dynamics and learnable dynamics models."""

from .dynamics import AffineDynamics, CtrlPassthroughDynamics, NNDynamics
from .pendulum import PendulumDx
from .cartpole import CartpoleDx

__all__ = ['NNDynamics', 'AffineDynamics', 'CtrlPassthroughDynamics',
           'PendulumDx', 'CartpoleDx']
