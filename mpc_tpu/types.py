"""Public types for the TPU-native differentiable MPC framework.

Mirrors the reference's public surface (mpc/mpc.py:21-33): ``QuadCost``
and ``LinDx`` named tuples (which are JAX pytrees here, so they pass
transparently through jit/vmap/grad), the ``GradMethods`` enum, and the
solver configuration - the reference's 21 constructor knobs
(mpc/mpc.py:123-144) as a frozen, hashable dataclass so an ``MPCConfig``
can be closed over by a compiled solver.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, NamedTuple, Optional

import jax


class QuadCost(NamedTuple):
    """Quadratic cost 0.5 tau^T C tau + c^T tau (reference mpc/mpc.py:21).

    C: [T, n_tau, n_tau] (or [T, B, n_tau, n_tau] batched, or fewer dims
    to be broadcast by the MPC wrapper); c: [T, n_tau] likewise.
    """
    C: jax.Array = None
    c: jax.Array = None


class LinDx(NamedTuple):
    """Linear dynamics x' = F @ (x, u) + f (reference mpc/mpc.py:22).

    F: [T-1, n_state, n_tau]; f: [T-1, n_state] or None.
    """
    F: jax.Array = None
    f: Optional[jax.Array] = None


class GradMethods(enum.Enum):
    """Dynamics-Jacobian extraction method (reference mpc/mpc.py:29-33).

    On TPU all methods share one vmapped code path; ANALYTIC uses a
    model-provided ``grad_input`` when available and otherwise falls back
    to AUTO_DIFF (``jax.jacrev``), which is exact in JAX.
    """
    AUTO_DIFF = 1
    FINITE_DIFF = 2
    ANALYTIC = 3
    ANALYTIC_CHECK = 4


class Solution(NamedTuple):
    """Full solver output (the reference returns the first three,
    mpc/mpc.py:337; the rest are the per-example diagnostics the
    reference only logs, mpc/mpc.py:287-297)."""
    x: jax.Array            # [T, n_state] optimal states
    u: jax.Array            # [T, n_ctrl] optimal controls
    costs: jax.Array        # scalar: best total objective
    full_du_norm: jax.Array  # scalar: last undamped step norm
    n_iter: jax.Array       # iLQR iterations performed
    n_qp_iter: jax.Array    # total PNQP iterations
    converged: jax.Array    # bool: full_du_norm < eps
    # per-example accepted line-search step size, after the reference's
    # over-decay correction (mpc/lqr_step.py:247-252); the reference's
    # scalar ``mean_alphas`` diagnostic is ``alpha.mean()`` over the batch
    alpha: jax.Array
    # per-iteration history [lqr_iter, 4] of (best_cost, full_du_norm,
    # alpha, n_qp_iter), NaN-padded past the executed iterations.
    # Recorded only at verbose > 0 (feeds the reference's per-iteration
    # table_log rows, mpc/mpc.py:287-297); None otherwise.
    iter_stats: Any = None


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static solver configuration (reference mpc/mpc.py:123-144).

    Same names and defaults as the reference constructor.  Everything
    here is hashable so the config can be a static argument of a jitted
    solve.  Bounds / u_init / u_zero_I / prev_ctrl are *data* and are
    passed to the solve call instead.
    """
    n_state: int
    n_ctrl: int
    T: int
    lqr_iter: int = 10
    grad_method: GradMethods = GradMethods.ANALYTIC
    delta_u: Optional[float] = None
    verbose: int = 0
    eps: float = 1e-7
    back_eps: float = 1e-7
    linesearch_decay: float = 0.2
    max_linesearch_iter: int = 10
    exit_unconverged: bool = True
    detach_unconverged: bool = True
    backprop: bool = True
    slew_rate_penalty: Optional[float] = None
    not_improved_lim: int = 5
    best_cost_eps: float = 1e-4
    pnqp_iter: int = 20
    # TPU-native option: evaluate the deterministic line-search schedule
    # in one vmapped rollout instead of a sequential retry loop
    # (identical results, far less sequential depth).
    parallel_linesearch: bool = True
    # lax.scan unroll factor for the horizon loops; each scan step costs
    # ~10us of loop overhead on TPU, so unrolling lets XLA fuse across
    # time steps (identical results).
    scan_unroll: int = 4
    # fused single-kernel Pallas solver (ops/fused.py): 'auto' uses it on
    # TPU whenever the problem is in scope (quadratic or SoA cost, SoA /
    # NNDynamics / LinDx dynamics, ntau <= 28; short horizons unroll
    # fully in-kernel, longer ones - hundreds of steps, VMEM-gated -
    # run the fori-loop kernel; see ops/fused.py:supports); 'never'
    # forces the jnp path; 'always' errors if out of scope.
    use_fused: str = 'auto'
    # matmul precision for the jnp path.  TPU matmuls default to
    # bfloat16 inputs, which breaks the <=1e-3 control-parity target
    # (bang-bang switching times flip); 'float32' forces full-precision
    # passes (SURVEY.md section 7 risk list).
    matmul_precision: str = 'float32'
    # O(log T)-depth associative-scan Riccati (ops/pscan.py) for the
    # exact LQR solves (the differentiable fixed point + KKT backward)
    # AND the unconstrained phase-1 subproblem gains.  False = always
    # sequential; True = always parallel; 'auto' (default) = parallel
    # when T >= 128 (the measured crossover; a no-op for every T < 128
    # config).  Constrained (box QP) steps always run sequentially.
    # Exact to ~1e-12 in float64; the f32 combines are partially pivoted
    # (ops/pscan.py:_lsolve) but long products can still lose ~1e-4 on
    # ill-conditioned problems, so prefer f64 for oracle work.
    parallel_riccati: Any = 'auto'

    def __post_init__(self):
        assert self.max_linesearch_iter > 0
        assert self.lqr_iter >= 1
