"""Dynamics model library (reference mpc/dynamics.py).

Models are plain Python objects registered as JAX pytrees: their
parameters are pytree leaves, so a model can be passed through
``jit``/``vmap``/``grad`` and optimized directly (the idiomatic JAX
replacement for the reference's stateful nn.Modules).  Every model is a
callable ``model(x, u) -> x_next`` on single instances (the solver vmaps
the batch axis); the elementwise models also broadcast over leading
batch dimensions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


ACTS = {
    'sigmoid': jax.nn.sigmoid,
    'relu': jax.nn.relu,
    'elu': jax.nn.elu,
}

# derivative of the activation expressed in terms of its *output* z
# (the reference reconstructs Jacobians from stored activations,
#  mpc/dynamics.py:98-112)
_ACT_DERIV_FROM_OUT = {
    'sigmoid': lambda z: z * (1.0 - z),
    'relu': lambda z: (z > 0).astype(z.dtype),
    'elu': lambda z: jnp.where(z > 0, 1.0, z + 1.0),
}

# Mosaic-lowerable activation forms for the in-kernel (SoA) path
# (jax.nn.sigmoid's `logistic` primitive may not lower).  Sigmoid goes
# through tanh: the naive 1/(1+exp(-v)) overflows exp for v < ~-88 in
# f32 and its JVP then yields inf/inf = NaN Jacobians; tanh and its
# JVP (1 - tanh^2) are stable for all v.
_ACTS_SOA = {
    'sigmoid': lambda v: 0.5 * (jnp.tanh(0.5 * v) + 1.0),
    'relu': lambda v: jnp.maximum(v, 0.0),
    'elu': lambda v: jnp.where(v > 0, v, jnp.exp(v) - 1.0),
}

# derivative from the *pre*-activation v in the same Mosaic-lowerable
# forms (the streaming in-kernel path computes act and act' from one v)
_ACT_DERIV_SOA = {
    'sigmoid': lambda v: (lambda s: s * (1.0 - s))(
        0.5 * (jnp.tanh(0.5 * v) + 1.0)),
    'relu': lambda v: jnp.where(v > 0, v * 0.0 + 1.0, v * 0.0),
    'elu': lambda v: jnp.where(v > 0, v * 0.0 + 1.0, jnp.exp(v)),
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NNDynamics:
    """MLP dynamics with an analytic input-Jacobian
    (reference NNDynamics, mpc/dynamics.py:15-130).

    params: list of (W, b) with W [n_out, n_in]; the final layer has no
    activation; optional residual passthrough adds x to the output
    (reference mpc/dynamics.py:73-74).
    """
    params: Sequence[Tuple[jax.Array, jax.Array]]
    activation: str = 'sigmoid'
    passthrough: bool = True
    n_state: int = 0
    n_ctrl: int = 0

    @staticmethod
    def init(key, n_state, n_ctrl, hidden_sizes=(100,),
             activation='sigmoid', passthrough=True, dtype=jnp.float32):
        """LeCun-uniform init matching torch.nn.Linear's default
        (uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b)."""
        assert activation in ACTS
        sizes = [n_state + n_ctrl] + list(hidden_sizes) + [n_state]
        params = []
        for n_in, n_out in zip(sizes[:-1], sizes[1:]):
            key, k1, k2 = jax.random.split(key, 3)
            bound = 1.0 / jnp.sqrt(n_in)
            W = jax.random.uniform(k1, (n_out, n_in), dtype, -bound, bound)
            b = jax.random.uniform(k2, (n_out,), dtype, -bound, bound)
            params.append((W, b))
        return NNDynamics(params, activation, passthrough, n_state, n_ctrl)

    def _forward_with_acts(self, x, u):
        z = jnp.concatenate([x, u], axis=-1)
        act = ACTS[self.activation]
        zs = []
        n_layers = len(self.params)
        for i, (W, b) in enumerate(self.params):
            z = z @ W.T + b
            if i < n_layers - 1:
                z = act(z)
                zs.append(z)
        if self.passthrough:
            z = z + x
        return z, zs

    def __call__(self, x, u):
        out, _ = self._forward_with_acts(x, u)
        return out

    def grad_input(self, x, u):
        """Analytic Jacobian (R, S) = (d x'/d x, d x'/d u), single instance
        (reference mpc/dynamics.py:81-130: reverse product of layer
        weights with activation-derivative masks)."""
        _, zs = self._forward_with_acts(x, u)
        n_state = x.shape[-1]
        deriv = _ACT_DERIV_FROM_OUT[self.activation]
        grad = self.params[-1][0]                   # [n_state, n_hidden]
        for i in range(len(zs) - 1, -1, -1):
            W = self.params[i][0]
            grad = grad @ (W * deriv(zs[i])[:, None])
        R = grad[:, :n_state]
        S = grad[:, n_state:]
        if self.passthrough:
            R = R + jnp.eye(n_state, dtype=R.dtype)
        return R, S

    # -- structure-of-arrays protocol (fused Pallas solver) ----------------
    # Weights ride SMEM as individual scalars and each neuron's
    # activation is one (8, 128) lane register, so a small MLP unrolls
    # into full-width VPU multiply-adds; the kernel extracts Jacobians
    # with in-kernel jax.linearize, replacing the reference's hand-rolled
    # grad_input reverse product (mpc/dynamics.py:81-130).  Scope: total
    # parameter count <= 512 scalars (the fused dispatch falls back to
    # the jnp path beyond that - ops/fused.py:supports); the reference's
    # default hidden=100 MLP runs on the jnp path.  MLPs over 64 params
    # route through the fori-loop kernel regardless of T, which is both
    # faster (e.g. hidden=16, T=20: ~1.04M solves/s/chip, 8.7x the jnp
    # path) and ~T-fold cheaper to Mosaic-compile than the unrolled
    # kernel; the first compile still takes minutes and is persistently
    # cached.  Practical hidden sizes: <= 32.
    def soa_param_count(self):
        """Shape-based scalar count (dispatch checks call this instead
        of materializing soa_params())."""
        return sum(W.size + b.size for W, b in self.params)

    def soa_params(self):
        out = []
        for W, b in self.params:
            n_out, n_in = W.shape
            out.extend(W[i, j] for i in range(n_out) for j in range(n_in))
            out.extend(b[i] for i in range(n_out))
        return tuple(out)

    def soa_params_flat(self):
        """Flat [n_params] array in ``soa_params()`` order (one
        concatenate instead of n_params scalar slices - the host-side
        feed for the kernel's SMEM param buffer)."""
        return jnp.concatenate(
            [jnp.concatenate([W.reshape(-1), b]) for W, b in self.params])

    # -- param-streaming protocol (fused kernel, large MLPs) ---------------
    # The tuple path above unrolls one kernel instruction per weight,
    # which caps at _MAX_SOA_PARAMS scalars (Mosaic compile time +
    # register pressure).  For bigger MLPs - e.g. the reference's
    # default hidden=100 (mpc/dynamics.py:9-13), ~800 params - the
    # kernel instead streams the weights: a lax.fori_loop over hidden
    # units reads each scalar from SMEM via ``pread`` (dynamic index)
    # and accumulates both the step output and the analytic input
    # Jacobian with O(1) live lane registers, so neither compile time
    # nor register pressure scales with the hidden width.  The Jacobian
    # is the in-kernel analog of the reference's ``grad_input`` reverse
    # product (mpc/dynamics.py:81-130), fused into the same pass.
    @property
    def soa_streaming(self):
        """Streaming form exists for single-hidden-layer MLPs (the
        reference's default shape); deeper MLPs keep the tuple path."""
        return len(self.params) == 2

    def _stream_core(self, xs, u, pread, want_jac):
        comps = list(xs) + (list(u) if isinstance(u, tuple) else [u])
        ns = len(xs)
        n_in = len(comps)
        H = self.params[0][0].shape[0]
        act = _ACTS_SOA[self.activation]
        dact = _ACT_DERIV_SOA[self.activation]
        b1_off = H * n_in
        w2_off = H * (n_in + 1)
        b2_off = w2_off + ns * H

        zero = comps[0] * 0.0

        def body(k, carry):
            acc, J = carry
            w1 = [pread(k * n_in + i) for i in range(n_in)]
            v = w1[0] * comps[0]
            for i in range(1, n_in):
                v = v + w1[i] * comps[i]
            v = v + pread(b1_off + k)
            h = act(v)
            d = dact(v) if want_jac else None
            acc_n = []
            for j in range(ns):
                w2 = pread(w2_off + j * H + k)
                acc_n.append(acc[j] + w2 * h)
                if want_jac:
                    wd = w2 * d
                    for i in range(n_in):
                        J[j][i] = J[j][i] + wd * w1[i]
            return acc_n, J

        J0 = [[zero for _ in range(n_in)] for _ in range(ns)] \
            if want_jac else [[]]
        # accumulate from exact zero so the k-ordered sum reproduces
        # the tuple path's accumulation order (0 + x == x in f32)
        from jax import lax
        acc, J = lax.fori_loop(0, H, body, ([zero] * ns, J0),
                               unroll=False)
        out = [acc[j] + pread(b2_off + j) for j in range(ns)]
        if self.passthrough:
            out = [out[j] + comps[j] for j in range(ns)]
            if want_jac:
                for j in range(ns):
                    J[j][j] = J[j][j] + 1.0
        return tuple(out), J

    def soa_stream_step(self, xs, u, pread):
        """Streamed step: ``pread(i)`` returns flat param i (SMEM read
        in-kernel).  Accumulates in ``soa_step``'s exact order (matches
        to the last ulp up to compiler rewrites of the activation)."""
        out, _ = self._stream_core(xs, u, pread, want_jac=False)
        return out

    def soa_stream_jac(self, xs, u, pread):
        """Streamed analytic Jacobian: returns J as an ns x (ns+nc)
        nested list, d x'_j / d (x, u)_i, fused with the forward pass
        (reference grad_input, mpc/dynamics.py:81-130)."""
        _, J = self._stream_core(xs, u, pread, want_jac=True)
        return J

    def soa_stream_step_multi(self, pts, pread):
        """Step at SEVERAL (xs, u) points in ONE weight sweep: each
        weight is read from SMEM once and applied to every point (the
        fused multi-alpha line search passes one point per trial alpha,
        so the scalar-unit read stream stops scaling with the number of
        alphas).  Per-point FP accumulation order matches
        ``soa_stream_step`` exactly, so results are bitwise identical
        to P independent single-point calls."""
        from jax import lax

        P = len(pts)
        comps_l = [list(xs) + (list(u) if isinstance(u, tuple) else [u])
                   for xs, u in pts]
        ns = len(pts[0][0])
        n_in = len(comps_l[0])
        H = self.params[0][0].shape[0]
        act = _ACTS_SOA[self.activation]
        b1_off = H * n_in
        w2_off = H * (n_in + 1)
        b2_off = w2_off + ns * H
        zero = comps_l[0][0] * 0.0

        def body(k, accs):
            w1 = [pread(k * n_in + i) for i in range(n_in)]
            b1 = pread(b1_off + k)
            w2 = [pread(w2_off + j * H + k) for j in range(ns)]
            new = []
            for p in range(P):
                comps = comps_l[p]
                v = w1[0] * comps[0]
                for i in range(1, n_in):
                    v = v + w1[i] * comps[i]
                v = v + b1
                h = act(v)
                new.append([accs[p][j] + w2[j] * h for j in range(ns)])
            return new

        accs = lax.fori_loop(0, H, body,
                             [[zero] * ns for _ in range(P)],
                             unroll=False)
        outs = []
        for p in range(P):
            out = [accs[p][j] + pread(b2_off + j) for j in range(ns)]
            if self.passthrough:
                out = [out[j] + comps_l[p][j] for j in range(ns)]
            outs.append(tuple(out))
        return outs

    def soa_step(self, xs, u, params):
        comps = list(xs) + (list(u) if isinstance(u, tuple) else [u])
        ns = len(xs)
        act = _ACTS_SOA[self.activation]
        n_layers = len(self.params)
        z = comps
        idx = 0
        for li, (W, b) in enumerate(self.params):
            n_out, n_in = W.shape
            zn = []
            for i in range(n_out):
                s = params[idx + i * n_in]
                s = s * z[0]
                for j in range(1, n_in):
                    s = s + params[idx + i * n_in + j] * z[j]
                s = s + params[idx + n_out * n_in + i]
                zn.append(s)
            idx += n_out * n_in + n_out
            if li < n_layers - 1:
                zn = [act(v) for v in zn]
            z = zn
        if self.passthrough:
            z = [z[i] + comps[i] for i in range(ns)]
        return tuple(z)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (list(self.params),), (self.activation, self.passthrough,
                                      self.n_state, self.n_ctrl)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AffineDynamics:
    """x' = A x + B u + c (reference AffineDynamics, mpc/dynamics.py:159-202)."""
    A: jax.Array
    B: jax.Array
    c: Optional[jax.Array] = None

    def __call__(self, x, u):
        z = x @ self.A.T + u @ self.B.T
        if self.c is not None:
            z = z + self.c
        return z

    def grad_input(self, x, u):
        return self.A, self.B

    def tree_flatten(self):
        return (self.A, self.B, self.c), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CtrlPassthroughDynamics:
    """Wraps a model to operate on the slew-augmented state (u_{t-1}, x)
    (reference CtrlPassthroughDynamics, mpc/dynamics.py:133-156)."""
    dynamics: Any

    def __call__(self, tilde_x, u):
        n_ctrl = u.shape[-1]
        x = tilde_x[..., n_ctrl:]
        xtp1 = self.dynamics(x, u)
        return jnp.concatenate([u, xtp1], axis=-1)

    def tree_flatten(self):
        return (self.dynamics,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
