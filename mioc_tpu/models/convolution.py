"""Signal-reconstruction (convolution) problem.

Re-design of ``/root/reference/julia_opt/example_convolution.jl`` (Section 6.2
of Marko & Wachsmuth, ESAIM:COCV 2023): a single 5-level integer control, no
differential equation — the objective is the quadratic

    f(u) = ½ (K u − f̂)ᵀ M (K u − f̂)

with a precomputed Toeplitz kernel-integral matrix ``K`` (analytic
antiderivative, ``example_convolution.jl:60-63,104-125``) and the hat-function
Gram (mass) matrix ``M`` (``:85-100``).  ``K u`` is a dense matmul — exactly
what the MXU is for; ``M`` is applied as a tridiagonal stencil instead of a
dense matrix.

This is the DP stress configuration (nt=2048, L=5, B≈128).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..objectives.base import LazyObjective
from ..ops.levels import product_levels

__all__ = ["ConvObj", "gauss_legendre5"]


def gauss_legendre5(f, a, b):
    """5-point Gauss-Legendre quadrature of ``f`` over ``(a, b)``.

    Capability parity with ``GaußLegendre5`` (``example_convolution.jl:144-154``)
    — the fallback used to build ``K`` when the kernel's antiderivative is
    unknown.
    """
    w = np.array([0.236926885056189, 0.478628670499366, 0.568888888888889,
                  0.478628670499366, 0.236926885056189])
    x = np.array([-0.906179845938664, -0.538469310105683, 0.0,
                  0.538469310105683, 0.906179845938664])
    y = (b - a) / 2 * x + (a + b) / 2
    return (b - a) / 2 * np.dot(w, np.vectorize(f)(y))


def _mass_mv(mdiag, moff, v):
    out = mdiag * v
    out = out.at[:-1].add(moff * v[1:])
    out = out.at[1:].add(moff * v[:-1])
    return out


def _mass_mv_rows(mdiag, moff, v):
    out = mdiag[None, :] * v
    out = out.at[:, :-1].add(moff * v[:, 1:])
    out = out.at[:, 1:].add(moff * v[:, :-1])
    return out


@partial(jax.jit, static_argnames=("precision",))
def _conv_f_batch(xs, K, fvec, mdiag, moff, precision="highest"):
    """Batched objective ``xs (Kb, nt, 1) → (Kb,)``, ``Kb ≥ 2``.  Rows are
    bit-invariant across batch sizes on TPU (MXU matmul rows and row-dots —
    the v5e probe in benchmarks/pde_batch_bitexact.py), so the speculative
    trial wave's evaluations bit-match the single objective, which routes
    through a duplicated 2-row batch of this same function.  ``precision``
    sets the MXU pass count: the TPU default single-bf16-pass costs ~1e-3
    relative on f and FAILED the on-chip FD tests (round 4);
    ``"float32"`` (3-pass, the default) passes the identical tolerances
    with controls bit-identical to ``"highest"`` (6-pass) and runs 1.17×
    faster — see ``ConvObj.matmul_precision``."""
    with jax.default_matmul_precision(precision):
        v = xs[:, :, 0] @ K.T - fvec[None, :]      # (Kb, nt+1)
        return 0.5 * jnp.sum(v * _mass_mv_rows(mdiag, moff, v), axis=1)


@partial(jax.jit, static_argnames=("precision",))
def _conv_f(x, K, fvec, mdiag, moff, precision="highest"):
    return _conv_f_batch(jnp.stack([x, x]), K, fvec, mdiag, moff,
                         precision=precision)[0]


@partial(jax.jit, static_argnames=("precision",))
def _conv_df(x, K, fvec, mdiag, moff, precision="highest"):
    with jax.default_matmul_precision(precision):
        v = K @ x[:, 0] - fvec
        return (K.T @ _mass_mv(mdiag, moff, v))[:, None]


def _toeplitz(nt, tau, int_k):
    """Kernel-integral Toeplitz matrix, ``example_convolution.jl:104-125``:
    ``K[r, c] = ∫ k`` over one grid cell at lag ``d = r − c ≥ 1`` (0-based)."""
    d = np.arange(nt + 1)[:, None] - np.arange(nt)[None, :]
    vals = np.zeros(nt + 2)
    lags = np.arange(1, nt + 2)
    vals[1:] = int_k(lags * tau) - int_k((lags - 1) * tau)
    return np.where(d >= 1, vals[np.clip(d, 0, nt + 1)], 0.0)


class ConvObj(LazyObjective):
    # The objective always evaluates through a Kb ≥ 2 batch of
    # ``_conv_f_batch`` (see its docstring), so batched trial evaluations
    # bit-match the sequential ones — the speculative wave is EXACT here
    # and defaults ON (~1000 wave vs 678 sequential iters/s at nt=1024 on
    # v5e with bit-matching controls; round 4 recorded 46.2 from a timing
    # flaw that measured a per-rep operator upload —
    # benchmarks/singletrm_rates.py, BASELINE_SELF.md round 5).
    _batched_sweeps_bitexact = True

    def __init__(self, nt: int = 2048, *, omega0=np.pi, dtype=None,
                 matmul_precision: str = "float32"):
        super().__init__()
        # MXU pass count for the K/M matmuls.  The TPU plain default
        # (single bf16 pass) cost ~1e-3 relative and FAILED the on-chip FD
        # tests (round 4); "float32" (3 passes) passes the identical
        # tolerances with CONTROLS BIT-IDENTICAL to "highest" (6 passes)
        # and runs the device TRM 1.17× faster (1079 vs 919 iters/s at
        # nt=1024 on v5e — benchmarks/conv_precision.py, round 5), so it
        # is the default; pass "highest" for full-f32 accumulation.  Part
        # of _params_key, so compiled-solver caches never mix precisions.
        self.matmul_precision = str(matmul_precision)
        self.T0, self.T1 = -1.0, 1.0
        self.nt = int(nt)
        self.tau = (self.T1 - self.T0) / self.nt
        self.omega0 = float(omega0)
        self.V = [[-2, -1, 0, 1, 2]]
        self.admissible = product_levels(self.V)
        self.nu, self.nv = 0, 1
        self.dtype = dtype or jnp.result_type(float)

        tau, T0 = self.tau, self.T0

        # Target samples; the reference samples target(T0 + τ·i) for i = 1…nt+1
        # (example_convolution.jl:73-81) — i.e. shifted one grid cell right.
        i = np.arange(1, self.nt + 2)
        fvec = 0.4 * np.cos(2 * np.pi * (T0 + tau * i))

        # Antiderivative of the kernel (example_convolution.jl:60-63).
        w0 = self.omega0

        def int_k(t):
            a = w0 * (t - 1.0) / np.sqrt(2.0)
            return 0.1 * np.exp(-a) * (np.sin(a) + np.cos(a))

        K = _toeplitz(self.nt, tau, int_k)

        # Device-resident operators, passed as explicit jit ARGUMENTS (a jit
        # closure capturing device arrays degrades the axon runtime's dispatch
        # latency permanently; see BASELINE_SELF.md).
        self.fvec = jnp.asarray(fvec, dtype=self.dtype)
        self.K = jnp.asarray(K, dtype=self.dtype)
        self.x = jnp.zeros((self.nt, 1), dtype=self.dtype)

        # Tridiagonal mass-matrix stencil (example_convolution.jl:85-100):
        # diag τ/3 at both ends, 2τ/3 inside; off-diagonals τ/6.
        diag = np.full(self.nt + 1, 2.0 * tau / 3.0)
        diag[0] = diag[-1] = tau / 3.0
        self._Mdiag = jnp.asarray(diag, dtype=self.dtype)
        self._Moff = jnp.asarray(tau / 6.0, dtype=self.dtype)

    def _args(self):
        return self.K, self.fvec, self._Mdiag, self._Moff

    def eval_f_impl(self, x, cache: bool):
        return _conv_f(x, *self._args(),
                       precision=self.matmul_precision), None

    def eval_df_impl(self):
        return _conv_df(self.x, *self._args(),
                        precision=self.matmul_precision)

    # Pure sweep API for batched/parallel drivers.
    def _forward(self, x):
        return _conv_f(x, *self._args(),
                       precision=self.matmul_precision), None

    def _adjoint(self, x, aux):
        return _conv_df(x, *self._args(),
                        precision=self.matmul_precision), None

    def _sweep_ops(self):
        return self._args()

    def _forward_with(self, x, ops):
        return _conv_f(x, *ops, precision=self.matmul_precision), None

    # Marker consumed by the device TRM's speculative wave (trm_device.py):
    # a batch-shaped forward whose rows bit-match the single evaluation.
    _forward_batch_ops = True

    def _forward_batch_with(self, xs, ops):
        return _conv_f_batch(xs, *ops,
                             precision=self.matmul_precision), None

    def _adjoint_with(self, x, aux, ops):
        return _conv_df(x, *ops, precision=self.matmul_precision), None
