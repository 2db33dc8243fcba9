"""Dtype-adaptive test precision knobs.

The suite normally runs CPU/f64 (conftest enables x64).  On TPU — or with
MIOC_TEST_F32=1 on CPU, the cheap dry run that predicts a TPU run — JAX stays
f32 and tests fall into three classes:

  * tolerance-bound checks (FD-vs-adjoint, matvec-vs-scipy, engine-vs-engine):
    still meaningful in f32 with wider tolerances / central differences;
  * exact-path checks (DP argmin paths, bit-match tests): dtype-independent,
    unchanged;
  * f64-only checks (trace equality vs the float64 numpy oracle, strict
    line-search exactness): skipped in f32 with `skip_f32`.
"""

import jax
import pytest

F64 = bool(jax.config.jax_enable_x64)

# FD directional-derivative checks: forward difference at t=1e-6 is fine in
# f64; in f32 the objective itself carries ~1e-7 relative noise, so use a
# central difference at a larger step (truncation O(t²), roundoff ~1e-5).
FD_T = 1e-6 if F64 else 1e-2
FD_CENTRAL = not F64
FD_RTOL = 5e-4 if F64 else 2e-2

# Implementation-vs-implementation equality (e.g. CG vs dense, ELL vs scipy).
EQ_RTOL = 1e-10 if F64 else 2e-4
EQ_ATOL = 1e-12 if F64 else 1e-5

skip_f32 = pytest.mark.skipif(
    not F64,
    reason="asserts f64-exact equality (numpy-f64 oracle / strict trace); "
    "meaningless at f32 — the underlying paths are covered by the "
    "tolerance-bound variants on this platform",
)
