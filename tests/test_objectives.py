"""FD-vs-adjoint gradient checks for every bundled objective.

Mirrors the per-example ``test_df`` discipline of the reference
(``example_*.jl``): the discrete-adjoint directional derivative
``τ Σ_i df_i·h_i`` must match forward differences of ``eval_f``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from _precision import F64, FD_CENTRAL, FD_RTOL, FD_T
from mioc_tpu.models import ConvObj, DTMObj, LVMObj, VPOObj


def directional_fd_check(obj, x_base, scale_by_tau=True, seed=0, t=None,
                         rtol=None):
    t = FD_T if t is None else t
    rtol = FD_RTOL if rtol is None else rtol
    obj.x = jnp.asarray(x_base)
    f0 = obj.eval_f_()
    obj.eval_df_()
    rng = np.random.default_rng(seed)
    h = rng.normal(size=x_base.shape)
    dfh = float(jnp.sum(obj.df * h))
    if scale_by_tau:
        dfh *= obj.tau
    fn = obj.eval_f(np.asarray(x_base) + t * h)
    if FD_CENTRAL:
        # f32: forward differences drown in objective roundoff; a central
        # difference at a larger step keeps the check meaningful.
        fb = obj.eval_f(np.asarray(x_base) - t * h)
        fd = (fn - fb) / (2 * t)
    else:
        fd = (fn - f0) / t
    assert abs(fd - dfh) <= rtol * max(1.0, abs(dfh)), (fd, dfh)


def test_fishing_gradient():
    obj = LVMObj(nt=200)
    directional_fd_check(obj, np.full((obj.nt, obj.nx), 0.5))


def test_vanderpol_gradient():
    obj = VPOObj(nt=400)
    directional_fd_check(obj, np.full((obj.nt, obj.nx), 0.5))


def test_doubletank_gradient():
    obj = DTMObj(nt=200)
    directional_fd_check(obj, np.full((obj.nt, obj.nx), 0.5))


def test_convolution_gradient():
    # Reference's test_df does NOT scale by tau here (example_convolution.jl:170-172)
    # because K/M already carry the integration weights.
    obj = ConvObj(nt=256)
    directional_fd_check(obj, np.ones((obj.nt, 1)), scale_by_tau=False,
                         rtol=1e-6 if F64 else None)


def test_convolution_quadratic_exact():
    """f is quadratic: df must be exact, FD error second order."""
    obj = ConvObj(nt=128)
    x = np.ones((obj.nt, 1))
    obj.x = jnp.asarray(x)
    f0 = obj.eval_f_()
    obj.eval_df_()
    h = np.random.default_rng(1).normal(size=x.shape)
    dfh = float(jnp.sum(obj.df * h))
    # Central difference kills the quadratic term entirely.
    t = 1e-4 if F64 else 1e-1
    fd = (obj.eval_f(x + t * h) - obj.eval_f(x - t * h)) / (2 * t)
    np.testing.assert_allclose(fd, dfh, rtol=1e-9 if F64 else 2e-4)


def test_eval_counters_and_cache():
    obj = LVMObj(nt=50)
    obj.x = jnp.full((50, 3), 0.5)
    obj.eval_f_()
    obj.eval_df_()
    obj.eval_df_()  # cached: no second df eval
    assert obj.f_evals == 1 and obj.df_evals == 1
    obj.eval_f_()  # invalidates
    obj.eval_df_()
    assert obj.f_evals == 2 and obj.df_evals == 2


def test_autodiff_jacobians_match_manual():
    """Default jacfwd-based Fy/Fu/Gy agree with the hand-written overrides."""
    obj = LVMObj(nt=20)
    y = jnp.array([0.4, 0.8])
    u = jnp.array([0.2, 0.3, 0.5])
    from mioc_tpu.objectives.ode import ODEObjective

    np.testing.assert_allclose(
        np.asarray(obj.Fy(y, u, 0)),
        np.asarray(ODEObjective.Fy(obj, y, u, 0)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(obj.Fu(y, u, 0)),
        np.asarray(ODEObjective.Fu(obj, y, u, 0)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(obj.Gy(y, u, 0)),
        np.asarray(ODEObjective.Gy(obj, y, u, 0)),
        rtol=1e-12,
    )


def test_vanderpol_instability_yields_nonfinite_not_crash():
    """Explicit Euler on the unstable ODE must yield inf/nan f, not raise
    (example_vanderpol.jl:3; the TRM rejects such trials)."""
    obj = VPOObj(nt=40)  # very coarse grid
    x = np.zeros((40, 3))
    x[:, 1] = 1.0  # mode with c=+0.75
    val = obj.eval_f(x)
    assert np.isfinite(val) or not np.isfinite(val)  # no exception is the test


def test_fuller_gradient():
    from mioc_tpu.models import FullerObj

    obj = FullerObj(nt=300)
    directional_fd_check(obj, np.full((obj.nt, obj.nx), 0.5))


def test_fuller_terminal_penalty_gradient():
    from mioc_tpu.models import FullerObj

    obj = FullerObj(nt=300, terminal_weight=50.0)
    directional_fd_check(obj, np.full((obj.nt, obj.nx), 0.5))


@pytest.mark.parametrize("cls", [LVMObj, VPOObj, DTMObj])
def test_user_facing_fd_jacobian_checkers(cls):
    """test_Fy/test_Fu utilities (ODEObjective.jl:186-241): the hand-written
    Jacobians of every ODE model pass the forward-difference sweep, with the
    classic V-shape minimum well below the coarse-step error."""
    obj = cls(nt=64)
    for errs in (obj.test_Fy(seed=0), obj.test_Fu(seed=0)):
        assert errs.min() < (1e-6 if F64 else 3e-3)
        assert np.all(np.isfinite(errs))


def test_fd_checker_catches_wrong_jacobian():
    """A deliberately wrong Fy must NOT pass the check."""

    class BadLVM(LVMObj):
        def Fy(self, y, u, i):
            return super().Fy(y, u, i) + 0.5

    errs = BadLVM(nt=64).test_Fy(seed=0)
    assert errs.min() > 1e-3


@pytest.mark.parametrize("nt", [200, 1023])
def test_sweep_unroll_bit_identical(nt):
    """Scan unrolling (the TPU latency fix for the tiny-state ODE sweeps)
    must be a pure scheduling change: objective, trajectory, and adjoint
    gradient bit-match the unroll=1 sweeps, including non-divisible nt."""
    rng = np.random.default_rng(0)
    results = []
    for unroll in (1, 8):
        obj = LVMObj(nt=nt)
        obj.sweep_unroll = unroll
        obj._build()
        x = jnp.asarray(obj.admissible.levels[rng.integers(0, 3, size=nt)],
                        obj.dtype)
        rng = np.random.default_rng(0)  # same draw for both unrolls
        obj.x = x
        f = obj.eval_f_()
        obj.eval_df_()
        results.append((f, np.asarray(obj.state), np.asarray(obj.df)))
    (f1, ys1, df1), (f8, ys8, df8) = results
    assert f1 == f8
    np.testing.assert_array_equal(ys1, ys8)
    # The adjoint body is scalar-expression products+adds (FyT_lam, round
    # 4): the CPU backend contracts them into FMAs whose grouping changes
    # with the unroll factor — last-ulp drift, unlike the forward's stable
    # lowering.  The production unroll is fixed (8), so only this
    # cross-unroll comparison sees it.
    np.testing.assert_allclose(df1, df8, rtol=1e-12 if F64 else 1e-4)
