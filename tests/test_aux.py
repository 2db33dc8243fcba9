"""Aux subsystems: continuous optimizers, IO (.dat/VTK/checkpoints), CLI,
plotting smoke tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mioc_tpu.objectives.base import LazyObjective
from mioc_tpu.solvers.continuous import (
    ArmijoLS,
    LSInitialLastInc,
    NonlinCG,
    SteepestDescent,
    WolfeLS,
    opt_optimize,
)


class Quadratic(LazyObjective):
    """½ xᵀ Q x − bᵀx on a (nt, nx)-shaped variable."""

    def __init__(self, n=12, seed=0):
        super().__init__()
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(n, n))
        self.Q = jnp.asarray(A @ A.T + n * np.eye(n))
        self.b = jnp.asarray(rng.normal(size=n))
        self.nt, self.nu, self.nv = n, 1, 0
        self.T0, self.T1, self.tau = 0.0, 1.0, 1.0 / n
        self.x = jnp.zeros((n, 1))

    def eval_f_impl(self, x, cache):
        v = x[:, 0]
        return 0.5 * v @ (self.Q @ v) - self.b @ v, None

    def eval_df_impl(self):
        return (self.Q @ self.x[:, 0] - self.b)[:, None]

    def exact(self):
        return np.linalg.solve(np.asarray(self.Q), np.asarray(self.b))


@pytest.mark.parametrize(
    "opt",
    [
        SteepestDescent(ls=ArmijoLS(lsi=LSInitialLastInc())),
        NonlinCG(ls=WolfeLS()),
        SteepestDescent(ls=WolfeLS()),
    ],
    ids=["sd-armijo", "ncg-wolfe", "sd-wolfe"],
)
def test_continuous_optimizers_solve_quadratic(opt):
    obj = Quadratic()
    opt.maxiter = 500
    from _precision import F64
    if not F64:
        # f32: once |g| ~ 1e-2, the per-step Armijo decrement |g|²/(2·λmax)
        # drops below the objective's ~1e-7 evaluation noise and the Wolfe
        # phases bisect pure roundoff — stop at the attainable gradient norm
        # instead (still |x − x*| ≤ |g|/λmin ≈ 1e-3, inside the assert).
        opt.tol = 1e-2
    opt_optimize(opt, obj, np.zeros((12, 1)))
    np.testing.assert_allclose(np.asarray(obj.x)[:, 0], obj.exact(),
                               atol=1e-5 if F64 else 3e-3)


def test_armijo_rejects_ascent_direction():
    obj = Quadratic()
    obj.x = jnp.ones((12, 1))
    obj.eval_fdf_()
    with pytest.raises(ValueError):
        ArmijoLS().apply(obj, obj.df)  # +gradient: ascent


def test_dat_roundtrip(tmp_path):
    from mioc_tpu.utils.io import import_from_latex_format, save_latex_format

    x = np.linspace(0, 1, 11)
    y = np.sin(x)
    save_latex_format(x, y, "test", str(tmp_path))
    # Header format parity: first line is "x    y" (HelpFunctions.jl:402-409).
    first = open(tmp_path / "test.dat").readline()
    assert first.split() == ["x", "y"]
    x2, y2 = import_from_latex_format("test", str(tmp_path))
    np.testing.assert_allclose(x2, x)
    np.testing.assert_allclose(y2, y)


def test_vtk_writer(tmp_path):
    from mioc_tpu.fem import mesh_library
    from mioc_tpu.utils.vtk import PVDCollection, pvd_append, write_vtk

    mesh = mesh_library("squareg", 0.5)
    u = np.random.default_rng(0).normal(size=mesh.np)
    c = np.random.default_rng(1).normal(size=mesh.ntri)
    v = np.random.default_rng(2).normal(size=(3, mesh.np))
    f1 = write_vtk(str(tmp_path / "t1"), mesh, [("u", u), ("c", c), ("v", v)])
    f2 = write_vtk(str(tmp_path / "t2"), mesh, ("v", v))
    f3 = write_vtk(str(tmp_path / "t3"), mesh, u)
    for f in (f1, f2, f3):
        head = open(f).read(200)
        assert "UNSTRUCTURED_GRID" in head
    with PVDCollection(str(tmp_path / "series")) as pvd:
        pvd_append(pvd, 0.0, mesh, u)
        pvd_append(pvd, 0.1, mesh, u)
    assert os.path.exists(tmp_path / "series.pvd")
    assert "timestep" in open(tmp_path / "series.pvd").read()


def test_plot_results_ode(tmp_path):
    from mioc_tpu.models import LVMObj
    from mioc_tpu.utils.plotting import plot_results

    obj = LVMObj(nt=50)
    obj.x = jnp.full((50, 3), 0.5)
    obj.eval_fdf_()
    out = plot_results(
        obj, filename=str(tmp_path / "r.png"), data_dir=str(tmp_path / "dat")
    )
    assert os.path.exists(out)
    assert os.path.exists(tmp_path / "dat" / "v(1).dat")
    assert os.path.exists(tmp_path / "dat" / "y(1).dat")


def test_cli_fishing(capsys, tmp_path, monkeypatch):
    from mioc_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main(["fishing", "--n", "128", "--no-plot", "--no-log",
               "--metrics", str(tmp_path / "m.jsonl")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Objective Value" in out
    assert os.path.exists(tmp_path / "m.jsonl")


def test_cli_unknown_problem():
    from mioc_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["nonexistent"])


_PLUGIN_SRC = '''
import numpy as np
from mioc_tpu.models import LVMObj

PRESET = dict(beta=1e-3, delta0=2.0, p=np.inf)


class ToyFishing(LVMObj):
    """Objective subclass defined in the plugin module: auto-registered
    under the file stem by convention."""
'''


def test_problem_registry_plugin_discovery(tmp_path, capsys, monkeypatch):
    """Plugin-style problem auto-discovery (multi-trust.jl:15-20): dropping
    example_<name>.py on the search path makes <name> a CLI problem."""
    from mioc_tpu.models import registry

    (tmp_path / "example_toyfish.py").write_text(_PLUGIN_SRC)
    new = registry.discover([str(tmp_path)])
    try:
        assert "toyfish" in new
        spec = registry.get("toyfish")
        assert spec.preset["beta"] == 1e-3
        obj = registry.build("toyfish", nt=32)
        assert obj.nt == 32
        assert "toyfish" in registry.available()

        # End-to-end through the CLI via $MIOC_PROBLEMS_PATH.
        from mioc_tpu.cli import main

        monkeypatch.setenv("MIOC_PROBLEMS_PATH", str(tmp_path))
        monkeypatch.chdir(tmp_path)
        rc = main(["toyfish", "--n", "64", "--no-plot", "--no-log"])
        assert rc == 0
        assert "Objective Value" in capsys.readouterr().out
    finally:
        registry._REGISTRY.pop("toyfish", None)
        import sys

        sys.modules.pop("mioc_tpu_problem_toyfish", None)


def test_problem_registry_explicit_register():
    """register() as decorator with an explicit preset."""
    from mioc_tpu.models import registry
    from mioc_tpu.objectives.base import Objective

    @registry.register("regtest", preset=dict(beta=0.5))
    class Dummy(Objective):
        def __init__(self, nt=8):
            super().__init__()
            self.nt = nt

    try:
        assert registry.get("regtest").preset == {"beta": 0.5}
        assert registry.build("regtest", nt=4).nt == 4
    finally:
        registry._REGISTRY.pop("regtest", None)


def test_aao_objective_protocol():
    """All-at-once evaluation protocol (AbstractObjectiveAAO, :15-59)."""
    from mioc_tpu.objectives.base import AAOObjective

    class Q(AAOObjective):
        def __init__(self):
            super().__init__()
            self.nt, self.nu, self.nv = 4, 1, 0
            self.T0, self.T1, self.tau = 0.0, 1.0, 0.25
            self.x = jnp.ones((4, 1))

        def eval_fdf_impl(self, x, want_df):
            f = 0.5 * float(jnp.sum(x**2))
            return f, (x if want_df else None)

    q = Q()
    f = q.eval_fdf_()
    assert f == 2.0 and q.df_valid and q.fdf_evals == 1
    q.eval_df_()  # cached
    assert q.fdf_evals == 1
    assert q.eval_f(np.zeros((4, 1))) == 0.0


def test_debug_checks_and_nan_guard():
    from mioc_tpu.models import LVMObj
    from mioc_tpu.solvers.trm import TRMParameters, trm_solve
    from mioc_tpu.utils.checks import assert_admissible, check_budget

    obj = LVMObj(nt=80)
    res = trm_solve(obj, TRMParameters(debug_checks=True), seed=0)
    assert res.converged
    assert_admissible(res.u, obj.admissible)
    with pytest.raises(AssertionError):
        assert_admissible(np.full((5, 3), 0.5), obj.admissible)
    with pytest.raises(AssertionError):
        check_budget(np.ones((4, 3)), np.zeros((4, 3)), B=2)


def test_animate_solution_smoke(tmp_path, monkeypatch):
    from mioc_tpu.fem import mesh_library
    from mioc_tpu.utils.plotting import animate_solution

    mesh = mesh_library("squareg", 0.5)
    state = np.random.default_rng(0).random((mesh.np, 6))
    v = np.random.default_rng(1).integers(0, 5, size=(5, 2)).astype(float)
    monkeypatch.chdir(tmp_path)
    out = animate_solution(mesh, state, 0.1, str(tmp_path / "anim"), v=v,
                           fps=2, max_frames=3)
    assert os.path.exists(out)


def test_continuous_optimizer_on_relaxed_ode():
    """Smooth stack drives an ODE objective directly (the reference's intended
    mixed-integer extension): steepest descent on the continuous relaxation of
    the fishing problem reduces f."""
    from mioc_tpu.models import LVMObj

    obj = LVMObj(nt=120)
    x0 = np.full((120, 3), 0.5)
    obj.x = jnp.asarray(x0)
    f0 = obj.eval_fdf_()
    # Note: ODE df is the gradient DENSITY (true derivative = tau*df), so the
    # Armijo sufficient-decrease fraction must satisfy sigma < tau.
    opt = SteepestDescent(ls=ArmijoLS(sigma=1e-3), maxiter=8)
    f_end = opt_optimize(opt, obj, x0)
    assert f_end < f0
    assert obj.f_evals > 1


def test_iteration_log_format(capsys):
    """The par.log table reproduces the reference's columns
    (multi-trust.jl:86-90)."""
    from mioc_tpu.models import LVMObj
    from mioc_tpu.solvers.trm import TRMParameters, trm_solve

    trm_solve(LVMObj(nt=60), TRMParameters(log=True, maxiter=2), seed=0)
    out = capsys.readouterr().out
    assert "Iter |" in out and "| Dk" in out.replace("  ", " ") or "Dk" in out
    assert "Initial Value" in out
    assert "good step" in out or "bad step" in out or "optimal" in out


def test_rand_func_cont_and_mixed():
    """Gaussian-smoothed continuous start within [umin, umax]
    (HelpFunctions.jl:158-193) and the mixed continuous+integer combination."""
    from mioc_tpu.ops.levels import bounded_sum_levels
    from mioc_tpu.utils.init import rand_func, rand_func_cont

    class Mixed:
        nt, nu, nv, nx = 200, 2, 3, 5
        umin = np.array([0.0, -1.0])
        umax = np.array([2.0, 1.0])
        admissible = bounded_sum_levels([[0, 1]] * 3, 1, 1)

    u0 = rand_func_cont(Mixed(), seed=0)
    assert u0.shape == (200, 2)
    assert np.all(u0 >= Mixed.umin - 1e-12) and np.all(u0 <= Mixed.umax + 1e-12)
    # Smoothness: the Gaussian kernel kills step-to-step jumps.
    assert np.abs(np.diff(u0, axis=0)).max() < 0.5

    x0 = rand_func(Mixed(), seed=1, jumps=10)
    assert x0.shape == (200, 5)
    # Integer block rows are admissible combinations.
    from mioc_tpu.utils.checks import assert_admissible

    assert_admissible(x0[:, 2:], Mixed.admissible)
    # Exactly `jumps` switches.
    switches = (np.abs(np.diff(x0[:, 2:], axis=0)).sum(axis=1) > 0).sum()
    assert switches <= 10


def test_rand_func_cont_zero_span_guard():
    """Degenerate smoothing (nt so small the convolved row is constant) must
    produce finite midpoint starts, not 0/0 NaNs."""
    from mioc_tpu.utils.init import rand_func_cont

    class Tiny:
        nt, nu = 1, 2
        umin = np.array([0.0, -1.0])
        umax = np.array([2.0, 1.0])

    u0 = rand_func_cont(Tiny(), seed=0)
    assert np.all(np.isfinite(u0))
    np.testing.assert_allclose(u0, [[1.0, 0.0]])


def test_plot_results_raw_objective(tmp_path):
    """plot_results dispatches on objective type; raw (no-ODE) path
    (HelpFunctions.jl:344-350)."""
    from mioc_tpu.models import ConvObj
    from mioc_tpu.utils.plotting import plot_results

    obj = ConvObj(nt=64)
    obj.x = jnp.ones((64, 1))
    obj.eval_fdf_()
    out = plot_results(obj, filename=str(tmp_path / "c.png"),
                       data_dir=str(tmp_path / "d"))
    assert os.path.exists(out)
    assert os.path.exists(tmp_path / "d" / "v(1).dat")


def test_detred_fold_trees():
    """ops/detred: batch-invariant fold-tree reductions (reference utility;
    the production paths use always-row-shaped native reduces instead —
    BASELINE_SELF.md round 4)."""
    import jax
    import jax.numpy as jnp

    from mioc_tpu.ops.detred import detdot, detmatvec, detsum, detsum_all

    from _precision import F64

    rtol = 1e-12 if F64 else 1e-5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 37)))
    np.testing.assert_allclose(np.asarray(detsum(x)), np.asarray(x).sum(-1),
                               rtol=rtol)
    # vmap of detsum equals per-lane detsum BIT-for-bit (elementwise tree).
    one = np.stack([np.asarray(detsum(x[k])) for k in range(4)])
    bat = np.asarray(jax.jit(jax.vmap(detsum))(x))
    np.testing.assert_array_equal(one, bat)

    A = jnp.asarray(rng.normal(size=(9, 37)))
    np.testing.assert_allclose(np.asarray(detmatvec(A, x[0])),
                               np.asarray(A) @ np.asarray(x[0]), rtol=rtol)
    np.testing.assert_allclose(float(detdot(x[0], x[1])),
                               float(np.dot(x[0], x[1])), rtol=rtol)
    assert float(detsum_all(x)) == float(detsum(x.reshape(-1)))
    assert detsum(jnp.zeros((3, 0))).shape == (3,)
