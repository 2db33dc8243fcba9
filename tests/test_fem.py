"""FEM layer tests: quadrature exactness, shape functions, mesh invariants,
assembly correctness, prolongation, refinement (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from _precision import EQ_RTOL, F64

from mioc_tpu.fem import (
    FE_Lagrange,
    area_integrator,
    bdry_integrator,
    cell_dofs,
    dirichlet_constraints,
    init_mesh,
    mesh_library,
    moebius_mesh,
    ndofs,
    prolongation,
    quadrature_unit_triangle_area,
    quadrature_unit_triangle_bdry,
    refine_adaptively,
    refine_all_cells,
    sanity_check,
    shape,
    torus_mesh,
    triangle_mesh,
)
from mioc_tpu.fem.fe import global_dof_points
from mioc_tpu.fem.mesh import cell_areas


# -- quadrature ---------------------------------------------------------------

def _monomial_integral(i, j):
    """∫_T x^i y^j over the unit triangle = i! j! / (i+j+2)!"""
    from math import factorial

    return factorial(i) * factorial(j) / factorial(i + j + 2)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 6])
def test_area_quadrature_exactness(order):
    lam, w = quadrature_unit_triangle_area(order)
    x, y = lam[:, 1], lam[:, 2]
    for i in range(order + 1):
        for j in range(order + 1 - i):
            got = np.sum(w * x**i * y**j)
            np.testing.assert_allclose(got, _monomial_integral(i, j), rtol=1e-13)


@pytest.mark.parametrize("order", [1, 3, 5])
@pytest.mark.parametrize("edge", [1, 2, 3])
def test_bdry_quadrature_exactness(edge, order):
    lam, w = quadrature_unit_triangle_bdry(edge, order)
    # Parametrize the edge by arclength fraction s ∈ [0,1]; integrate s^k.
    assert np.allclose(lam[:, edge - 1], 0)  # edge i has λ_i = 0
    s = lam[:, edge % 3]  # one of the varying coordinates
    for k in range(order + 1):
        np.testing.assert_allclose(np.sum(w * s**k), 1.0 / (k + 1), rtol=1e-13)


# -- shape functions ----------------------------------------------------------

@pytest.mark.parametrize("k", [1, 2, 3])
def test_lagrange_nodal_property(k):
    fe = FE_Lagrange(k)
    val = shape(fe, fe.nodes)
    np.testing.assert_allclose(val, np.eye(len(fe.nodes)), atol=1e-13)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_partition_of_unity_and_gradients(k):
    fe = FE_Lagrange(k)
    rng = np.random.default_rng(0)
    lam = rng.dirichlet(np.ones(3), size=7)
    val, dval = shape(fe, lam, return_d=True)
    np.testing.assert_allclose(val.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(dval.sum(axis=2), 0.0, atol=1e-12)
    # FD check of gradients in reference-triangle coordinates (x=λ2, y=λ3).
    eps = 1e-7
    for d, vec in [(0, (-eps, eps, 0.0)), (1, (-eps, 0.0, eps))]:
        vp = shape(fe, lam + vec)
        vm = shape(fe, lam - np.array(vec))
        np.testing.assert_allclose((vp - vm) / (2 * eps), dval[:, d, :], atol=1e-6)


def test_hessians_p2():
    fe = FE_Lagrange(2)
    lam = np.array([[0.3, 0.3, 0.4]])
    val, dval, H = shape(fe, lam, return_d=True, return_H=True)
    # φ for vertex 1 is λ1(2λ1−1), λ1 = 1−x−y ⇒ Hessian = 4·ones(2,2).
    np.testing.assert_allclose(H[0, 0], 4.0 * np.ones((2, 2)), atol=1e-12)


# -- meshes -------------------------------------------------------------------

def test_square_mesh_invariants():
    mesh = mesh_library("squareg", 0.1)
    euler, area, circ = sanity_check(mesh)
    assert euler == 1  # disk topology
    np.testing.assert_allclose(area, 4.0, rtol=1e-12)
    np.testing.assert_allclose(circ, 8.0, rtol=1e-12)
    # All cells respect the area bound reasonably.
    assert cell_areas(mesh).max() <= 0.1 * 1.5


def test_lshape_mesh_invariants():
    mesh = mesh_library("lshapeg", 0.05)
    euler, area, circ = sanity_check(mesh)
    assert euler == 1
    np.testing.assert_allclose(area, 3.0, rtol=1e-12)
    np.testing.assert_allclose(circ, 8.0, rtol=1e-12)


# slitg: square minus a slit notch of half-width 1e-2 (mesh.jl:60-62);
# regulartriangleg: equilateral triangle inscribed in the unit circle.
_SLIT_AREA = 4.0 - 0.5 * 1e-2
_SLIT_CIRC = 8.0 + 0.99 + np.sqrt(1.0 + 1e-4)


@pytest.mark.parametrize(
    "geometry, hmax, area, circ",
    [
        ("slitg", 0.02, _SLIT_AREA, _SLIT_CIRC),
        ("regulartriangleg", 0.05, 3 * np.sqrt(3) / 4, 3 * np.sqrt(3)),
    ],
)
def test_slit_and_regulartriangle_invariants(geometry, hmax, area, circ):
    """The two library geometries untested in round 1 — on the native
    triangulator path (when built) AND the Python fallback."""
    from mioc_tpu.fem.mesh import _GEOMETRIES, _init_mesh_python

    mesh = mesh_library(geometry, hmax)
    euler, a, c = sanity_check(mesh)
    assert euler == 1
    np.testing.assert_allclose(a, area, rtol=1e-12)
    np.testing.assert_allclose(c, circ, rtol=1e-12)

    mesh_py = _init_mesh_python(np.array(_GEOMETRIES[geometry], float), hmax)
    euler, a, c = sanity_check(mesh_py)
    assert euler == 1
    np.testing.assert_allclose(a, area, rtol=1e-12)
    np.testing.assert_allclose(c, circ, rtol=1e-12)


def test_slit_sliver_robustness_native():
    """maxarea below the slit half-width forces the native triangulator's
    in-circumcircle predicates to operate inside the 1e-2 sliver
    (native/triangle.cpp quality refinement)."""
    from mioc_tpu.fem import _native_triangle

    if _native_triangle._load() is None:
        pytest.skip("native triangulator not built")
    mesh = mesh_library("slitg", 0.002)
    euler, a, c = sanity_check(mesh)  # incl. per-cell affine-det consistency
    assert euler == 1
    np.testing.assert_allclose(a, _SLIT_AREA, rtol=1e-12)
    np.testing.assert_allclose(c, _SLIT_CIRC, rtol=1e-12)
    assert cell_areas(mesh).min() > 0


def test_sanity_check_catches_affine_inconsistency():
    """sanity_check asserts per-cell shoelace area == |det B_K|/2
    (mesh.jl:917-918); a corrupted affine map must trip it."""
    import dataclasses

    mesh = mesh_library("squareg", 0.5)
    bad = dataclasses.replace(mesh, affine_matrix=mesh.affine_matrix * 1.01)
    with pytest.raises(AssertionError):
        sanity_check(bad)


def test_refine_all_cells_preserves_geometry():
    mesh = mesh_library("squareg", 0.5)
    r = refine_all_cells(mesh)
    assert r.ntri == 4 * mesh.ntri
    _, area, circ = sanity_check(r)
    np.testing.assert_allclose(area, 4.0, rtol=1e-12)
    np.testing.assert_allclose(circ, 8.0, rtol=1e-12)


def test_refine_adaptively():
    mesh = mesh_library("squareg", 0.5)
    r = refine_adaptively(mesh, np.arange(min(3, mesh.ntri)))
    assert r.ntri > mesh.ntri
    _, area, _ = sanity_check(r)
    np.testing.assert_allclose(area, 4.0, rtol=1e-12)


def test_torus_mesh_closed_surface():
    m = torus_mesh(3.0, 1.0, 24, 8)
    euler, _, _ = sanity_check(m)
    assert euler == 0  # torus
    assert len(m.be) == 0


def test_moebius_mesh():
    m = moebius_mesh(3.0, 1.0, 30)
    euler, _, _ = sanity_check(m)
    assert euler == 0  # Möbius strip has Euler characteristic 0


@pytest.mark.parametrize("k", [1, 2, 3])
def test_ndofs_formula(k):
    mesh = mesh_library("squareg", 0.3)
    fe = FE_Lagrange(k)
    expected = mesh.np + mesh.ne * (k - 1) + mesh.ntri * ((k - 1) * (k - 2)) // 2
    assert ndofs(fe, mesh) == expected
    # Every cell dof index is within range, and P2/P3 edge dofs consistent.
    cd = cell_dofs(fe, mesh)
    assert cd.min() >= 0 and cd.max() < expected


# -- assembly -----------------------------------------------------------------

@pytest.mark.parametrize("k", [1, 2, 3])
def test_mass_matrix_total_and_stiffness_nullspace(k):
    mesh = mesh_library("squareg", 0.2)
    fe = FE_Lagrange(k)
    quad = quadrature_unit_triangle_area(2 * k)
    A, _ = area_integrator(mesh, fe, quad, 1.0, None, None, None)
    M, F = area_integrator(mesh, fe, quad, None, None, 1.0, 1.0)
    ones = np.ones(ndofs(fe, mesh))
    # Constants are in the stiffness nullspace; mass total = area; F = ∫φ_i.
    np.testing.assert_allclose(np.abs(A @ ones).max(), 0.0, atol=1e-10)
    np.testing.assert_allclose(ones @ M @ ones, 4.0, rtol=1e-12)
    np.testing.assert_allclose(F.sum(), 4.0, rtol=1e-12)
    np.testing.assert_allclose(M @ ones, F, atol=1e-12)


@pytest.mark.parametrize("k", [1, 2])
def test_robin_constant_solution(k):
    """-Δu = 0, ∂u/∂n + u = 1 on Γ  ⇒  u ≡ 1 exactly."""
    mesh = mesh_library("squareg", 0.2)
    fe = FE_Lagrange(k)
    quad = quadrature_unit_triangle_area(2 * k)
    A, _ = area_integrator(mesh, fe, quad, 1.0, None, None, None)
    Q, G = bdry_integrator(mesh, fe, 3, 1.0, 1.0)
    u = spla.spsolve((A + Q).tocsc(), G)
    np.testing.assert_allclose(u, 1.0, atol=1e-10)


def test_poisson_dirichlet_saddle_point():
    """-Δu = 1 with u = 0 on Γ via the saddle-point form (test_FEM.jl:62-73):
    compare P1 and P2 solutions at shared vertices; check max principle."""
    import scipy.sparse as sp

    mesh = mesh_library("squareg", 0.05)
    sols = {}
    for k in [1, 2]:
        fe = FE_Lagrange(k)
        quad = quadrature_unit_triangle_area(2 * k)
        A, F = area_integrator(mesh, fe, quad, 1.0, None, None, 1.0)
        D = dirichlet_constraints(fe, mesh)
        Z = sp.csr_matrix((D.shape[0], D.shape[0]))
        K = sp.bmat([[A, D.T], [D, Z]], format="csc")
        rhs = np.concatenate([F, np.zeros(D.shape[0])])
        sols[k] = spla.spsolve(K, rhs)[: ndofs(fe, mesh)]
    # Agreement at vertices between P1 and P2 within discretization error.
    assert np.abs(sols[1][: mesh.np] - sols[2][: mesh.np]).max() < 2e-2
    # Max of the exact solution on [-1,1]² is ≈ 0.2947.
    assert 0.25 < sols[2].max() < 0.31


def test_function_coefficients():
    """Field coefficient f(x) integrates correctly: ∫ x² over the square."""
    mesh = mesh_library("squareg", 0.1)
    fe = FE_Lagrange(2)
    quad = quadrature_unit_triangle_area(4)
    _, F = area_integrator(
        mesh, fe, quad, None, None, None, lambda x: x[0] ** 2
    )
    np.testing.assert_allclose(F.sum(), 4.0 / 3.0, rtol=1e-12)


# -- prolongation -------------------------------------------------------------

@pytest.mark.parametrize("k", [1, 2, 3])
def test_prolongation_reproduces_polynomials(k):
    mesh = mesh_library("squareg", 0.4)
    rmesh = refine_all_cells(mesh)
    fe = FE_Lagrange(k)
    P = prolongation(mesh, rmesh, fe)
    f = lambda x, y: (x + 0.3 * y) ** k  # degree-k polynomial: exact
    U = np.array([f(*pt) for pt in global_dof_points(fe, mesh)])
    Ur = np.array([f(*pt) for pt in global_dof_points(fe, rmesh)])
    np.testing.assert_allclose(P @ U, Ur, atol=1e-11)


def test_prolongation_p3_to_p1():
    mesh = triangle_mesh()
    rmesh = refine_all_cells(mesh)
    P = prolongation(mesh, rmesh, FE_Lagrange(3), FE_Lagrange(1))
    f = lambda x, y: x**3 - 2 * x * y
    U = np.array([f(*pt) for pt in global_dof_points(FE_Lagrange(3), mesh)])
    Ur = np.array([f(*pt) for pt in global_dof_points(FE_Lagrange(1), rmesh)])
    np.testing.assert_allclose(P @ U, Ur, atol=1e-12)


def test_torus_surface_solve():
    """Screened Poisson with a point source on the torus (test_FEM.jl:146-165):
    (−Δ_surf + c) u = δ — solution finite, positive near the source, decaying."""
    mesh = torus_mesh(3.0, 1.0, 60, 20)
    fe = FE_Lagrange(1)
    quad = quadrature_unit_triangle_area(2)
    A, F = area_integrator(mesh, fe, quad, 1.0, None, 1e-3, None)
    F[0] = 1.0
    u = spla.spsolve(A.tocsc(), F)
    assert np.all(np.isfinite(u))
    assert u[0] == u.max() > 0  # peak at the source
    assert u.min() > 0          # screened Green's function is positive


def test_moebius_surface_solve():
    mesh = moebius_mesh(3.0, 1.0, 60)
    fe = FE_Lagrange(1)
    quad = quadrature_unit_triangle_area(2)
    A, F = area_integrator(mesh, fe, quad, 1.0, None, 1e-3, None)
    F[5] = 1.0
    u = spla.spsolve(A.tocsc(), F)
    assert np.all(np.isfinite(u)) and u.max() == u[5]


def test_fem_driver_and_benchmark(tmp_path, monkeypatch):
    """Elliptic FEM(...) driver incl. P3 visualization path (test_FEM.jl:21-95)
    and the timing harness (benchmark.jl)."""
    monkeypatch.chdir(tmp_path)
    from mioc_tpu.fem import FEM, fem_benchmark, plot_shape_functions, simple_test_FEM

    # Robin with constant data: u ≡ 1 (exact).
    _, U = FEM(np.eye(2), None, None, 0.0, 1.0, 1.0, fe_type="Lagrange_2",
               hmax=0.2)
    np.testing.assert_allclose(U, 1.0, atol=1e-9)

    # P3 pipeline with visualization (VTK + png via double prolongation).
    mesh, U = simple_test_FEM(hmax=0.5, visualize=True)
    assert np.all(np.isfinite(U))
    import os

    assert any(f.endswith(".vtk") for f in os.listdir("."))

    out = fem_benchmark(refs=3, verbose=False)
    assert out["ntri"] > 0 and out["solve_s"] >= 0

    pvd = plot_shape_functions(FE_Lagrange(2), refs=1)
    assert os.path.exists(pvd)


def test_fem_unknown_fe_type():
    from mioc_tpu.fem import FEM

    with pytest.raises(ValueError):
        FEM(np.eye(2), None, None, 1.0, 1.0, 1.0, fe_type="Hermite")


def test_prolongation_after_adaptive_refinement():
    """NVB children are appended in parent order, so the parent-walk
    prolongation works after refine_adaptively too (mesh.jl:428-442)."""
    mesh = mesh_library("squareg", 0.4)
    rmesh = refine_adaptively(mesh, np.arange(mesh.ntri // 2))
    P = prolongation(mesh, rmesh, FE_Lagrange(1))
    f = lambda x, y: 2 * x - 0.7 * y + 0.1
    U = np.array([f(*pt) for pt in mesh.p])
    Ur = np.array([f(*pt) for pt in rmesh.p])
    np.testing.assert_allclose(P @ U, Ur, atol=1e-12)


def test_klein_bottle_mesh():
    from mioc_tpu.fem import klein_bottle_mesh

    m = klein_bottle_mesh(36)
    euler, area, _ = sanity_check(m)
    assert euler == 0  # Klein bottle
    assert area > 0 and np.isfinite(area)


def test_ell_matvec_matches_scipy():
    import scipy.sparse as sp
    from mioc_tpu.fem.sparse_device import ell_matvec, to_ell

    rng = np.random.default_rng(0)
    A = sp.random(40, 40, density=0.12, random_state=1, format="csr")
    A = A + sp.eye(40)
    v, c = to_ell(A)
    x = rng.normal(size=40)
    np.testing.assert_allclose(
        np.asarray(ell_matvec(jnp.asarray(v), jnp.asarray(c), jnp.asarray(x))),
        A @ x, rtol=EQ_RTOL)


def test_cg_solve_exact_on_spd():
    from mioc_tpu.fem.sparse_device import cg_solve

    rng = np.random.default_rng(1)
    Q = rng.normal(size=(30, 30))
    A = Q @ Q.T + 30 * np.eye(30)
    b = rng.normal(size=30)
    Aj = jnp.asarray(A)
    x = cg_solve(lambda v: Aj @ v, jnp.asarray(b), jnp.zeros(30), jnp.asarray(1.0 / np.diag(A)), 60)
    np.testing.assert_allclose(np.asarray(Aj @ x), b,
                               atol=1e-9 if F64 else 2e-4)


def test_mg_vcycle_preconditions_stiffness():
    """One V-cycle must reduce the K-residual by a large h-independent factor
    on K = M + tau*A over a refinement hierarchy."""
    from mioc_tpu.fem.assembly import area_integrator
    from mioc_tpu.fem.fe import FE_Lagrange
    from mioc_tpu.fem.mesh import mesh_library, refine_all_cells
    from mioc_tpu.fem.multigrid import build_mg_ops, mg_apply
    from mioc_tpu.fem.quadrature import quadrature_unit_triangle_area

    fe = FE_Lagrange(2)
    quad = quadrature_unit_triangle_area(3)
    meshes = [mesh_library("squareg", 1.0)]
    for _ in range(3):
        meshes.append(refine_all_cells(meshes[-1]))
    A, _ = area_integrator(meshes[-1], fe, quad, np.eye(2), None, None, None)
    M, _ = area_integrator(meshes[-1], fe, quad, None, None, 1.0, None)
    K = (M + 0.2 * A).tocsr()
    ops = build_mg_ops(meshes, fe, K)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=K.shape[0]))
    z = mg_apply(ops, b)
    res = np.linalg.norm(np.asarray(b) - K @ np.asarray(z)) / np.linalg.norm(np.asarray(b))
    assert res < 0.2, res


# -- general (non-nodal) prolongation -----------------------------------------

def test_prolongation_general_path_matches_nodal():
    """The element-generic functional-application path must reproduce the
    vectorized nodal fast path for Lagrange pairs (mesh.jl:394-538)."""
    from mioc_tpu.fem.mesh import _prolongation_general

    mesh = mesh_library("squareg", 0.6)
    rmesh = refine_all_cells(mesh)
    for kc, kf in [(1, 1), (2, 2), (3, 1), (1, 2)]:
        fe, rfe = FE_Lagrange(kc), FE_Lagrange(kf)
        P_fast = prolongation(mesh, rmesh, fe, rfe)
        P_gen = _prolongation_general(mesh, rmesh, fe, rfe)
        np.testing.assert_allclose(
            P_gen.toarray(), P_fast.toarray(), atol=1e-12
        )


class _ScaledP1:
    """P1 with a NON-IDENTITY local dofmap: the represented function is
    Σ α·U_g·hat_g, i.e. flat_dofmap carries s = α (c_loc = α U), while the
    dof functionals stay point evaluations.  Exercises the reference's
    ``rdofmap \\ rdof_to_shape'`` solve (mesh.jl:487-516)."""

    needs_derivatives = False

    def __init__(self, alpha):
        self.alpha = float(alpha)
        self._p1 = FE_Lagrange(1)

    def ndofs(self, mesh):
        return mesh.np

    def nlocaldofs(self):
        return 3

    def shape(self, lam, return_d=False, return_H=False):
        from mioc_tpu.fem.fe import shape as fe_shape

        return fe_shape(self._p1, lam, return_d=return_d, return_H=return_H)

    def local_dofs(self, f):
        return f(self._p1.nodes)

    def flat_dofmap(self, mesh, idx):
        g = mesh.t[idx]
        n = np.arange(3)
        return g, n, n, np.full(3, self.alpha)


def test_prolongation_nonidentity_dofmap():
    """Coarse coefficients scaled by α, fine by γ: the general path's dofmap
    solve must yield P = (α/γ)·P_lagrange."""
    mesh = mesh_library("squareg", 0.8)
    rmesh = refine_all_cells(mesh)
    P_ref = prolongation(mesh, rmesh, FE_Lagrange(1)).toarray()
    P = prolongation(mesh, rmesh, _ScaledP1(3.0), _ScaledP1(0.5)).toarray()
    np.testing.assert_allclose(P, (3.0 / 0.5) * P_ref, atol=1e-12)


class _CellHermite:
    """Discontinuous per-cell toy element with DERIVATIVE dofs: local dofs are
    (value at centroid, ∂ξ, ∂η in the cell's own reference frame); basis
    (1, ξ−1/3, η−1/3) makes the dofs unisolvent with an identity dofmap.
    Exercises ``needs_derivatives`` + ``transform_derivative``
    (mesh.jl:541-552)."""

    needs_derivatives = True

    def ndofs(self, mesh):
        return 3 * mesh.ntri

    def nlocaldofs(self):
        return 3

    def local_dofs(self, f):
        centroid = np.full((1, 3), 1.0 / 3.0)
        val, dx, dy = f(centroid)
        return np.vstack([val[0], dx[0], dy[0]])

    def flat_dofmap(self, mesh, idx):
        n = np.arange(3)
        return 3 * idx + n, n, n, np.ones(3)


def test_prolongation_derivative_dofs():
    """Prolongating a LINEAR coarse P1 function into the derivative-dof toy
    element must reproduce (u(centroid), A_fᵀ∇u) exactly on every fine cell —
    the E-transform of transform_derivative is what makes the gradient dofs
    land in the fine cell's reference frame."""
    mesh = mesh_library("squareg", 0.7)
    rmesh = refine_all_cells(mesh)
    rfe = _CellHermite()
    P = prolongation(mesh, rmesh, FE_Lagrange(1), rfe)

    grad = np.array([2.0, -3.0])
    u = lambda x, y: 1.0 + grad[0] * x + grad[1] * y
    U = np.array([u(*pt) for pt in mesh.p])
    Uf = (P @ U).reshape(rmesh.ntri, 3)

    centroids = rmesh.p[rmesh.t].mean(axis=1)
    np.testing.assert_allclose(
        Uf[:, 0], u(centroids[:, 0], centroids[:, 1]), atol=1e-12
    )
    # Gradient dofs: ∇_ξ u = A_fᵀ ∇_x u per fine cell.
    expected = np.einsum("cgr,g->cr", rmesh.affine_matrix, grad)
    np.testing.assert_allclose(Uf[:, 1:], expected, atol=1e-12)


def test_transform_derivative_chain_rule():
    """transform_derivative applies E to the gradient planes (mesh.jl:541-552)."""
    from mioc_tpu.fem.mesh import transform_derivative

    fe = FE_Lagrange(2)
    lam = np.array([[0.2, 0.5, 0.3], [1 / 3, 1 / 3, 1 / 3]])
    E = np.array([[0.5, -1.0], [2.0, 0.25]])
    t_shape = lambda l: shape(fe, l, return_d=True)
    val, dx, dy = transform_derivative(E, t_shape, lam)
    v_ref, d_ref = shape(fe, lam, return_d=True)
    np.testing.assert_allclose(val, v_ref)
    np.testing.assert_allclose(dx, E[0, 0] * d_ref[:, 0] + E[0, 1] * d_ref[:, 1])
    np.testing.assert_allclose(dy, E[1, 0] * d_ref[:, 0] + E[1, 1] * d_ref[:, 1])
