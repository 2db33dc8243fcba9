"""Heat PDE objective: FD-vs-adjoint, implicit-Euler sanity, TRM solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from _precision import F64, FD_RTOL, FD_T
from mioc_tpu.models import HeatObj
from mioc_tpu.solvers.trm import TRMParameters, trm_solve


def _fd_directional(obj, x, f0, h):
    """Forward difference in f64; central at a larger step in f32 (the
    objective itself carries ~1e-7 relative noise there)."""
    if F64:
        return (obj.eval_f(x + FD_T * h) - f0) / FD_T
    return (obj.eval_f(x + FD_T * h) - obj.eval_f(x - FD_T * h)) / (2 * FD_T)


@pytest.fixture(scope="module")
def heat_small():
    from mioc_tpu.models.heat import construct_mesh

    return HeatObj(nt=40, mesh=construct_mesh(refinements=2))


def test_heat_fd_gradient(heat_small):
    obj = heat_small
    u = np.ones((obj.nt, 2))
    obj.x = jnp.asarray(u)
    f0 = obj.eval_f_()
    obj.eval_df_()
    h = np.random.default_rng(0).normal(size=u.shape)
    dfh = obj.tau * float(jnp.sum(obj.df * h))
    fd = _fd_directional(obj, u, f0, h)
    # Exact discrete adjoint: FD error is O(t) (quadratic objective).
    assert abs(fd - dfh) / abs(dfh) < (1e-5 if F64 else FD_RTOL)


def test_heat_state_monotone_heating(heat_small):
    """With both heaters at max the mean temperature rises toward/above the
    equilibrium of the source-vs-Robin-loss balance; with heaters off it
    decays toward Tout."""
    obj = heat_small
    hot = obj.eval_f(np.full((obj.nt, 2), 5.0))
    off_x = np.zeros((obj.nt, 2))
    obj.x = jnp.asarray(off_x)
    obj.eval_f_()
    y_off = np.asarray(obj.state)
    mean_off = y_off.mean(axis=1)
    assert mean_off[-1] < mean_off[0]  # cooling toward Tout=0
    assert np.isfinite(hot)


def test_heat_compat_skip_first_gu(heat_small):
    obj = heat_small
    obj.x = jnp.asarray(np.ones((obj.nt, 2)))
    obj.eval_f_()
    obj.eval_df_()
    df_exact = np.asarray(obj.df).copy()
    obj.compat_skip_first_gu = True
    obj._build()
    obj.df_valid = False
    obj.eval_df_()
    df_compat = np.asarray(obj.df)
    obj.compat_skip_first_gu = False
    obj._build()
    # Differs only in the first row, by exactly c_0·Gu = ½γ.
    np.testing.assert_allclose(df_exact[1:], df_compat[1:], rtol=1e-12)
    np.testing.assert_allclose(df_exact[0] - df_compat[0], 0.5 * obj.gamma)


@pytest.mark.slow
def test_heat_trm_solve():
    from mioc_tpu.models.heat import construct_mesh

    obj = HeatObj(nt=60, mesh=construct_mesh(refinements=2))
    res = trm_solve(obj, TRMParameters(beta=0.001, delta0=2.0, p=2), seed=0)
    assert res.converged
    # Heating from 10 toward 20 with cost: objective well below the do-nothing
    # value and the control uses high heat early.
    J_off = obj.eval_f(np.zeros((obj.nt, 2)))
    assert res.f < J_off


def test_heat_cg_matches_dense(heat_small):
    """Matrix-free CG sweeps reproduce the dense-inverse path (identical
    discretization: S⁻¹v = K⁻¹Mv with K = M + τA) to near machine precision
    on a mesh where plain Jacobi-CG converges."""
    from mioc_tpu.models.heat import construct_mesh

    a = heat_small
    b = HeatObj(nt=40, mesh=construct_mesh(refinements=2), solver="cg",
                cg_iters=80)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 6, size=(40, 2)).astype(float)
    fa, fb = a.eval_f(x), b.eval_f(x)
    assert abs(fa - fb) / abs(fa) < (1e-10 if F64 else 5e-4)
    a.x = jnp.asarray(x); a.eval_f_(); a.eval_df_()
    b.x = jnp.asarray(x); b.eval_f_(); b.eval_df_()
    # f32: atol covers near-zero gradient entries (values are O(50-100)).
    np.testing.assert_allclose(np.asarray(b.df), np.asarray(a.df),
                               rtol=1e-8 if F64 else 2e-3,
                               atol=0 if F64 else 5e-3)


def test_heat_multigrid_fd_gradient():
    """MG-preconditioned CG (large-mesh path): few iterations suffice and the
    adjoint stays consistent with the (inexactly solved) forward."""
    from mioc_tpu.models.heat import construct_mesh_hierarchy

    obj = HeatObj(nt=30, mesh_hierarchy=construct_mesh_hierarchy(refinements=3),
                  solver="mg", cg_iters=10)
    rng = np.random.default_rng(2)
    x = rng.integers(0, 6, size=(30, 2)).astype(float)
    obj.x = jnp.asarray(x)
    f0 = obj.eval_f_()
    obj.eval_df_()
    h = rng.normal(size=x.shape)
    dfh = obj.tau * float(jnp.sum(obj.df * h))
    fd = _fd_directional(obj, x, f0, h)
    assert abs(fd - dfh) / abs(dfh) < (1e-5 if F64 else FD_RTOL)


def test_heat_multigrid_matches_dense():
    from mioc_tpu.models.heat import construct_mesh_hierarchy

    hier = construct_mesh_hierarchy(refinements=2)
    a = HeatObj(nt=25, mesh=hier[-1])
    b = HeatObj(nt=25, mesh_hierarchy=hier, solver="mg", cg_iters=10)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 6, size=(25, 2)).astype(float)
    fa, fb = a.eval_f(x), b.eval_f(x)
    assert abs(fa - fb) / abs(fa) < (1e-9 if F64 else 5e-4)


def test_heat_banded_mg_matches_dense():
    """Block-banded engine (RCM-permuted, gather-free — the TPU path) must
    reproduce the dense-inverse sweeps bit-for-bit-ish."""
    from mioc_tpu.models.heat import construct_mesh_hierarchy

    hier = construct_mesh_hierarchy(refinements=2)
    a = HeatObj(nt=30, mesh=hier[-1])
    b = HeatObj(nt=30, mesh_hierarchy=hier, solver="mg", cg_iters=10,
                sparse_format="banded")
    rng = np.random.default_rng(4)
    x = rng.integers(0, 6, size=(30, 2)).astype(float)
    fa, fb = a.eval_f(x), b.eval_f(x)
    assert abs(fa - fb) / abs(fa) < (1e-10 if F64 else 5e-4)
    a.x = jnp.asarray(x); a.eval_f_(); a.eval_df_()
    b.x = jnp.asarray(x); b.eval_f_(); b.eval_df_()
    np.testing.assert_allclose(np.asarray(b.df), np.asarray(a.df),
                               rtol=1e-8 if F64 else 2e-3,
                               atol=0 if F64 else 5e-3)
    # States come back permuted; unpermute_dofs restores assembly order.
    ya = np.asarray(a.state)
    yb = b.unpermute_dofs(b.state)
    np.testing.assert_allclose(yb, ya, rtol=1e-8 if F64 else 1e-3,
                               atol=1e-10 if F64 else 1e-4)


def test_banded_matvec_rectangular():
    import scipy.sparse as sp
    from mioc_tpu.fem.banded_device import banded_matvec, pack_banded

    rng = np.random.default_rng(5)
    # Tall banded-ish random matrix (simulates a prolongation).
    rows, cols, vals = [], [], []
    for i in range(300):
        for j in range(max(0, i // 4 - 2), min(75, i // 4 + 3)):
            rows.append(i); cols.append(j); vals.append(rng.normal())
    A = sp.csr_matrix((vals, (rows, cols)), shape=(300, 75))
    spec, blk = pack_banded(A, rb=16, dtype=np.float64)
    x = rng.normal(size=75)
    np.testing.assert_allclose(
        np.asarray(banded_matvec(spec, jnp.asarray(blk), jnp.asarray(x))),
        A @ x, rtol=1e-12 if F64 else 1e-4,
    )


def test_banded_matvec_rows_matches_single():
    """K-RHS banded matvec (the large-mesh wave/multistart primitive): each
    row equals the single matvec, square K and rectangular P alike."""
    import scipy.sparse as sp

    from mioc_tpu.fem.banded_device import (
        banded_matvec, banded_matvec_rows, pack_banded, rcm_permutation,
    )

    rng = np.random.default_rng(6)
    # SPD-ish banded square matrix.
    N = 200
    diags = [rng.normal(size=N - abs(d)) for d in range(-5, 6)]
    A = sp.diags(diags, list(range(-5, 6))).tocsr()
    perm = rcm_permutation(A)
    Ap = A[perm][:, perm]
    spec, blk = pack_banded(Ap, rb=16, dtype=np.float64)
    # Rectangular (prolongation-like).
    rows, cols, vals = [], [], []
    for i in range(300):
        for j in range(max(0, i // 4 - 2), min(75, i // 4 + 3)):
            rows.append(i); cols.append(j); vals.append(rng.normal())
    P = sp.csr_matrix((vals, (rows, cols)), shape=(300, 75))
    pspec, pblk = pack_banded(P, rb=16, dtype=np.float64)

    for sp_, bl_, mat, ncols in ((spec, blk, Ap, N), (pspec, pblk, P, 75)):
        xs = rng.normal(size=(4, ncols))
        ys = np.asarray(banded_matvec_rows(sp_, jnp.asarray(bl_),
                                           jnp.asarray(xs)))
        for k in range(4):
            np.testing.assert_allclose(
                ys[k],
                np.asarray(banded_matvec(sp_, jnp.asarray(bl_),
                                         jnp.asarray(xs[k]))),
                rtol=1e-12 if F64 else 1e-4, atol=1e-13 if F64 else 1e-5)
            np.testing.assert_allclose(ys[k], mat @ xs[k],
                                       rtol=1e-11 if F64 else 1e-3,
                                       atol=1e-12 if F64 else 1e-4)


def test_cg_solve_rows_matches_single():
    """Row-batched CG: each row solves its own system through the shared
    K-RHS operator, matching the single-vector CG to solver precision."""
    import scipy.sparse as sp

    from mioc_tpu.fem.banded_device import (
        banded_matvec, banded_matvec_rows, pack_banded,
    )
    from mioc_tpu.fem.sparse_device import cg_solve, cg_solve_rows

    rng = np.random.default_rng(7)
    N = 160
    B = sp.diags([rng.normal(size=N - abs(d)) for d in range(-3, 4)],
                 list(range(-3, 4)))
    A = (B.T @ B + 10.0 * sp.eye(N)).tocsr()  # SPD, well-conditioned
    spec, blk = pack_banded(A, rb=16, dtype=np.float64)
    blk = jnp.asarray(blk)
    dinv = jnp.asarray(1.0 / A.diagonal())
    bs = rng.normal(size=(3, N))
    mv1 = lambda v: banded_matvec(spec, blk, v)
    mvr = lambda v: banded_matvec_rows(spec, blk, v)
    xs = np.asarray(cg_solve_rows(mvr, jnp.asarray(bs),
                                  jnp.zeros_like(jnp.asarray(bs)), dinv, 60))
    for k in range(3):
        x1 = np.asarray(cg_solve(mv1, jnp.asarray(bs[k]),
                                 jnp.zeros(N), dinv, 60))
        np.testing.assert_allclose(xs[k], x1, rtol=1e-8 if F64 else 1e-3,
                                   atol=1e-9 if F64 else 1e-4)
        # And each row actually solves its system.
        r = bs[k] - A @ xs[k]
        assert np.linalg.norm(r) / np.linalg.norm(bs[k]) < (
            1e-10 if F64 else 1e-4)


def test_pde_forward_batch_rows_match_single_banded():
    """Banded cg/mg K-RHS forward (`forward_batch_banded`): the speculative
    wave's evaluation path on the large-mesh engine.  Singles route through a
    duplicated 2-row batch of the same function, so rows must agree — BIT-
    equal on TPU (K-on-LHS matmul layouts + row reductions), rounding-level
    on CPU."""
    import jax

    from mioc_tpu.models.heat import HeatObj, construct_mesh_hierarchy
    from mioc_tpu.utils.init import rand_func

    hier = construct_mesh_hierarchy(refinements=2)
    obj = HeatObj(nt=20, mesh_hierarchy=hier, solver="mg", cg_iters=8,
                  sparse_format="banded")
    assert obj._batched_sweeps_bitexact
    ops = obj._sweep_ops()
    us = jnp.stack([jnp.asarray(rand_func(obj, seed=s), obj.dtype)
                    for s in range(4)])
    fvals, ys = obj._forward_batch_with(us, ops)
    # ys is TIME-major: (nt+1, K, N) — the batch axis is SECOND.
    assert fvals.shape == (4,) and ys.shape[1] == 4
    exact = jax.devices()[0].platform == "tpu"
    for k in range(4):
        f1, y1 = obj._forward_with(us[k], ops)
        if exact:
            np.testing.assert_array_equal(np.asarray(fvals[k]),
                                          np.asarray(f1))
            np.testing.assert_array_equal(np.asarray(ys[:, k]),
                                          np.asarray(y1))
        else:
            np.testing.assert_allclose(np.asarray(fvals[k]), np.asarray(f1),
                                       rtol=1e-12 if F64 else 1e-5)
            np.testing.assert_allclose(np.asarray(ys[:, k]), np.asarray(y1),
                                       rtol=1e-11 if F64 else 1e-4,
                                       atol=1e-12 if F64 else 1e-4)


def test_pde_forward_batch_rows_match_single():
    """The batch-shaped dense forward (`_forward_batch_with`) is the
    speculative wave's evaluation path.  On TPU its rows are BIT-equal to
    the single forward (MXU per-row bits are batch-size invariant for
    K ≥ 2 — the round-4 probe); CPU matmul kernels vary with batch shape at
    the last-ulp level, so there the rows agree to rounding only."""
    import jax

    from mioc_tpu.models.heat import HeatObj, construct_mesh
    from mioc_tpu.utils.init import rand_func

    obj = HeatObj(nt=20, mesh=construct_mesh(refinements=1))
    ops = obj._sweep_ops()
    us = jnp.stack([jnp.asarray(rand_func(obj, seed=s), obj.dtype)
                    for s in range(5)])
    fvals, ys = obj._forward_batch_with(us, ops)
    # ys is TIME-major: (nt+1, K, N) — the batch axis is SECOND.
    assert fvals.shape == (5,) and ys.shape[1] == 5
    exact = jax.devices()[0].platform == "tpu"
    for k in range(5):
        f1, y1 = obj._forward_with(us[k], ops)
        if exact:
            np.testing.assert_array_equal(np.asarray(fvals[k]),
                                          np.asarray(f1))
            np.testing.assert_array_equal(np.asarray(ys[:, k]),
                                          np.asarray(y1))
        else:
            np.testing.assert_allclose(np.asarray(fvals[k]), np.asarray(f1),
                                       rtol=1e-12 if F64 else 1e-5)
            np.testing.assert_allclose(np.asarray(ys[:, k]), np.asarray(y1),
                                       rtol=1e-12 if F64 else 1e-4)
