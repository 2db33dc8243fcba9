"""Device-resident TRM (single-jit while_loop) vs the host loop: identical
iterates, plus batched multistart."""

import numpy as np
import pytest

from _precision import F64
from mioc_tpu.models import ConvObj, LVMObj
from mioc_tpu.solvers.trm import TRMParameters, trm_solve
from mioc_tpu.solvers.trm_device import (
    make_device_trm,
    multistart_solve_device,
    trm_solve_device,
)
from mioc_tpu.utils.init import rand_func

# Host and device loops compute J through differently-fused reductions; the
# controls still bit-match, but in f32 the objective value carries ~1e-7
# relative noise (f64 CPU suite keeps the strict bound).
J_RTOL = 1e-12 if F64 else 1e-6


@pytest.mark.parametrize(
    "params",
    [
        TRMParameters(beta=1e-3, p=1, delta0=1.0),
        TRMParameters(beta=1e-4, p=np.inf, delta0=2.0),
    ],
    ids=["p1", "pinf"],
)
def test_device_loop_matches_host_fishing(params):
    obj_h = LVMObj(nt=240)
    obj_d = LVMObj(nt=240)
    x0 = rand_func(obj_h, seed=7)
    host = trm_solve(obj_h, params, x0=x0)
    dev = trm_solve_device(obj_d, params, x0=x0)
    assert bool(dev.converged) == host.converged
    np.testing.assert_array_equal(np.asarray(dev.u), host.u)
    np.testing.assert_allclose(float(dev.J), host.J, rtol=J_RTOL)
    assert int(dev.iterations) == host.iterations
    assert int(dev.inner_steps) == host.inner_steps
    # Measured counters equal the host loop's (the host computes one extra
    # reporting gradient after the loop, multi-trust.jl:166-167).
    assert int(dev.f_evals) == host.f_evals
    assert int(dev.df_evals) == host.df_evals - 1
    assert int(dev.dp_builds) == host.dp_builds


def test_device_loop_matches_host_convolution():
    params = TRMParameters(beta=1e-4, p=1, delta0=0.125)
    obj_h, obj_d = ConvObj(nt=256), ConvObj(nt=256)
    x0 = rand_func(obj_h, seed=0)
    host = trm_solve(obj_h, params, x0=x0)
    dev = trm_solve_device(obj_d, params, x0=x0)
    np.testing.assert_array_equal(np.asarray(dev.u), host.u)
    np.testing.assert_allclose(float(dev.J), host.J, rtol=J_RTOL)


def test_outer_chunk_segmenting_is_exact():
    """Segmented dispatches (outer_chunk) bit-match the single-dispatch solve
    — both for objectives with a state cache (ODE) and without (ConvObj)."""
    par = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)
    obj = LVMObj(nt=240)
    x0 = rand_func(obj, seed=3)
    one = trm_solve_device(obj, par, x0=x0, outer_chunk=None)  # monolithic
    seg = trm_solve_device(obj, par, x0=x0, outer_chunk=3)
    auto = trm_solve_device(obj, par, x0=x0, outer_chunk="auto")
    np.testing.assert_array_equal(np.asarray(auto.u), np.asarray(one.u))
    assert float(auto.J) == float(one.J)
    np.testing.assert_array_equal(np.asarray(seg.u), np.asarray(one.u))
    assert float(seg.J) == float(one.J)
    assert int(seg.iterations) == int(one.iterations)
    assert int(seg.inner_steps) == int(one.inner_steps)

    par_c = TRMParameters(beta=1e-4, p=1, delta0=0.125)
    obj_c = ConvObj(nt=128)
    x0c = rand_func(obj_c, seed=0)
    one_c = trm_solve_device(obj_c, par_c, x0=x0c, outer_chunk=None)
    seg_c = trm_solve_device(obj_c, par_c, x0=x0c, outer_chunk=2)
    np.testing.assert_array_equal(np.asarray(seg_c.u), np.asarray(one_c.u))
    assert float(seg_c.J) == float(one_c.J)


def test_multistart_device_batch():
    obj = LVMObj(nt=160)
    params = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)
    x0s = np.stack([rand_func(obj, seed=s) for s in range(4)])
    res = multistart_solve_device(obj, params, x0s)
    assert res.u.shape == (4, 160, 3)
    assert np.all(res.converged)
    # Each batched solve must equal its standalone device solve.
    single = trm_solve_device(LVMObj(nt=160), params, x0=x0s[2])
    np.testing.assert_array_equal(res.u[2], np.asarray(single.u))
    # f32/TPU: batched and single solves run differently-fused reductions
    # (and different fused kernels); controls still match exactly.
    np.testing.assert_allclose(res.J[2], float(single.J), rtol=J_RTOL)


def test_multistart_outer_chunk_is_exact():
    """Segmented batched multistart (segment ends when ALL lanes stopped)
    matches the monolithic batched solve; the progress callback reports the
    advancing iteration front."""
    obj = LVMObj(nt=160)
    par = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)
    x0s = np.stack([rand_func(obj, seed=s) for s in range(4)])
    mono = multistart_solve_device(obj, par, x0s)
    seg = multistart_solve_device(obj, par, x0s, outer_chunk=3)
    np.testing.assert_array_equal(np.asarray(seg.u), np.asarray(mono.u))
    np.testing.assert_array_equal(np.asarray(seg.J), np.asarray(mono.J))
    aut = multistart_solve_device(obj, par, x0s, outer_chunk="auto")
    np.testing.assert_array_equal(np.asarray(aut.u), np.asarray(mono.u))

    fronts = []
    multistart_solve_device(obj, par, x0s, outer_chunk=5,
                            progress=lambda it, s: fronts.append(it))
    assert fronts == sorted(fronts)
    assert fronts[-1] == int(np.max(mono.iterations))


def test_device_checkpoint_and_resume(tmp_path):
    """Segmented device solves snapshot the accepted control per segment
    (host-loop npz format) and restart from ``resume_from``."""
    from mioc_tpu.utils.io import load_checkpoint

    ck = str(tmp_path / "dev_ck.npz")
    par = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0, checkpoint_path=ck)
    obj = LVMObj(nt=160)
    res = trm_solve_device(obj, par, seed=0, outer_chunk=4)
    snap = load_checkpoint(ck)
    assert int(snap["iteration"]) == int(res.iterations)
    np.testing.assert_array_equal(snap["u"], np.asarray(res.u))

    par2 = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0, resume_from=ck)
    res2 = trm_solve_device(obj, par2)
    assert bool(res2.converged)
    # Restarting from a stationary point must terminate immediately.
    assert int(res2.iterations) <= 2


def test_device_loop_matches_host_heat():
    """PDE objective with threaded sweep operands inside the device loop."""
    from mioc_tpu.models import HeatObj
    from mioc_tpu.models.heat import construct_mesh

    params = TRMParameters(beta=1e-3, p=2, delta0=2.0)
    mesh = construct_mesh(refinements=2)
    obj_h = HeatObj(nt=30, mesh=mesh)
    obj_d = HeatObj(nt=30, mesh=mesh)
    x0 = rand_func(obj_h, seed=1)
    host = trm_solve(obj_h, params, x0=x0)
    dev = trm_solve_device(obj_d, params, x0=x0)
    np.testing.assert_array_equal(np.asarray(dev.u), host.u)
    np.testing.assert_allclose(float(dev.J), host.J, rtol=max(J_RTOL, 1e-10))


def test_speculative_halving_matches_sequential():
    """The batched trial wave (speculative=True, the trm_solve_device default)
    must reproduce the sequential inner loop field-for-field — accepted
    control, J, certificate, AND the sequential-equivalent counters — on an
    ODE and a Lazy (stateless-aux) objective."""
    from mioc_tpu.models.heat import HeatObj, construct_mesh

    _hmesh = construct_mesh(refinements=1)
    cases = [
        (LVMObj, dict(nt=240), TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)),
        # Dense-mode heat: since round 4 the forward always evaluates
        # through an explicit K ≥ 2 batch with fold-tree decision
        # reductions, so the wave bit-matches the sequential loop on TPU
        # f32 too (benchmarks/heat_spec_tpu.py confirms at nt=500).
        (lambda **kw: HeatObj(mesh=_hmesh, **kw), dict(nt=24),
         TRMParameters(beta=1e-3, p=2, delta0=2.0)),
    ]
    if F64:
        # ConvObj's sweeps are matmul-based: batched f32 accumulation can
        # drift (why speculative defaults off there) — exact on CPU f64.
        cases.append(
            (ConvObj, dict(nt=256), TRMParameters(beta=1e-4, p=1, delta0=0.125))
        )
        # Banded-MG heat (round 5): the K-RHS sweep makes the wave reach
        # the large-mesh cg/mg engine; on CPU f64 the wave's K-row and the
        # sequential loop's 2-row-duplicated evaluations agree to rounding,
        # which is enough for identical trajectories at this size (on TPU
        # they are bit-equal — benchmarks/heat_spec_tpu.py --banded).
        from mioc_tpu.models.heat import construct_mesh_hierarchy

        _hier = construct_mesh_hierarchy(refinements=1)
        cases.append(
            (lambda **kw: HeatObj(mesh_hierarchy=_hier, solver="mg",
                                  cg_iters=8, sparse_format="banded", **kw),
             dict(nt=24), TRMParameters(beta=1e-3, p=2, delta0=2.0))
        )
    for cls, kw, params in cases:
        x0 = rand_func(cls(**kw), seed=3)
        seq = trm_solve_device(cls(**kw), params, x0=x0, speculative=False)
        spec = trm_solve_device(cls(**kw), params, x0=x0, speculative=True)
        np.testing.assert_array_equal(np.asarray(spec.u), np.asarray(seq.u))
        np.testing.assert_array_equal(np.asarray(spec.x_final),
                                      np.asarray(seq.x_final))
        for field in ("converged", "iterations", "inner_steps", "f_evals",
                      "df_evals", "dp_builds"):
            assert np.asarray(getattr(spec, field)) == np.asarray(
                getattr(seq, field)), field
        for field in ("J", "f", "tv"):
            # The batched wave computes the trial objectives through
            # differently-fused reductions: last-ulp f32 noise on chip
            # (trajectories above are exactly equal), exact on CPU f64.
            np.testing.assert_allclose(
                np.asarray(getattr(spec, field)),
                np.asarray(getattr(seq, field)), rtol=J_RTOL, err_msg=field)


def test_loop_unroll_matches_baseline():
    """Guarded loop unrolling (outer_unroll/inner_unroll — one condition
    sync per N steps, masked steps select the old carry) must be
    bit-identical to the step-per-iteration loops, single-start and
    multistart, sequential and speculative."""
    par = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)
    x0 = rand_func(LVMObj(nt=240), seed=5)
    base = trm_solve_device(LVMObj(nt=240), par, x0=x0, speculative=False)
    for ou, iu, spec_ in ((2, 2, False), (4, 1, False), (3, 1, True)):
        r = trm_solve_device(LVMObj(nt=240), par, x0=x0, speculative=spec_,
                             outer_unroll=ou, inner_unroll=iu)
        np.testing.assert_array_equal(np.asarray(r.u), np.asarray(base.u),
                                      err_msg=f"ou={ou} iu={iu} spec={spec_}")
        for field in ("converged", "iterations", "inner_steps", "f_evals",
                      "df_evals", "dp_builds"):
            assert np.asarray(getattr(r, field)) == np.asarray(
                getattr(base, field)), (field, ou, iu, spec_)
        np.testing.assert_allclose(np.asarray(r.J), np.asarray(base.J),
                                   rtol=J_RTOL)

    obj = LVMObj(nt=200)
    x0s = np.stack([rand_func(obj, seed=s) for s in range(3)])
    mbase = multistart_solve_device(obj, par, x0s)
    for ou, iu in ((2, 2), (4, 1)):
        m = multistart_solve_device(obj, par, x0s, outer_unroll=ou,
                                    inner_unroll=iu)
        np.testing.assert_array_equal(np.asarray(m.u), np.asarray(mbase.u))
        np.testing.assert_array_equal(np.asarray(m.iterations),
                                      np.asarray(mbase.iterations))


def test_speculative_multistart_matches_sequential_multistart():
    """Speculative trial waves composed with batched multistart (VERDICT r3
    item 1): every start's accepted control, counters, and objective must
    match the sequential-inner-loop multistart AND the per-start single
    solves."""
    obj = LVMObj(nt=200)
    par = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)
    S = 4
    x0s = np.stack([rand_func(obj, seed=s) for s in range(S)])

    seq = multistart_solve_device(obj, par, x0s, speculative=False)
    spec = multistart_solve_device(obj, par, x0s, speculative=True)
    np.testing.assert_array_equal(np.asarray(spec.u), np.asarray(seq.u))
    np.testing.assert_array_equal(np.asarray(spec.x_final),
                                  np.asarray(seq.x_final))
    for field in ("converged", "iterations", "inner_steps", "f_evals",
                  "df_evals", "dp_builds"):
        np.testing.assert_array_equal(
            np.asarray(getattr(spec, field)),
            np.asarray(getattr(seq, field)), err_msg=field)
    for field in ("J", "f", "tv"):
        np.testing.assert_allclose(
            np.asarray(getattr(spec, field)),
            np.asarray(getattr(seq, field)), rtol=J_RTOL, err_msg=field)

    # Cross-check against independent single-start speculative solves.
    for s in range(S):
        one = trm_solve_device(LVMObj(nt=200), par, x0=x0s[s],
                               speculative=True)
        np.testing.assert_array_equal(np.asarray(spec.u[s]),
                                      np.asarray(one.u))
        assert int(spec.iterations[s]) == int(one.iterations)

    # Segmented speculative multistart stays exact.
    seg = multistart_solve_device(obj, par, x0s, speculative=True,
                                  outer_chunk=4)
    np.testing.assert_array_equal(np.asarray(seg.u), np.asarray(spec.u))
