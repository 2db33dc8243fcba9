"""End-to-end TRM solves: golden-value parity, determinism, certificates."""

import numpy as np
import pytest

from mioc_tpu.models import ConvObj, DTMObj, LVMObj
from mioc_tpu.solvers.trm import TRM, TRMParameters, trm_solve

GOLDEN_FISHING = 0.9398946251530471  # README.md:45-50 of the reference


def test_fishing_golden_parity():
    """Default-parameter fishing solve lands at (or below) the reference's
    published objective.  The problem has several nearby stationary points;
    random starts reach J in [0.938, 0.9400] — parity within optimality gap
    (BASELINE.md north star)."""
    res = trm_solve(LVMObj(), TRMParameters(), seed=0)
    assert res.converged
    assert res.J <= GOLDEN_FISHING + 2e-4
    assert res.J >= 0.93


def test_fishing_deterministic_given_x0():
    obj1, obj2 = LVMObj(nt=300), LVMObj(nt=300)
    from mioc_tpu.utils.init import rand_func

    x0 = rand_func(obj1, seed=42)
    r1 = trm_solve(obj1, TRMParameters(), x0=x0)
    r2 = trm_solve(obj2, TRMParameters(), x0=x0)
    assert r1.J == r2.J
    np.testing.assert_array_equal(r1.u, r2.u)


def test_fishing_pinf_compat_matches_honest():
    """For the SOS1 binary examples the reference's uniform p=inf jump cost and
    the honest max-norm cost differ per stage by (β − the honest cost) — but
    SURVEY.md §3.3: the uniform offset cancels in the argmin, so with the SAME
    start both reach valid stationary points of their respective subproblems.
    Smoke-check both modes converge."""
    obj_h = LVMObj(nt=200)
    obj_c = LVMObj(nt=200)
    from mioc_tpu.utils.init import rand_func

    x0 = rand_func(obj_h, seed=3)
    rh = trm_solve(obj_h, TRMParameters(beta=1e-4, delta0=2.0, p=np.inf), x0=x0)
    rc = trm_solve(
        obj_c, TRMParameters(beta=1e-4, delta0=2.0, p=np.inf, compat_pinf=True), x0=x0
    )
    assert rh.converged and rc.converged


def test_convolution_solve():
    res = trm_solve(
        ConvObj(nt=256),
        TRMParameters(beta=1e-4, delta0=0.125, p=1),
        seed=0,
    )
    assert res.converged
    # Coarse grid + small trust radius: J ≈ 0.032 at nt=256 (0.005 at nt=2048).
    assert res.J < 0.05


def test_doubletank_solve_smoke():
    res = trm_solve(
        DTMObj(nt=200), TRMParameters(beta=1e-5, delta0=2.0, p=np.inf), seed=0
    )
    assert res.converged
    assert np.isfinite(res.J)


def test_trm_reference_float_api():
    J = TRM(LVMObj(nt=200), TRMParameters(), seed=0)
    assert isinstance(J, float) and 0.9 < J < 1.5


def test_trm_rejects_objective_without_levels():
    obj = ConvObj(nt=32)
    obj.admissible = None
    with pytest.raises(ValueError):
        trm_solve(obj, TRMParameters())


def test_checkpoint_written(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    res = trm_solve(
        LVMObj(nt=100), TRMParameters(checkpoint_path=path), seed=0
    )
    from mioc_tpu.utils.io import load_checkpoint

    ck = load_checkpoint(path)
    assert ck["u"].shape == (100, 3)
    assert int(ck["iteration"]) <= res.iterations


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    trm_solve(LVMObj(nt=100), TRMParameters(metrics_path=path), seed=0)
    import json

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) >= 1
    assert {"iteration", "J", "f_evals", "dp_s"} <= set(lines[0])


def test_vanderpol_solve_value_range():
    """Self-measured reference point: J ≈ 2.41 at nt=1024 (BASELINE_SELF.md);
    stationary points vary with the start — accept a sane band."""
    from mioc_tpu.models import VPOObj

    res = trm_solve(
        VPOObj(nt=512), TRMParameters(beta=0.1, delta0=1.0, p=np.inf), seed=0
    )
    assert res.converged
    assert 0.5 < res.J < 4.0


def test_doubletank_solve_value_range():
    """Self-measured: J ≈ 4.74 at nt=1024."""
    res = trm_solve(
        DTMObj(nt=500), TRMParameters(beta=1e-5, delta0=2.0, p=np.inf), seed=0
    )
    assert res.converged
    assert 4.0 < res.J < 6.0


def test_checkpoint_resume(tmp_path):
    """A solve resumed from a checkpoint starts at the checkpointed control."""
    path = str(tmp_path / "ckpt.npz")
    obj = LVMObj(nt=100)
    r1 = trm_solve(obj, TRMParameters(checkpoint_path=path, maxiter=3), seed=0)
    r2 = trm_solve(
        LVMObj(nt=100), TRMParameters(resume_from=path)
    )
    assert r2.converged
    # Resuming from a partially-converged control can only do as well or better.
    assert r2.J <= r1.J + 1e-12


def test_temporal_backend_matches_scan():
    """dp_backend='temporal' produces the same solve as the default scan path
    (identical subproblem optima; tiny budget keeps the operators small)."""
    obj_a, obj_b = LVMObj(nt=120), LVMObj(nt=120)
    from mioc_tpu.utils.init import rand_func

    x0 = rand_func(obj_a, seed=5)
    pa = TRMParameters(beta=1e-3, p=1, delta0=0.3)
    ra = trm_solve(obj_a, pa, x0=x0)
    pb = TRMParameters(beta=1e-3, p=1, delta0=0.3, dp_backend="temporal")
    rb = trm_solve(obj_b, pb, x0=x0)
    np.testing.assert_allclose(rb.J, ra.J, rtol=1e-10)
    np.testing.assert_array_equal(rb.u, ra.u)


def test_temporal_backend_full_fishing_preset():
    """dp_backend='temporal' completes the FULL fishing preset (nt=1024,
    B=170 — the round-1 form OOMed here) and matches the scan solve."""
    obj_a, obj_b = LVMObj(nt=1024), LVMObj(nt=1024)
    from mioc_tpu.utils.init import rand_func

    x0 = rand_func(obj_a, seed=0)
    pa = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0)
    ra = trm_solve(obj_a, pa, x0=x0)
    pb = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0, dp_backend="temporal")
    rb = trm_solve(obj_b, pb, x0=x0)
    assert rb.converged and rb.iterations == ra.iterations
    np.testing.assert_allclose(rb.J, ra.J, rtol=1e-10)
    np.testing.assert_array_equal(rb.u, ra.u)


def test_fuller_solve_resolves_chattering():
    """Fuller's problem chatters (infinitely many switches) unregularized;
    with beta > 0 the TRM must return a converged finite-switch control and
    a small tracking objective (self-measured J ~ 1.7e-3 at nt=500)."""
    from mioc_tpu.models import FullerObj

    res = trm_solve(
        FullerObj(nt=500), TRMParameters(beta=1e-4, delta0=0.1, p=1), seed=0
    )
    assert res.converged
    assert res.J < 0.01
    switches = int(np.sum(np.any(np.diff(np.asarray(res.u), axis=0) != 0, axis=1)))
    assert 0 < switches < 60
