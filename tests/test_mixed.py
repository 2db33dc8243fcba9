"""Mixed continuous+integer solver (beyond-reference capability)."""

import numpy as np
import pytest

from mioc_tpu.models import LVMMixedObj
from mioc_tpu.solvers.mixed import MixedParameters, mixed_solve
from mioc_tpu.solvers.trm import TRMParameters, trm_solve
from mioc_tpu.utils.checks import assert_admissible


@pytest.fixture(scope="module")
def solved():
    obj = LVMMixedObj(nt=240)
    par = MixedParameters(
        trm=TRMParameters(beta=1e-4, delta0=2.0, p=np.inf), rounds=6
    )
    return obj, mixed_solve(obj, par, seed=0)


def test_mixed_solve_monotone_and_feasible(solved):
    obj, res = solved
    hist = np.asarray(res.history)
    assert np.all(np.diff(hist) <= 1e-9)  # monotone decreasing half-steps
    c = res.x[:, 0]
    assert np.all(c >= -1e-12) and np.all(c <= obj.cmax + 1e-12)
    assert_admissible(res.x[:, 1:], obj.admissible)


def test_mixed_beats_integer_only(solved):
    obj, res = solved
    # Same integer problem with the continuous control pinned to zero.
    obj0 = LVMMixedObj(nt=240)
    from mioc_tpu.solvers.mixed import _IntegerBlockView

    view = _IntegerBlockView(obj0, np.zeros((240, 1)))
    res0 = trm_solve(view, TRMParameters(beta=1e-4, delta0=2.0, p=np.inf), seed=0)
    assert res.J <= res0.J + 1e-9  # extra degrees of freedom can only help


def test_mixed_rejects_pure_problems():
    from mioc_tpu.models import LVMObj

    with pytest.raises(ValueError):
        mixed_solve(LVMObj(nt=50), MixedParameters())
