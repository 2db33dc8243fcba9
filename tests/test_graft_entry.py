"""Driver hooks stay green: entry() compiles and dryrun_multichip runs on the
virtual CPU mesh."""

import sys

import jax
import numpy as np
import pytest


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


def test_entry_compiles_and_runs():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multiple devices")
def test_dryrun_multichip():
    g = _load()
    g.dryrun_multichip(2)
