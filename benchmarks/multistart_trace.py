#!/usr/bin/env python
"""Capture an XLA op-level profile of the batched multistart solve (scan vs
Pallas DP) and print the top self-time ops — locates the in-situ 3 ms/outer-
iter gap that the isolated DP-step chain (dpstep_amortized.py) does not show.

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/multistart_trace.py [S] [nt] [which]
"""

import glob
import os
import sys

import numpy as np

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import multistart_solve_device
from mioc_tpu.utils.init import rand_func


def top_ops(logdir, n=25):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats^", {})
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    key = "total_self_time_in_us"
    if rows and key not in rows[0]:
        print("columns:", list(rows[0].keys()))
        return
    rows.sort(key=lambda r: -float(r[key]))
    tot = sum(float(r[key]) for r in rows)
    print(f"  total device self time: {tot / 1e3:.1f} ms")
    for r in rows[:n]:
        print(f"  {float(r[key]) / 1e3:9.3f} ms  {r.get('occurrences', '?'):>6}x  "
              f"{r.get('type', '')[:18]:18s} {r.get('operation', '')[:80]}")


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    which = sys.argv[3] if len(sys.argv) > 3 else "both"

    import jax

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}")
    spec = registry.get("fishing")
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    x0s = np.stack([np.asarray(rand_func(obj, seed=s)) for s in range(S)])

    cases = [("scan", False), ("pallas", True)]
    if which != "both":
        cases = [c for c in cases if c[0] == which]
    for name, up in cases:
        multistart_solve_device(obj, par, x0s, use_pallas=up)  # compile+warm
        logdir = f"/tmp/mioc_trace_{name}"
        with jax.profiler.trace(logdir):
            multistart_solve_device(obj, par, x0s, use_pallas=up)
        print(f"== {name} ==")
        try:
            top_ops(logdir)
        except Exception as e:
            print("  (trace parse failed:", e, ")")


if __name__ == "__main__":
    main()
