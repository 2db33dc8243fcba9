#!/usr/bin/env python
"""Heat-shape DP build cycle census (VERDICT r4 item 4 / r5 item 4).

The heat-shape fused build (Lp=40, Bp=256, smax=10) ran at 51.9% of the
VPU-bound model in round 4 with no attribution.  The model counts
(L−1)·4 + (smax+1)·5 + 3 plane ops per step — it does NOT count the per-j
operand materializations (the Φ-row sublane broadcast and the jump-column
lane broadcast) or any extra roll cost.  This driver measures kernel
VARIANTS (MIOC_DP_VARIANT, read at import → one subprocess per variant,
sequential so only ONE TPU client exists at a time):

  full        production kernel
  nocontract  j-loop ablated       → shift + bookkeeping cost
  noshift     shift chain ablated  → contraction + bookkeeping cost
  jb          jump-column broadcasts hoisted to a precomputed operand
              (exact; a candidate promotion if it wins)

Run: timeout 3600 python benchmarks/dp_census.py [conv|heat|both]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from bench import dp_throughput
shape = %(shape)r
rate, sol = dp_throughput(**shape["kw"], r1=16, r2=64)
per_build_us = shape["kw"]["nt"] * shape["kw"]["L"]**2 * shape["kw"]["B"] / rate * 1e6
print("CENSUS " + json.dumps({"per_build_us": round(per_build_us, 1),
                              "relax_per_s": round(rate), **sol}))
"""

SHAPES = {
    "conv": dict(kw=dict(nt=2048, L=5, M=1, B=128,
                         levels_spec=[[-2, -1, 0, 1, 2]], p=1, beta=1e-4)),
    "heat": dict(kw=dict(nt=1024, L=36, M=2, B=204,
                         levels_spec=[list(range(6))] * 2, p=2, beta=1e-3)),
}


def run_variant(shape_name, variant, timeout=900):
    env = {**os.environ, "MIOC_DP_VARIANT": variant}
    code = _CHILD % {"repo": REPO, "shape": SHAPES[shape_name]}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=timeout)
    for line in out.stdout.splitlines():
        if line.startswith("CENSUS "):
            return json.loads(line[len("CENSUS "):])
    raise RuntimeError(f"{shape_name}/{variant} failed:\n{out.stdout[-800:]}"
                       f"\n{out.stderr[-800:]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "heat"
    shapes = ["conv", "heat"] if which == "both" else [which]
    plans = {"conv": ["full", "jb", "nocontract", "noshift"],
             "heat": ["full", "jb", "nocontract", "noshift"]}
    for s in shapes:
        print(f"== {s} ==", flush=True)
        base = None
        for v in plans[s]:
            try:
                r = run_variant(s, v)
            except Exception as e:
                print(f"  {v:10s}: FAILED {e}", flush=True)
                continue
            if v == "full":
                base = r["per_build_us"]
            extra = ""
            if base and v != "full":
                extra = f"  ({r['per_build_us'] / base:5.2f}x of full)"
            print(f"  {v:10s}: {r['per_build_us']:8.1f} us/build  "
                  f"{r.get('pct_of_vpu_bound', '?'):>5}% of VPU bound{extra}",
                  flush=True)


if __name__ == "__main__":
    main()
