"""Roofline analysis of the fused DP build kernel (VERDICT r2 item 7).

The kernel's per-step work is pure VPU elementwise math on an ``(Lp, Bp)``
value plane plus one strided HBM DMA per K-step chunk of the ``U`` argmin
table, so the two candidate ceilings are

  * VPU:  elementwise f32 ops/s.  Per backward step the kernel executes
          (L−1) successor iterations × ~4 plane ops (add, compare, 2 selects)
          + (smax+1) shift iterations × ~5 plane ops (2 rolls, mask, 2
          selects) on ``Lp·Bp`` f32/i32 elements;
  * HBM:  the U table write, ``(nt−1)·Lp·Bp`` int32 per build (42 MB at the
          heat shape), plus the ~nt·Lp stage/btilde reads (negligible).

Measurement is DEVICE-SIDE: wall-clock through the axon tunnel is useless at
this granularity (dispatch latency ~0.1-30 ms and wildly bimodal — measured
spread 72 us … 3.7 ms for the *same* executable), so the script runs a
``lax.scan`` of ``R`` builds with per-iteration-varying stage costs (defeats
CSE) under ``jax.profiler.trace`` and reads the fused kernel's device
self-time out of the xplane op stats, dividing by ``R``.

Prints per-shape: measured per-build device time, achieved relax/s and
elem-ops/s, the VPU- and HBM-bound times under the stated machine model, and
the achieved fraction of the binding roofline.

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/dp_roofline.py
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from mioc_tpu.ops.bellman import max_budget_use, stage_tables
from mioc_tpu.ops.bellman_pallas import (
    _build_tables_impl,
    _round_up,
    pallas_supported,
)
from mioc_tpu.ops.levels import jump_cost_table, product_levels

# Machine model (TPU v5e, one core): VPU (8 sublanes × 128 lanes × 4 ALUs
# @ 940 MHz ≈ 3.85e12 f32 elem-ops/s), HBM ~819 GB/s.  Stated, not vendored:
# the script reports achieved fractions against BOTH so a different chip just
# rescales the conclusion.
VPU_OPS = 8 * 128 * 4 * 0.94e9
HBM_BPS = 819e9

SHAPES = [
    ("conv  (nt=2048, L=5,  B=128)", dict(nt=2048, spec=[[-2, -1, 0, 1, 2]],
                                          p=1, beta=1e-4, B=128)),
    ("heat  (nt=1024, L=36, B=204)", dict(nt=1024, spec=[list(range(6))] * 2,
                                          p=2, beta=1e-3, B=204)),
]


def device_op_times(logdir, self_time: bool = True):
    """Per-op device times (s) from an xplane trace.

    Parses the XSpace proto directly (xplane_ops.py pattern — the
    tensorboard-plugin converter is broken in this image).  Returns
    ``(by_name: {op_name: (seconds, count)}, device_total_s)`` from the
    op-level line (the line with most events) of the TPU device plane.

    ``self_time=True`` (default since round 5) subtracts each event's
    DIRECTLY-NESTED children, so `while`/fusion parents report only their
    own bookkeeping — round 4 read the raw durations and misattributed
    ~60% of multistart device time to "while-loop self time" (the while
    spans CONTAIN every child op; the re-profile with this fix showed the
    loop overhead was ~zero and the batched chase dominated).
    ``self_time=False`` restores the raw inclusive durations.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        lines = [ln for ln in plane.lines if ln.events]
        if not lines:
            continue
        opline = max(lines, key=lambda ln: len(ln.events))
        evs = []
        for ev in opline.events:
            md = ev_names.get(ev.metadata_id)
            evs.append([ev.offset_ps, ev.offset_ps + ev.duration_ps,
                        md.name if md else "", 0])  # [start, end, name, child_ps]
        if self_time:
            # Longest-first at equal starts so parents precede their children;
            # a stack of open spans attributes each event to its DIRECT parent.
            evs.sort(key=lambda e: (e[0], -(e[1] - e[0])))
            stack = []
            for e in evs:
                while stack and e[0] >= stack[-1][1]:
                    stack.pop()
                if stack:
                    stack[-1][3] += e[1] - e[0]
                stack.append(e)
        by_name, tot = {}, 0.0
        for start, end, name, child in evs:
            dur = max(0, (end - start) - child) / 1e12
            tot += dur
            s_, n_ = by_name.get(name, (0.0, 0))
            by_name[name] = (s_ + dur, n_ + 1)
        return by_name, tot
    raise RuntimeError("no TPU device plane in trace")


def matched_time(by_name, *needles):
    """Total seconds of ops whose name contains any needle."""
    return sum(s for name, (s, _) in by_name.items()
               if any(nd in name for nd in needles))


def analyze(name, nt, spec, p, beta, B, reps=64, unroll=4):
    adm = product_levels(spec)
    L, M = adm.L, adm.levels.shape[1]
    smax = max_budget_use(adm.levels)
    Lp, Bp = _round_up(max(L, 8), 8), _round_up(B + 1, 128)

    rng = np.random.default_rng(0)
    grad = jnp.asarray(rng.normal(size=(nt, M)), jnp.float32)
    u_old = jnp.asarray(adm.levels[rng.integers(0, L, size=nt)], jnp.float32)
    levels = jnp.asarray(adm.levels, jnp.float32)
    jump = jnp.asarray(jump_cost_table(adm.levels, p=p, beta=beta), jnp.float32)
    stage, btilde = stage_tables(grad, u_old, levels, 2.0 / nt)

    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas

    levels_f = jnp.asarray(adm.levels, jnp.float32)

    def many(stage, btilde, jump):
        def body(acc, k):
            # Vary the stage costs per iteration so XLA cannot CSE builds.
            U, phi0 = _build_tables_impl(
                stage + (k.astype(jnp.float32) * 1e-6), btilde, jump, B,
                min(smax, B), unroll=unroll,
            )
            u, idx = backtrack_pallas(U, phi0, btilde, levels_f, jnp.int32(B))
            fin = jnp.isfinite(phi0)
            return acc + jnp.sum(jnp.where(fin, phi0, 0.0)) + jnp.sum(u), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return acc

    fn = jax.jit(many)
    float(fn(stage, btilde, jump))  # compile + warm (readback = completion)
    # Fresh dir per process: jax.profiler.trace appends timestamped subdirs
    # and the glob would otherwise read a STALE trace from an earlier run
    # (observed: two runs reporting byte-identical microseconds).
    logdir = f"/tmp/mioc_roofline_{L}_{B}_u{unroll}_{os.getpid()}"
    with jax.profiler.trace(logdir):
        float(fn(stage + jnp.float32(1e-5), btilde, jump))

    try:
        by_name, total_s = device_op_times(logdir)
    except Exception as e:  # trace parse failure: report and bail out
        print(f"{name}: trace parse failed: {e}")
        return None
    build_s = matched_time(by_name, "build_tables")
    chase_s = matched_time(by_name, "backtrack")
    if build_s == 0.0:  # fall back: any custom call
        build_s = matched_time(by_name, "custom-call", "custom_call")
    # In-module correction: the build event's window absorbs the chase it
    # overlaps (the build's trailing async U DMAs run under the chase, so
    # the profiler bills the chase's duration to the build event too —
    # verified: event − chase matches both the isolated-dispatch build
    # self-time and bench.py's readback-forced slope to ~1 µs at the conv
    # AND heat shapes).  Round 3's BASELINE_SELF caveat, applied.
    per_build = max(build_s - chase_s, 0.0) / reps
    per_chase = chase_s / reps

    nsteps = nt - 1
    plane = Lp * Bp
    ops = nsteps * plane * ((L - 1) * 4 + (smax + 1) * 5 + 3)
    relax = nt * L * L * B
    u_bytes = nsteps * plane * 4

    t_vpu = ops / VPU_OPS
    t_hbm = u_bytes / HBM_BPS
    bound = max(t_vpu, t_hbm)
    which = "VPU" if t_vpu >= t_hbm else "HBM"
    print(f"{name}  [unroll={unroll}]")
    print(f"  Lp={Lp} Bp={Bp} smax={smax}  per-build {per_build*1e6:8.1f} us, "
          f"per-chase {per_chase*1e6:8.1f} us "
          f"(device total {total_s*1e3:.1f} ms over {reps} pairs)")
    print(f"  achieved {relax/per_build/1e9:7.1f} G relax/s, "
          f"{ops/per_build/1e12:.2f} T elem-ops/s")
    print(f"  model bounds: VPU {t_vpu*1e6:7.1f} us | HBM(U) {t_hbm*1e6:6.1f} us"
          f"  -> {which}-bound roofline {bound*1e6:7.1f} us, achieved "
          f"{bound/per_build*100:5.1f}% of model SoL")
    return per_build


def main():
    import sys

    unrolls = [int(u) for u in sys.argv[1:]] or [4]
    print(f"platform: {jax.devices()[0].platform} "
          f"(pallas={'yes' if pallas_supported() else 'no'})")
    for name, cfg in SHAPES:
        for u in unrolls:
            analyze(name, unroll=u, **cfg)


if __name__ == "__main__":
    main()
