#!/usr/bin/env python
"""Minimal xplane.pb parser: per-op device self-time summary from a JAX
profiler trace (no tensorboard needed — reads the XSpace proto directly via
tensorflow's bundled xplane_pb2).

    env PALLAS_AXON_POOL_IPS= python benchmarks/xplane_ops.py <trace_dir_or_pb> [N]
"""

import glob
import os
import sys
from collections import defaultdict


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xs, top=25):
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        agg = defaultdict(lambda: [0.0, 0])
        # XLA op events live on per-core lines; sum exclusive is hard, use
        # total duration of leaf events (XLA module lines nest: pick the
        # line with the most events — the op line).
        for line in plane.lines:
            if not line.events:
                continue
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                agg[(line.name, name)][0] += ev.duration_ps / 1e9  # -> ms
                agg[(line.name, name)][1] += 1
        by_line = defaultdict(lambda: [0.0, 0])
        for (ln, name), (ms, n) in agg.items():
            by_line[ln][0] += ms
            by_line[ln][1] += n
        print(f"plane: {plane.name}")
        for ln, (ms, n) in sorted(by_line.items(), key=lambda kv: -kv[1][0]):
            print(f"  line {ln!r}: {ms:9.2f} ms total, {n} events")
        if not by_line:
            continue
        # deepest (op-level) line = the one with most events
        opline = max(by_line, key=lambda ln: by_line[ln][1])
        rows = [(name, ms, n) for (ln, name), (ms, n) in agg.items()
                if ln == opline]
        rows.sort(key=lambda r: -r[1])
        print(f"top ops on line {opline!r}:")
        for name, ms, n in rows[:top]:
            print(f"  {ms:9.2f} ms {n:>7}x  {name[:90]}")


if __name__ == "__main__":
    arg = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = ([arg] if arg.endswith(".pb")
             else glob.glob(os.path.join(arg, "**", "*.xplane.pb"),
                            recursive=True))
    for p in paths:
        print(f"== {p} ==")
        summarize(load(p), top)
