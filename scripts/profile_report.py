"""Summarize a jax.profiler trace: top device ops by self time.

Turns the raw xplane proto that ``--opts jax_profile <dir>``
(solvers/base.py:120-178) or ``jax.profiler.trace`` writes into the
table that drove the round-2 perf work (BASELINE.md "Round-2 perf
investigation") — reproducibly, instead of by hand.

Usage:
  python scripts/profile_report.py <trace_dir> [top_n]

Parses every ``*.xplane.pb`` under the directory, aggregates XEvent
durations per op (on TPU planes; falls back to all device planes) and
prints one JSON line per op: name, total ms, share, occurrences.
"""

import collections
import glob
import json
import os
import sys


def load_xspaces(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(
            "no *.xplane.pb under {}".format(trace_dir)
        )
    spaces = []
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        spaces.append(space)
    return spaces


def op_table(spaces, prefer_tpu=True):
    totals = collections.Counter()
    counts = collections.Counter()
    planes = [pl for sp in spaces for pl in sp.planes]
    if prefer_tpu:
        tpu = [p for p in planes if "TPU" in p.name or "/device" in p.name]
        planes = tpu or planes
    for plane in planes:
        meta = plane.event_metadata
        lines = list(plane.lines)
        # module-level lines duplicate their ops' time — keep op lines only
        op_lines = [ln for ln in lines if ln.name == "XLA Ops"]
        for line in op_lines or lines:
            if "Module" in line.name or line.name == "Steps":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id else "?"
                totals[name] += ev.duration_ps
                counts[name] += 1
    return totals, counts


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    totals, counts = op_table(load_xspaces(trace_dir))
    grand = sum(totals.values()) or 1
    for name, ps in totals.most_common(top_n):
        print(json.dumps({
            "op": name[:120],
            "ms": round(ps / 1e9, 3),
            "share": round(ps / grand, 4),
            "count": counts[name],
        }), flush=True)


if __name__ == "__main__":
    main()
