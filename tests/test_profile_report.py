"""profile_report: xplane aggregation on a synthetic trace proto."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_profile_report_aggregates_ops(tmp_path):
    xplane_pb2 = pytest.importorskip(
        "tensorflow.tsl.profiler.protobuf.xplane_pb2"
    )

    space = xplane_pb2.XSpace()
    plane = space.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "%fusion.slow"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "%conv.fast"

    ops = plane.lines.add()
    ops.name = "XLA Ops"
    for md, dur in [(1, 3_000_000), (1, 3_000_000), (2, 2_000_000)]:
        ev = ops.events.add()
        ev.metadata_id = md
        ev.duration_ps = dur

    # a module line that would double-count if not filtered
    mod = plane.lines.add()
    mod.name = "XLA Modules"
    ev = mod.events.add()
    ev.metadata_id = 1
    ev.duration_ps = 8_000_000

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with open(d / "host.xplane.pb", "wb") as f:
        f.write(space.SerializeToString())

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/profile_report.py"),
         str(tmp_path), "5"],
        capture_output=True, text=True, check=True,
    )
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    assert [r["op"] for r in rows] == ["%fusion.slow", "%conv.fast"]
    assert rows[0]["count"] == 2
    assert abs(rows[0]["share"] - 0.75) < 1e-6
