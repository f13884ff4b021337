#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb into per-op device-time aggregates.

Usage:
  python tools/parse_xplane.py /tmp/jtrace [n_steps] [top_k]

`n_steps` divides the totals (pass the number of identical steps captured
inside the trace context) so numbers read as ms/step. The xplane proto is
vendored by tensorflow (tensorflow.tsl.profiler.protobuf) — no network.

This is how the round-2 train-step attribution was produced
(docs/ROUND2_NOTES.md): run a warmed-up step a few times inside
`with jax.profiler.trace(dir):`, then point this tool at the dir.
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def load_tpu_plane(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tpu = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not tpu:
        raise RuntimeError(f"no TPU plane; planes = {[p.name for p in xs.planes]}")
    return tpu[0]


def aggregate(plane, line_name: str = "XLA Ops"):
    em = {m.id: m.name for m in plane.event_metadata.values()}
    lines = [l for l in plane.lines if l.name == line_name]
    agg: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for line in lines:
        for ev in line.events:
            name = em.get(ev.metadata_id, "?")
            agg[name] += ev.duration_ps / 1e9  # -> ms
            cnt[name] += 1
    return agg, cnt


def main() -> None:
    trace_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    plane = load_tpu_plane(trace_dir)
    agg, cnt = aggregate(plane)
    total = sum(agg.values()) / n_steps
    print(f"device total: {total:.2f} ms/step ({len(agg)} distinct ops)")
    print(f"\ntop {top_k} ops (ms/step):")
    for name, ms in agg.most_common(top_k):
        print(f"  {ms / n_steps:8.3f}  x{cnt[name] // max(n_steps, 1):4d}  {name[:120]}")
    # crude shape-class rollup: group by the largest tensor shape mentioned
    groups: collections.Counter = collections.Counter()
    for name, ms in agg.items():
        shapes = re.findall(r"\[([0-9,]+)\]", name)
        key = max(shapes, key=lambda s: eval(s.replace(",", "*")) if s else 0) if shapes else "scalar"
        groups[key] += ms
    print("\nby dominant shape (ms/step):")
    for key, ms in groups.most_common(15):
        print(f"  {ms / n_steps:8.3f}  [{key}]")


if __name__ == "__main__":
    main()
