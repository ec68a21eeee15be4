#!/usr/bin/env python
"""Join a captured xplane trace with the optimized HLO dump to produce a
per-op cost table with source attribution.

    python scripts/trace_table.py TRACE_DIR [HLO_FILE] [--top N]

For each XLA op in the device plane, aggregates self time per op name and
looks the name up in the HLO text to recover the op_name/source_file
metadata (the jax source line that produced it).  Output: one table per
XLA module (program), most expensive first.
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def load_hlo_meta(path):
    meta = {}
    pat = re.compile(r"%(\S+?) = .*?metadata=\{([^}]*)\}")
    src = re.compile(r'op_name="([^"]*)"(?:.*?source_file="([^"]*)")?'
                     r'(?:.*?source_line=(\d+))?')
    for line in open(path):
        m = pat.search(line)
        if not m:
            continue
        name = m.group(1)
        s = src.search(m.group(2))
        if s:
            op = s.group(1)
            if s.group(2):
                op += f"  [{s.group(2).rsplit('/',1)[-1]}:{s.group(3)}]"
            meta[name] = op
    return meta


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 25
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])
    trace_dir = args[0]
    hlo_meta = load_hlo_meta(args[1]) if len(args) > 1 else {}

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for p in glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name:
                continue
            lines = {l.name: l for l in plane.lines}
            if "XLA Modules" not in lines:
                continue
            mods = sorted(
                (ev.offset_ps, ev.offset_ps + ev.duration_ps,
                 plane.event_metadata[ev.metadata_id].display_name
                 or plane.event_metadata[ev.metadata_id].name,
                 ev.duration_ps / 1e9)
                for ev in lines["XLA Modules"].events)
            per_mod = [collections.defaultdict(lambda: [0.0, 0])
                       for _ in mods]
            for ev in lines.get("XLA Ops", type("e", (), {"events": []})
                                ).events:
                md = plane.event_metadata[ev.metadata_id]
                name = md.display_name or md.name
                mid = ev.offset_ps + ev.duration_ps / 2
                for i, (s, e, _, _) in enumerate(mods):
                    if s <= mid <= e:
                        rec = per_mod[i][name]
                        rec[0] += ev.duration_ps / 1e9
                        rec[1] += 1
                        break
            for i, (s, e, name, dur) in enumerate(mods):
                print(f"\n=== module {name} ({dur:.1f} ms) ===")
                rows = sorted(per_mod[i].items(), key=lambda kv: -kv[1][0])
                for opname, (ms, n) in rows[:top]:
                    src = hlo_meta.get(opname, "")
                    print(f"  {ms:8.2f} ms x{n:<4d} {opname:28s} {src[:110]}")


if __name__ == "__main__":
    sys.exit(main())
