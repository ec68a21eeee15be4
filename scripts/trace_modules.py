#!/usr/bin/env python
"""Per-XLA-module device times from a captured xplane trace.

    python scripts/trace_modules.py TRACE_DIR

The device plane has one line per abstraction level: "XLA Modules" events
are whole-program executions (the reliable per-program device time, immune
to co-tenant host noise); "XLA Ops" events are the per-op self times that
trace_batch.py / trace_table.py aggregate.  This prints each module
execution with its duration, plus per-module op-category splits computed
by timestamp containment.
"""

import glob
import os
import sys


def parse(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            mods = []          # (start_ps, end_ps, name)
            ops = []           # (start_ps, dur_ps, name)
            for line in plane.lines:
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    name = meta.display_name or meta.name
                    row = (ev.offset_ps, ev.duration_ps, name)
                    if "module" in line.name.lower():
                        mods.append(row)
                    elif "op" in line.name.lower():
                        ops.append(row)
            yield plane.name, sorted(mods), sorted(ops)


def cat_of(op):
    return ("sort" if "sort" in op else
            "pallas" if ("custom-call" in op or "tpu_custom" in op
                         or "mosaic" in op.lower() or "run_impl" in op) else
            "copy" if ("copy" in op or "transpose" in op) else
            "gather/scatter" if ("gather" in op or "scatter" in op
                                 or "dynamic" in op) else
            "fusion" if "fusion" in op else "other")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/icer_trace_batch"
    for pname, mods, ops in parse(logdir):
        print(f"=== {pname} ===")
        for ms, md, mn in mods:
            cats = {}
            for s, d, n in ops:
                if s >= ms and s < ms + md:
                    cats[cat_of(n)] = cats.get(cat_of(n), 0) + d
            split = "  ".join(f"{k}={v/1e9:.1f}" for k, v in
                              sorted(cats.items(), key=lambda kv: -kv[1]))
            print(f"  {md/1e9:8.1f} ms  {mn[:60]:60s} {split}")
            if "-v" in sys.argv:
                agg = {}
                for s, d, n in ops:
                    if s >= ms and s < ms + md:
                        t, c = agg.get(n, (0, 0))
                        agg[n] = (t + d, c + 1)
                for n, (t, c) in sorted(agg.items(),
                                        key=lambda kv: -kv[1][0])[:20]:
                    print(f"      {t/1e9:8.2f} ms x{c:<5d} {n[:80]}")


if __name__ == "__main__":
    main()
