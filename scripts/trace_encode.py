#!/usr/bin/env python
"""jax.profiler trace harness for the TPU encode/decode pipeline.

Captures a profiler trace of one steady-state fused encode (and optionally
one lane decode), then parses the xplane proto into a per-op cost table
(top ops by self time) so kernel-level attribution is committed alongside
the wall-clock Δ-ablation numbers in PERF_NOTES.md.

Usage:
    python scripts/trace_encode.py [--size 512] [--decode] [--out DIR]

Notes: on the remotely-attached axon backend device-side planes may be
absent; the harness reports whatever planes the runtime exposes (host
python/runtime planes at minimum) and says so.  On JAX_PLATFORMS=cpu it
attributes the XLA CPU kernels, which share program structure with the
TPU lowering.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_xplanes(logdir):
    """Return {plane_name: [(op, self_time_us, count)]} from the trace."""
    # the xplane proto ships inside tensorflow's tsl tree in this image
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    out = {}
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            evs = {}
            for line in plane.lines:
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    name = meta.display_name or meta.name
                    dur, n = evs.get(name, (0, 0))
                    evs[name] = (dur + ev.duration_ps / 1e6, n + 1)
            rows = sorted(((name, us, n) for name, (us, n) in evs.items()),
                          key=lambda r: -r[1])
            if rows:
                out[plane.name] = rows
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--decode", action="store_true",
                    help="also trace one lane-batched decode")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="/tmp/icer_trace")
    ap.add_argument("--platform", default="device", choices=["device", "cpu"],
                    help="cpu forces host execution via jax.default_device "
                         "(JAX_PLATFORMS is ignored in this environment)")
    args = ap.parse_args()

    from PIL import Image
    import jax

    if args.platform == "cpu":
        import contextlib
        ctx = jax.default_device(jax.devices("cpu")[0])
    else:
        import contextlib
        ctx = contextlib.nullcontext()

    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    ref = "/root/reference/boat.512.bmp"
    img = np.asarray(Image.open(ref).convert("L").resize(
        (args.size, args.size))).astype(np.uint16)
    h, w = img.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)

    with ctx:
        print("warmup (pays compilation)...", flush=True)
        t0 = time.time()
        stream = G.compress_jax(img, cfg)
        print(f"  encode warm in {time.time()-t0:.0f} s "
              f"({len(stream)} bytes)", flush=True)
        if args.decode:
            t0 = time.time()
            G.decompress(stream, cfg, dtype=np.uint16, backend="jax")
            print(f"  decode warm in {time.time()-t0:.0f} s", flush=True)

        os.makedirs(args.out, exist_ok=True)
        with jax.profiler.trace(args.out):
            t0 = time.time()
            s2 = G.compress_jax(img, cfg)
            enc_t = time.time() - t0
            dec_t = None
            if args.decode:
                t0 = time.time()
                G.decompress(stream, cfg, dtype=np.uint16, backend="jax")
                dec_t = time.time() - t0
    assert s2 == stream
    print(f"traced encode {enc_t*1e3:.0f} ms"
          + (f", decode {dec_t*1e3:.0f} ms" if dec_t else ""), flush=True)

    planes = parse_xplanes(args.out)
    if not planes:
        print("no xplane data captured (backend exposes no profiler "
              "planes); rely on the Δ-ablation tables in PERF_NOTES.md")
        return 1
    for name, rows in planes.items():
        total = sum(us for _, us, _ in rows)
        print(f"\n=== plane: {name}  (total {total/1e3:.1f} ms, "
              f"{len(rows)} distinct ops) ===")
        for op, us, n in rows[:args.top]:
            print(f"  {us/1e3:9.2f} ms  x{n:<6d} {op[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
