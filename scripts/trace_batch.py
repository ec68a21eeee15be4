#!/usr/bin/env python
"""Trace the batched slim encode (and optionally decode) device program and
aggregate per-op self time into coarse categories (sort / fusion / pallas /
copy) plus a top-N table.

    python scripts/trace_batch.py [--batch 8] [--decode] [--top 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from trace_encode import parse_xplanes  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/icer_trace_batch")
    args = ap.parse_args()

    from PIL import Image
    import jax
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    img = np.asarray(Image.open("/root/reference/boat.512.bmp")
                     .convert("L")).astype(np.uint16)
    h, w = img.shape
    B = args.batch
    imgs = np.stack([img] * B)
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)

    enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt, cfg.segments, 15,
                              batch=B, entropy="slim")
    print("warmup...", flush=True)
    t0 = time.time()
    enc.encode_batch(imgs)
    print(f"  warm in {time.time()-t0:.0f}s", flush=True)
    for _ in range(2):
        enc.encode_batch(imgs)

    streams = None
    if args.decode:
        from icer_compression_tpu.models.grayscale import compress_jax
        from icer_compression_tpu.models.decode_jax import (
            decompress_lanes_batch)
        streams = [compress_jax(img, cfg)] * B
        decompress_lanes_batch(streams, cfg, dtype=np.uint16, pack8=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        t0 = time.time()
        enc.encode_batch(imgs)
        enc_t = time.time() - t0
        dec_t = None
        if args.decode:
            t0 = time.time()
            decompress_lanes_batch(streams, cfg, dtype=np.uint16, pack8=True)
            dec_t = time.time() - t0
    print(f"traced encode_batch {enc_t*1e3:.0f} ms wall"
          + (f", decode_batch {dec_t*1e3:.0f} ms" if dec_t else ""),
          flush=True)

    planes = parse_xplanes(args.out)
    for name, rows in planes.items():
        if "TPU" not in name and "device" not in name.lower():
            continue
        total = sum(us for _, us, _ in rows)
        cats = {}
        for op, us, n in rows:
            k = ("sort" if "sort" in op else
                 "pallas" if ("custom-call" in op or "tpu_custom" in op
                              or "mosaic" in op.lower()) else
                 "copy/transpose" if ("copy" in op or "transpose" in op) else
                 "gather/scatter" if ("gather" in op or "scatter" in op
                                      or "dynamic" in op) else
                 "fusion" if "fusion" in op else "other")
            cats[k] = cats.get(k, 0) + us
        print(f"\n=== {name}  total {total/1e3:.1f} ms ===")
        for k, us in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {us/1e3:9.2f} ms  {k}")
        print("  --- top ops ---")
        for op, us, n in rows[:args.top]:
            print(f"  {us/1e3:9.2f} ms  x{n:<5d} {op[:100]}")


if __name__ == "__main__":
    main()
