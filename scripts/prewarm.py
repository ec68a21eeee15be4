#!/usr/bin/env python
"""Pre-warm the compile caches for flagship codec geometries.

Run once per machine (or after a library update) so that production
processes start at steady state:

    python scripts/prewarm.py [--size 512] [--segments 6] [--stages 4]
                              [--batch 8] [--backends slim,sorted]
                              [--decode]

XLA programs land in the persistent cache (~/.cache/icer_tpu_jax, see
ops/encode_jax._ensure_cache); Mosaic (pallas) kernels are cached by the
remote compile service keyed on the exact kernel source, so re-compiles
in fresh processes drop from minutes to seconds once warmed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--filter", type=int, default=0)
    ap.add_argument("--segments", type=int, default=6)
    ap.add_argument("--batch", type=int, default=56,
                    help="also warm the batched encoder + decoder at "
                         "this B (0 = skip; 56 = bench.py's default "
                         "serving batch)")
    ap.add_argument("--backends", default="slim,sorted")
    ap.add_argument("--decode", action="store_true", default=True)
    ap.add_argument("--no-decode", dest="decode", action="store_false")
    ap.add_argument("--quotas", default="",
                    help="comma-separated byte quotas to warm the "
                         "quota-class encoder variants for (e.g. "
                         "30000,65536)")
    args = ap.parse_args()

    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    n = args.size
    rng = np.random.default_rng(0)
    img = ((np.add.outer(np.arange(n) * 3, np.arange(n)) % 200)
           + rng.integers(0, 40, (n, n))).astype(np.uint16)
    cfg = CodecConfig(stages=args.stages, filt=args.filter,
                      segments=args.segments, byte_quota=n * n)

    stream = None
    for be in args.backends.split(","):
        t0 = time.time()
        enc = JaxGrayscaleEncoder(n, n, args.stages, args.filter,
                                  args.segments, 15, entropy=be)
        table, ll = enc.encode(img)
        print(f"encode[{be}] warm in {time.time()-t0:.0f} s", flush=True)
        if args.batch > 1:
            t0 = time.time()
            encb = JaxGrayscaleEncoder(n, n, args.stages, args.filter,
                                       args.segments, 15, entropy=be,
                                       batch=args.batch)
            bimgs = np.broadcast_to(img, (args.batch,) + img.shape).copy()
            encb.encode_batch(bimgs)          # auto-uint8 upload program
            bimgs[0, 0, 0] = 300              # wide (uint16) upload program
            encb.encode_batch(bimgs)
            print(f"encode[{be}] B={args.batch} warm in "
                  f"{time.time()-t0:.0f} s", flush=True)

    if args.decode:
        stream = G.compress(img, cfg)
        t0 = time.time()
        dec = np.asarray(G.decompress(stream, cfg, dtype=np.uint16,
                                      backend="jax"))
        assert np.array_equal(dec, img), "prewarm decode mismatch"
        dec = np.asarray(G.decompress(stream, cfg, dtype=np.uint16,
                                      backend="jax", pack8=True))
        assert np.array_equal(dec, img), "prewarm pack8 decode mismatch"
        print(f"decode warm in {time.time()-t0:.0f} s", flush=True)
        if args.batch > 1:
            from icer_compression_tpu.models.decode_jax import (
                decompress_lanes_batch)
            t0 = time.time()
            decs = decompress_lanes_batch([stream] * args.batch, cfg,
                                          dtype=np.uint16, pack8=True)
            assert all(np.array_equal(d, img) for d in decs)
            print(f"decode B={args.batch} (pack8) warm in "
                  f"{time.time()-t0:.0f} s", flush=True)
            # the wide (pack8=False) batched program is the exact
            # fallback for >8-bit pixels in a pack8 serving batch; warm
            # it too so the first mixed-depth batch doesn't compile at
            # request time
            t0 = time.time()
            decs = decompress_lanes_batch([stream] * args.batch, cfg,
                                          dtype=np.uint16, pack8=False)
            assert all(np.array_equal(d, img) for d in decs)
            print(f"decode B={args.batch} (wide) warm in "
                  f"{time.time()-t0:.0f} s", flush=True)

    if args.quotas:
        for q in (int(x) for x in args.quotas.split(",")):
            qcfg = CodecConfig(stages=args.stages, filt=args.filter,
                               segments=args.segments, byte_quota=q)
            t0 = time.time()
            s = G.compress_jax(img, qcfg)
            assert s == G.compress(img, qcfg), f"quota {q} mismatch"
            print(f"quota {q} warm in {time.time()-t0:.0f} s", flush=True)
    print("prewarm done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
