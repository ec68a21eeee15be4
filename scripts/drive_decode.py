#!/usr/bin/env python
"""On-chip drive of the TPU lane decoder (single-image + batched).

Validates the fused pallas decode path against the host decoder on the
512x512 boat image (lossless, stages=4, filter A, 6 segments), including
a truncated stream, then reports steady-state wall times with forced
materialization.

Usage: python scripts/drive_decode.py [B]    (default B=8)
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from PIL import Image
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.models.decode_jax import (
        decompress_lanes_batch)
    from icer_compression_tpu.utils.faults import truncate

    img = np.asarray(
        Image.open("/root/reference/boat.512.bmp").convert("L")
    ).astype(np.uint16)
    h, w = img.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)
    stream = G.compress(img, cfg)

    # single image
    t0 = time.time()
    dec = np.asarray(G.decompress(stream, cfg, dtype=np.uint16,
                                  backend="jax"))
    print(f"single: first call {time.time()-t0:.1f} s, "
          f"{'PIXEL-OK' if np.array_equal(dec, img) else 'MISMATCH'}",
          flush=True)
    ts = []
    for _ in range(5):
        t0 = time.time()
        d2 = np.asarray(G.decompress(stream, cfg, dtype=np.uint16,
                                     backend="jax"))
        ts.append(time.time() - t0)
    assert np.array_equal(d2, dec)
    print(f"single: steady best {min(ts)*1e3:.0f} ms "
          f"median {sorted(ts)[len(ts)//2]*1e3:.0f} ms", flush=True)

    # truncated stream must match the host decoder exactly
    tr = truncate(stream, 0.35)
    dh = G.decompress(tr, cfg, dtype=np.uint16)
    dj = np.asarray(G.decompress(tr, cfg, dtype=np.uint16, backend="jax"))
    print(f"truncated 35%: "
          f"{'PIXEL-OK' if np.array_equal(dh, dj) else 'MISMATCH'}",
        flush=True)

    if B > 1:
        rng = np.random.default_rng(0)
        imgs = np.stack([
            np.clip(img.astype(np.int32) + rng.integers(-6, 7, img.shape),
                    0, 255).astype(np.uint16) for _ in range(B)])
        imgs[0] = img
        streams = [G.compress(i, cfg) for i in imgs]
        t0 = time.time()
        decs = decompress_lanes_batch(streams, cfg, dtype=np.uint16)
        ok = all(np.array_equal(d, i) for d, i in zip(decs, imgs))
        print(f"batch B={B}: first call {time.time()-t0:.1f} s, "
              f"{'PIXEL-OK' if ok else 'MISMATCH'}", flush=True)
        ts = []
        for _ in range(4):
            t0 = time.time()
            decs = decompress_lanes_batch(streams, cfg, dtype=np.uint16)
            ts.append(time.time() - t0)
        print(f"batch B={B}: steady best {min(ts)*1e3:.0f} ms "
              f"({min(ts)/B*1e3:.0f} ms/img, "
              f"{B*h*w/min(ts)/1e6:.2f} MP/s decode)", flush=True)


if __name__ == "__main__":
    main()
