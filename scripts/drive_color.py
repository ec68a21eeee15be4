#!/usr/bin/env python
"""On-chip drive of the color (YUV) TPU decode path.

Validates the fused three-channel decode program (one device round trip:
all channels' kernels + on-device inverse DWT) against the host decoder,
then reports steady-state wall times.  Also times the jax color encode.

Usage: python scripts/drive_color.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    from PIL import Image
    from icer_compression_tpu.models import color as CM
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.utils.colorspace import rgb_to_ycbcr

    rgb = np.asarray(Image.open("/root/reference/boatcolor.512.bmp")
                     .convert("RGB"))
    y, u, v = (c.astype(np.uint16) for c in rgb_to_ycbcr(rgb))
    h, w = y.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=3 * h * w)
    stream = CM.compress_yuv(y, u, v, cfg)
    print(f"stream {len(stream)} B", flush=True)

    host = CM.decompress_yuv(stream, cfg, dtype=np.uint16)
    t0 = time.time()
    dec = CM.decompress_yuv(stream, cfg, dtype=np.uint16, backend="jax")
    ok = all(np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(dec, host))
    print(f"decode[jax]: first call {time.time()-t0:.1f} s, "
          f"{'PIXEL-OK' if ok else 'MISMATCH'}", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.time()
        d2 = CM.decompress_yuv(stream, cfg, dtype=np.uint16, backend="jax")
        ts.append(time.time() - t0)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(d2, dec))
    print(f"decode[jax]: steady best {min(ts)*1e3:.0f} ms "
          f"median {sorted(ts)[len(ts)//2]*1e3:.0f} ms "
          f"({3*h*w/min(ts)/1e6:.2f} MP/s over 3 planes)", flush=True)

    # host-decode comparison timing
    ts = []
    for _ in range(3):
        t0 = time.time()
        CM.decompress_yuv(stream, cfg, dtype=np.uint16)
        ts.append(time.time() - t0)
    print(f"decode[host]: best {min(ts)*1e3:.0f} ms", flush=True)

    # batched color decode (B x 3 channels in one fused program)
    from icer_compression_tpu.models.decode_jax import (
        decompress_yuv_lanes_batch)
    B = 4
    streams = [stream] * B
    t0 = time.time()
    outs = decompress_yuv_lanes_batch(streams, cfg, dtype=np.uint16)
    ok = all(np.array_equal(np.asarray(a), np.asarray(b))
             for trip in outs for a, b in zip(trip, host))
    print(f"decode[batch B={B}]: first call {time.time()-t0:.1f} s, "
          f"{'PIXEL-OK' if ok else 'MISMATCH'}", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.time()
        decompress_yuv_lanes_batch(streams, cfg, dtype=np.uint16)
        ts.append(time.time() - t0)
    print(f"decode[batch B={B}]: steady best {min(ts)*1e3:.0f} ms "
          f"({min(ts)/B*1e3:.0f} ms/img, "
          f"{B*3*h*w/min(ts)/1e6:.2f} MP/s over planes)", flush=True)

    # jax color encode (sha parity with host encoder)
    t0 = time.time()
    sj = CM.compress_yuv_jax(y, u, v, cfg)
    print(f"encode[jax]: first call {time.time()-t0:.1f} s, "
          f"{'BYTE-OK' if sj == stream else 'MISMATCH'}", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.time()
        s2 = CM.compress_yuv_jax(y, u, v, cfg)
        ts.append(time.time() - t0)
    assert s2 == stream
    print(f"encode[jax]: steady best {min(ts)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
