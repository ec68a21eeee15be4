#!/usr/bin/env python
"""In-process wall for the production batched decode at B images.

Steady-state best-of-N of decompress_lanes_batch on the boat.512 lossless
stream replicated B times, plus the same call with defer (dispatch
overlap), giving the honest decode wall this session.  Compare against
the decode kernel-only number (scripts/bench_decode_kernel.py) to split
kernel vs assembly/transfer/dispatch.

Usage: python scripts/probe_decode_wall.py [B]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    from PIL import Image
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.models.decode_jax import decompress_lanes_batch

    img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    img = img.astype(np.uint16)
    h, w = img.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)
    stream = G.compress(img, cfg)
    streams = [stream] * B

    t0 = time.time()
    decs = decompress_lanes_batch(streams, cfg, dtype=np.uint16, pack8=True)
    print(f"first call {time.time()-t0:.1f}s, "
          f"exact={all(np.array_equal(d, img) for d in decs)}", flush=True)

    ts = []
    for _ in range(5):
        t0 = time.time()
        decompress_lanes_batch(streams, cfg, dtype=np.uint16, pack8=True)
        ts.append(time.time() - t0)
    bw = min(ts)
    print(f"steady wall: {bw*1e3:.1f} ms/batch  ({bw*1e3/B:.2f} ms/img)",
          flush=True)


if __name__ == "__main__":
    main()
