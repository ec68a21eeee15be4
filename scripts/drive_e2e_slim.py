#!/usr/bin/env python
"""On-chip end-to-end drive of the slim entropy backend.

Encodes the 512x512 boat image (stages=4, filter A, 6 segments, lossless
quota) through the fused TPU encoder with entropy="slim" at one or more
lane widths, sha-verifies the stream against the golden reference stream,
and reports steady-state wall time (the stream fetch forces
materialization, so wall == honest device+transfer time).

Usage: python scripts/drive_e2e_slim.py [widths...]   (default: 512 1024)
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    widths = [int(a) for a in sys.argv[1:]] or [512, 1024]

    from PIL import Image
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import (CodecConfig,
                                                       _JAX_ENCODERS)
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    img = np.asarray(
        Image.open("/root/reference/boat.512.bmp").convert("L")
    ).astype(np.uint16)
    h, w = img.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)
    golden = open(os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "golden_boat512.sha256")).read().split()[0]

    key = (w, h, 4, 0, 6, 15)
    for width in widths:
        os.environ["ICER_PALLAS_WIDTH"] = str(width)
        _JAX_ENCODERS.clear()
        _JAX_ENCODERS[key] = JaxGrayscaleEncoder(w, h, 4, 0, 6, 15,
                                                 entropy="slim")
        t0 = time.time()
        stream = G.compress_jax(img, cfg)
        sha = hashlib.sha256(stream).hexdigest()
        print(f"width={width}: first call {time.time()-t0:.1f} s, "
              f"{len(stream)} B, sha {'OK' if sha == golden else 'MISMATCH'}",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.time()
            s2 = G.compress_jax(img, cfg)
            ts.append(time.time() - t0)
        assert s2 == stream
        print(f"width={width}: steady wall best {min(ts)*1e3:.0f} ms "
              f"median {sorted(ts)[len(ts)//2]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
