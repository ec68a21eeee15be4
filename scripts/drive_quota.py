#!/usr/bin/env python
"""On-chip drive of quota-aware TPU encoding.

Encodes the 512x512 boat image at several byte quotas through
compress_jax (priority-prefix plane-cut encoder variants), verifies each
stream byte-identical to the host encoder's, and reports steady-state
wall times (forced materialization) against the lossless encode.

Usage: python scripts/drive_quota.py [quotas...]  (default 30000 65536 262144)
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    quotas = [int(a) for a in sys.argv[1:]] or [30000, 65536, 262144]

    from PIL import Image
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    os.environ.setdefault("ICER_JAX_ENTROPY", "slim")
    img = np.asarray(
        Image.open("/root/reference/boat.512.bmp").convert("L")
    ).astype(np.uint16)
    h, w = img.shape

    for quota in quotas:
        cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=quota)
        host = G.compress(img, cfg)
        t0 = time.time()
        s = G.compress_jax(img, cfg)
        warm = time.time() - t0
        ok = s == host
        ts = []
        for _ in range(5):
            t0 = time.time()
            s2 = G.compress_jax(img, cfg)
            ts.append(time.time() - t0)
        assert s2 == s
        print(f"quota={quota}: {len(s)} B, "
              f"{'BYTE-OK' if ok else 'MISMATCH'}, warm {warm:.1f} s, "
              f"steady best {min(ts)*1e3:.0f} ms "
              f"median {sorted(ts)[len(ts)//2]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
