#!/usr/bin/env python
"""Grayscale compression example.

Mirrors the reference example program example/src/example_encode.c:
512x512 grayscale, stages=4, filter A, 6 segments, 30000-byte quota.
"""

import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icer_compression_tpu.models import grayscale
from icer_compression_tpu.models.grayscale import CodecConfig

IN = sys.argv[1] if len(sys.argv) > 1 else "tests/data/boat.512.png"
OUT = sys.argv[2] if len(sys.argv) > 2 else "compressed.bin"

img = np.asarray(
    Image.open(IN).convert("L").resize((512, 512))).astype(np.uint16)
cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=30000)

t0 = time.time()
stream = grayscale.compress(img, cfg)
dt = time.time() - t0
open(OUT, "wb").write(stream)
print(f"compressed size {len(stream)}, time taken: {dt:.3f}s")
print(f"output saved to {OUT}")
