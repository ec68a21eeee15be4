#!/usr/bin/env python
"""Color compression example (mirror of example_encode_color.c):
RGB -> YCbCr integer conversion, stages=4, filter A, 10 segments,
100000-byte quota."""

import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icer_compression_tpu.models import color
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.utils.colorspace import rgb_to_ycbcr

IN = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/boatcolor.512.bmp"
OUT = sys.argv[2] if len(sys.argv) > 2 else "compressed_color.bin"

rgb = np.asarray(Image.open(IN).convert("RGB").resize((512, 512)))
y, u, v = rgb_to_ycbcr(rgb)
cfg = CodecConfig(stages=4, filt=0, segments=10, byte_quota=100000)

t0 = time.time()
stream = color.compress_yuv(y.astype(np.uint16), u.astype(np.uint16),
                            v.astype(np.uint16), cfg)
dt = time.time() - t0
open(OUT, "wb").write(stream)
print(f"compressed size {len(stream)}, time taken: {dt:.3f}s -> {OUT}")
