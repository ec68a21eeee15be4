#!/usr/bin/env python
"""Color decompression example (mirror of example_decode_color.c)."""

import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icer_compression_tpu.models import color
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.utils.colorspace import ycbcr_to_rgb

IN = sys.argv[1] if len(sys.argv) > 1 else "compressed_color.bin"
OUT = sys.argv[2] if len(sys.argv) > 2 else "decompressed_color.png"

data = open(IN, "rb").read()
cfg = CodecConfig(stages=4, filt=0, segments=10)

t0 = time.time()
y, u, v = color.decompress_yuv(data, cfg, dtype=np.uint16)
rgb = ycbcr_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
dt = time.time() - t0
Image.fromarray(rgb).save(OUT)
print(f"decompressed {rgb.shape[1]}x{rgb.shape[0]} in {dt:.3f}s -> {OUT}")
