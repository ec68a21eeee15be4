#!/usr/bin/env python
"""Grayscale decompression example (mirror of example_decode.c).

Parameters must match the encoder (stages=4, filter A, 6 segments).
"""

import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from icer_compression_tpu.models import grayscale
from icer_compression_tpu.models.grayscale import CodecConfig

IN = sys.argv[1] if len(sys.argv) > 1 else "compressed.bin"
OUT = sys.argv[2] if len(sys.argv) > 2 else "decompressed.png"

data = open(IN, "rb").read()
cfg = CodecConfig(stages=4, filt=0, segments=6)

t0 = time.time()
img = np.asarray(grayscale.decompress(data, cfg, dtype=np.uint16))
dt = time.time() - t0
Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(OUT)
print(f"decompressed {img.shape[1]}x{img.shape[0]} in {dt:.3f}s -> {OUT}")
