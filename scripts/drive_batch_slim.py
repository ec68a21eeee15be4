#!/usr/bin/env python
"""On-chip drive of the batched slim encoder: correctness + throughput.

Encodes B distinct 512x512 images in one fused device call (shared wide
entropy kernel blocks), verifies each image's assembled stream is
byte-identical to the host encoder's, and reports steady-state wall time
and MP/s.

Usage: python scripts/drive_batch_slim.py [B...]   (default: 4 8)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]

    from PIL import Image
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    base = np.asarray(Image.open("/root/reference/boat.512.bmp")
                      .convert("L")).astype(np.uint16)
    h, w = base.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)
    rng = np.random.default_rng(0)

    def stream_of(table, ll):
        packets = sort_packets(build_packets_grayscale(w, h, 4, ll, 9))
        nsegs = {(p.decomp_level, p.subband_type): 6 for p in packets}
        t = {(0,) + k: v for k, v in table.items()}
        enc = G.allocate_from_table(packets, t, cfg.byte_quota, nsegs, w, h)
        return G.assemble_stream(enc, rearrange_order_grayscale(9))

    for B in batches:
        imgs = np.stack([
            np.clip(base.astype(np.int32)
                    + rng.integers(-6, 7, base.shape), 0, 255
                    ).astype(np.uint16)
            for _ in range(B)])
        enc = JaxGrayscaleEncoder(w, h, 4, 0, 6, 15, entropy="slim",
                                  batch=B)
        t0 = time.time()
        res = enc.encode_batch(imgs)
        print(f"B={B}: first call {time.time()-t0:.1f} s", flush=True)
        for i in range(B):
            table, ll = res[i]
            assert stream_of(table, ll) == G.compress(imgs[i], cfg), \
                f"B={B} image {i} stream mismatch"
        print(f"B={B}: all {B} streams byte-exact vs host", flush=True)
        ts = []
        for _ in range(4):
            t0 = time.time()
            enc.encode_batch(imgs)
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"B={B}: steady {best*1e3:.0f} ms = {best/B*1e3:.0f} ms/img "
              f"= {B*h*w/best/1e6:.2f} MP/s encode", flush=True)


if __name__ == "__main__":
    main()
