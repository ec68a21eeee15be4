#!/usr/bin/env python
"""Phase breakdown of the pipelined serving mode at one batch size.

Times, per steady-state batch: encode dispatch (host prep + async call),
encode collect (fetch + unpack + host fallbacks), python stream assembly,
decode prep+dispatch, decode collect.  Identifies whether the pipeline
period is host-, transfer- or device-bound.

Usage: python scripts/probe_pipe_phases.py [B]   (default 14)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 14

    from PIL import Image
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.decode_jax import (
        decompress_lanes_batch)
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    img = np.asarray(Image.open("/root/reference/boat.512.bmp")
                     .convert("L")).astype(np.uint16)
    h, w = img.shape
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=h * w)
    ref = G.compress(img, cfg)
    rng = np.random.default_rng(0)
    imgs = np.stack([
        np.clip(img.astype(np.int32) + rng.integers(-6, 7, img.shape),
                0, 255).astype(np.uint16) for _ in range(B)])
    imgs[0] = img
    enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt, cfg.segments,
                              15, batch=B, entropy="slim")

    def finish(res):
        streams = []
        for (table, ll) in res:
            packets = sort_packets(build_packets_grayscale(
                w, h, cfg.stages, ll, 9))
            nsegs = {(p.decomp_level, p.subband_type): cfg.segments
                     for p in packets}
            t = {(0,) + k: v for k, v in table.items()}
            e = G.allocate_from_table(packets, t, cfg.byte_quota,
                                      nsegs, w, h)
            streams.append(G.assemble_stream(
                e, rearrange_order_grayscale(9)))
        return streams

    # warm
    streams = finish(enc.encode_batch(imgs, defer=True)())
    assert streams[0] == ref
    decompress_lanes_batch(streams, cfg, dtype=np.uint16, pack8=True)

    for it in range(4):
        t0 = time.time()
        hold = enc.encode_batch(imgs, defer=True)
        t1 = time.time()
        res = hold()
        t2 = time.time()
        streams = finish(res)
        t3 = time.time()
        dh = decompress_lanes_batch(streams, cfg, dtype=np.uint16,
                                    defer=True, pack8=True)
        t4 = time.time()
        dh()
        t5 = time.time()
        print(f"it{it}: enc dispatch {1e3*(t1-t0):6.1f}  "
              f"enc collect {1e3*(t2-t1):6.1f}  "
              f"assemble {1e3*(t3-t2):6.1f}  "
              f"dec dispatch {1e3*(t4-t3):6.1f}  "
              f"dec collect {1e3*(t5-t4):6.1f}  ms/batch (B={B})",
              flush=True)


if __name__ == "__main__":
    main()
