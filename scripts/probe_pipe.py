#!/usr/bin/env python
"""Pipelined serving-mode sweep: encode+decode MP/s at several batch
sizes / pipeline depths (the bench.py tpu_pipelined mode, isolated).

Usage: python scripts/probe_pipe.py [B ...]   (default: 12 14 28)
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [12, 14, 28]
    K = int(os.environ.get("ICER_BENCH_PIPE", "4"))

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
    px = h * w
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=px)
    ref = G.compress(img, cfg)
    rng = np.random.default_rng(0)

    for B in batches:
        imgs = np.stack([
            np.clip(img.astype(np.int32) + rng.integers(-6, 7, img.shape),
                    0, 255).astype(np.uint16) for _ in range(B)])
        imgs[0] = img
        enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt, cfg.segments,
                                  15, batch=B, entropy="slim")
        # serving-mode transfer trims ride encode_batch's auto-uint8
        # upload path (same path bench.py exercises) and the pack8
        # pixel fetch with its exact wide fallback
        imgs_up = imgs

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

        def encode_pipe():
            out, hold = [], None
            for _ in range(K):
                nxt = enc.encode_batch(imgs_up, defer=True)
                if hold is not None:
                    out.extend(finish(hold()))
                hold = nxt
            out.extend(finish(hold()))
            return out

        streams = encode_pipe()
        assert streams[0] == ref, "stream mismatch"
        decs = decompress_lanes_batch(streams[:B], cfg, dtype=np.uint16,
                                      pack8=True)
        assert all(np.array_equal(d, i) for d, i in zip(decs, imgs))

        def decode_pipe():
            out, hold = [], None
            for _ in range(K):
                nxt = decompress_lanes_batch(streams[:B], cfg,
                                             dtype=np.uint16, defer=True,
                                             pack8=True)
                if hold is not None:
                    out.extend(hold())
                hold = nxt
            out.extend(hold())
            return out

        decode_pipe()
        best_e = min(_t(encode_pipe) for _ in range(3)) / K
        best_d = min(_t(decode_pipe) for _ in range(3)) / K
        mps = B * px / (best_e + best_d) / 1e6
        print(f"B={B} K={K}: encode {best_e/B*1e3:.1f} ms/img, decode "
              f"{best_d/B*1e3:.1f} ms/img, combined {mps:.2f} MP/s",
              flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
