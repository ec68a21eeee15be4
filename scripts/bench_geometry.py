#!/usr/bin/env python
"""On-chip geometry sweep of the batched serving path (VERDICT r3 #8).

Runs the batched encode + decode pipelines at geometries beyond the
512^2 headline -- 1024^2 and a non-square odd size -- verifying every
stream byte-exact against the host reference encoder and every decode
pixel-exact, and reporting wall MP/s.  Proves the 3072-lane encode
kernel ceiling and the decode bucket planner hold at larger/irregular
shapes (the encode kernel's VMEM footprint is chunk x lanes --
independent of the emission length; the decode canvas streams through
HBM via the rolling row window).

Usage: python scripts/bench_geometry.py [WxH] [B]
Defaults: sweep [(1024,1024,B=7), (999,601,B=7)].
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def best(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_one(w, h, B):
    from PIL import Image
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.models.decode_jax import decompress_lanes_batch
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)

    base = np.asarray(Image.open("tests/data/boat.512.png").convert("L"))
    reps_y = -(-h // base.shape[0])
    reps_x = -(-w // base.shape[1])
    big = np.tile(base, (reps_y, reps_x))[:h, :w]
    rng = np.random.default_rng(0)
    imgs = np.stack([
        np.clip(big.astype(np.int32) + rng.integers(-6, 7, big.shape),
                0, 255).astype(np.uint16) for _ in range(B)])
    px = h * w
    cfg = CodecConfig(stages=4, filt=0, segments=6, byte_quota=px)

    # host reference streams (the exactness oracle)
    t0 = time.time()
    refs = [G.compress(imgs[i], cfg) for i in range(B)]
    print(f"  host reference encode: {time.time()-t0:.1f}s "
          f"({len(refs[0])} B first stream)", flush=True)

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
            e = G.allocate_from_table(packets, t, cfg.byte_quota, nsegs,
                                      w, h)
            streams.append(G.assemble_stream(
                e, rearrange_order_grayscale(9)))
        return streams

    t0 = time.time()
    streams = finish(enc.encode_batch(imgs))
    print(f"  encode warmup (compile): {time.time()-t0:.1f}s", flush=True)
    enc_ok = all(s == r for s, r in zip(streams, refs))

    t0 = time.time()
    decs = decompress_lanes_batch(streams, cfg, dtype=np.uint16,
                                  pack8=True)
    print(f"  decode warmup (compile): {time.time()-t0:.1f}s", flush=True)
    dec_ok = all(np.array_equal(d, i) for d, i in zip(decs, imgs))

    benc = best(lambda: finish(enc.encode_batch(imgs)))
    bdec = best(lambda: decompress_lanes_batch(streams, cfg,
                                               dtype=np.uint16,
                                               pack8=True))
    mps = B * px / (benc + bdec) / 1e6
    print(f"  {w}x{h} B={B}: encode {benc*1e3:.0f} ms/batch, decode "
          f"{bdec*1e3:.0f} ms/batch -> {mps:.3f} MP/s combined; "
          f"streams_exact={enc_ok} pixels_exact={dec_ok}", flush=True)
    return {"w": w, "h": h, "B": B, "encode_s": round(benc, 4),
            "decode_s": round(bdec, 4), "MPs": round(mps, 3),
            "streams_exact": enc_ok, "pixels_exact": dec_ok}


def main():
    cases = [(1024, 1024, 7), (999, 601, 7)]
    if len(sys.argv) > 1 and "x" in sys.argv[1]:
        w, h = map(int, sys.argv[1].split("x"))
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 7
        cases = [(w, h, B)]
    out = []
    for (w, h, B) in cases:
        print(f"geometry {w}x{h} B={B}:", flush=True)
        out.append(run_one(w, h, B))
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
