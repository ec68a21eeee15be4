#!/usr/bin/env python
"""Device-time batch sweep: encode/decode device ms/img at several B.

Same methodology as bench.py's `device` section (VERDICT r4 item 3):
for each B the four walls -- encode floor, encode full, decode floor,
decode full -- sample INTERLEAVED in one loop, best-of-N each, and the
floor subtraction is clamped at 0.  The floor programs reproduce the
exact transfer shapes, so the deltas are pure device compute and the
comparison across B is regime-immune.

Usage: python scripts/probe_device_b.py [B ...]   (default: 56 112)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [56, 112]
    reps = 5

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.decode_jax import (
        decompress_lanes_batch)
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.ops.encode_jax import (JaxGrayscaleEncoder,
                                                     _ensure_cache)
    _ensure_cache()

    img = np.asarray(Image.open("tests/data/boat.512.png")
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
        enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt,
                                  cfg.segments, 15, batch=B,
                                  entropy="slim")
        up8 = imgs.astype(np.uint8)

        t0 = time.time()
        res = enc.encode_batch(imgs)
        warm_e = time.time() - t0
        from icer_compression_tpu.core.packets import (
            build_packets_grayscale, rearrange_order_grayscale,
            sort_packets)
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
        import os
        noverify = os.environ.get("ICER_PDB_NOVERIFY") == "1"
        assert noverify or streams[0] == ref, "stream mismatch"
        t0 = time.time()
        decs = decompress_lanes_batch(streams, cfg, dtype=np.uint16,
                                      pack8=True)
        warm_d = time.time() - t0
        assert noverify or all(
            np.array_equal(d, i) for d, i in zip(decs, imgs))

        full_n = int(enc._fused(jnp.asarray(up8)).shape[0])

        @jax.jit
        def _enc_floor(x, full_n=full_n):
            return jnp.zeros((full_n,), jnp.int32).at[0].set(
                x.astype(jnp.int32).sum())

        sbytes = np.frombuffer(b"".join(streams), np.uint8)
        out_words = B * ((px + 3) // 4) + 1024

        @jax.jit
        def _dec_floor(s, out_words=out_words):
            return jnp.zeros((out_words,), jnp.int32).at[0].set(
                s.astype(jnp.int32).sum())

        np.asarray(_enc_floor(up8))
        np.asarray(_dec_floor(sbytes))

        def bracketed(floor_fn, wall_fn):
            """min over per-iteration bracketed diffs (see bench.py)."""
            fs, ws = [], []
            for _ in range(reps):
                t0 = time.perf_counter()
                floor_fn()
                fs.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                wall_fn()
                ws.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            floor_fn()
            fs.append(time.perf_counter() - t0)
            diffs = sorted(w - (fs[i] + fs[i + 1]) / 2
                           for i, w in enumerate(ws))
            dev = diffs[len(diffs) // 2]   # median (see bench.py)
            return max(0.0, dev), min(fs), min(ws)

        enc_dev, fe, we = bracketed(
            lambda: np.asarray(_enc_floor(up8)),
            lambda: np.asarray(enc._fused(jnp.asarray(up8))))
        dec_dev, fd, wd = bracketed(
            lambda: np.asarray(_dec_floor(sbytes)),
            lambda: decompress_lanes_batch(streams, cfg,
                                           dtype=np.uint16, pack8=True))
        enc_ms = enc_dev * 1e3 / B
        dec_ms = dec_dev * 1e3 / B
        ceil = px / 1e6 / ((enc_ms + dec_ms) / 1e3) \
            if enc_ms + dec_ms else float("inf")
        print(f"B={B}: device encode {enc_ms:.2f} ms/img, decode "
              f"{dec_ms:.2f} ms/img, ceiling {ceil:.1f} MP/s  "
              f"(floors e/d {fe*1e3:.0f}/{fd*1e3:.0f} ms, walls "
              f"{we*1e3:.0f}/{wd*1e3:.0f} ms; warmup {warm_e:.0f}/"
              f"{warm_d:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
