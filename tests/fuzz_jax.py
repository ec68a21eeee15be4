#!/usr/bin/env python
"""Randomized differential fuzz of the JAX (XLA/TPU) pipeline vs the
reference build.

Unlike fuzz_oracle.py (which samples random geometry), this harness uses a
small FIXED pool of geometries with random content/quota per trial, so the
XLA programs compile once and every subsequent trial is cheap.  That makes
it runnable on the CPU backend (nightly soak: JAX_PLATFORMS=cpu) and on a
real chip (where each geometry's compile is paid once per process).

Covers: compress_jax (fused encoder, entropy backend per ICER_JAX_ENTROPY),
decompress_lanes (lane-batched decoder, "model" backend by default so it
runs anywhere; set ICER_FUZZ_DECODE_BACKEND=pallas on a chip), and color
via compress_yuv_jax on one geometry.

Run directly: ``python tests/fuzz_jax.py [duration_s] [seed]``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import oracle  # noqa: E402
from icer_compression_tpu.models import grayscale as G  # noqa: E402
from icer_compression_tpu.models.grayscale import CodecConfig  # noqa: E402
from icer_compression_tpu.models.color import compress_yuv_jax  # noqa: E402
from icer_compression_tpu.models.decode_jax import (  # noqa: E402
    decompress_lanes, decompress_yuv_lanes)
from icer_compression_tpu.core.header import scan_bytestream  # noqa: E402

# (w, h, stages, filt, segments) -- chosen to cover odd dims, deep stages,
# all three entropy-length buckets, and a segment count that exercises the
# partition's bottom-region path.
GRAY_POOL = [
    (48, 40, 2, 0, 3),
    (64, 64, 3, 2, 5),
    (96, 80, 4, 1, 6),
    (75, 53, 3, 3, 4),
]
COLOR_GEOM = (64, 48, 3, 0, 4)


def _content(rng, h, w, kind):
    if kind == 0:
        return rng.integers(0, 256, (h, w)).astype(np.uint16)
    if kind == 1:
        base = np.add.outer(np.arange(h) * 3, np.arange(w)) % 200
        return (base + rng.integers(0, 40, (h, w))).astype(np.uint16)
    if kind == 2:
        return ((rng.random((h, w)) < rng.random()).astype(np.uint16)
                * int(rng.integers(1, 512)))
    return np.full((h, w), int(rng.integers(0, 500)), np.uint16)


def main(duration=300, seed=None):
    import contextlib

    import jax

    o = oracle.get_oracle()
    rng = np.random.default_rng(seed)
    dec_backend = os.environ.get("ICER_FUZZ_DECODE_BACKEND", "model")
    # JAX_PLATFORMS is ignored in this environment (the accelerator plugin
    # pins itself as default -- a sitecustomize overwrites the env var at
    # interpreter start); restrict via jax.config BEFORE backend init so a
    # CPU-only run cannot hang on accelerator bring-up (the tunnel can be
    # down), then pin the device the way the test suite does.
    plat = os.environ.get("ICER_FUZZ_PLATFORM", "cpu")
    if plat == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    ctx = (jax.default_device(jax.devices("cpu")[0])
           if plat == "cpu" else contextlib.nullcontext())
    with ctx:
        return _run(o, rng, dec_backend, duration)


def _run(o, rng, dec_backend, duration):
    # Compile warmup, EXCLUDED from the duration clock: one encode per
    # (geometry x quota class) plus one decode and one color trip, so
    # the soak budget buys trials, not compiles (the round-2 soak spent
    # nearly its whole jax slice compiling: 19 trials in 150 s).
    tw = time.time()
    for (w, h, st, f, g) in GRAY_POOL:
        img = _content(rng, h, w, 1)
        for qf in (0.05, 0.2, 0.6, 1.0, 2.0):
            quota = max(64, int(h * w * 2 * qf))
            cfg = CodecConfig(stages=st, filt=f, segments=g,
                              byte_quota=quota)
            s = G.compress_jax(img, cfg)
        decompress_lanes(s, cfg, dtype=np.uint16, backend=dec_backend)
    w, h, st, f, g = COLOR_GEOM
    planes = [_content(rng, h, w, 1) for _ in range(3)]
    for qf in (0.15, 0.6, 1.5):
        quota = max(256, int(h * w * 6 * qf))
        cfg = CodecConfig(stages=st, filt=f, segments=g, byte_quota=quota)
        cs = compress_yuv_jax(*planes, cfg)
    decompress_yuv_lanes(cs, cfg, dtype=np.uint16)
    print(f"jax fuzz warmup {time.time()-tw:.0f} s (excluded)", flush=True)

    t0 = time.time()
    trials = bad = 0
    color_every = 8
    # the model-backend decode dominates trial cost; decoding every 4th
    # gray trial keeps decode coverage while letting the encoder (the
    # jax pipeline's core) rack up trials
    decode_every = 4
    while time.time() - t0 < duration:
        do_color = trials % color_every == color_every - 1
        if do_color:
            w, h, st, f, g = COLOR_GEOM
            planes = [_content(rng, h, w, int(rng.integers(0, 4)))
                      for _ in range(3)]
            qf = rng.choice([0.15, 0.6, 1.5])
            quota = max(256, int(h * w * 6 * qf))
            cfg = CodecConfig(stages=st, filt=f, segments=g,
                              byte_quota=quota)
            trials += 1
            _, cs = o.compress_yuv_u16(*planes, st, f, g, quota)
            ours = compress_yuv_jax(*planes, cfg)
            if ours != cs:
                bad += 1
                print("COLOR ENC MISMATCH", (h, w, st, g, f, float(qf)))
                continue
            chans = {hd.channel for hd, _ in scan_bytestream(cs)}
            if chans != {0, 1, 2}:
                continue  # reference-UB stream (uninitialized ll_mean)
            _, cdec = o.decompress_yuv_u16(cs, st, f, g, h * w * 16)
            ml = decompress_yuv_lanes(cs, cfg, dtype=np.uint16)
            if not all(np.array_equal(a, b) for a, b in zip(ml, cdec)):
                bad += 1
                print("COLOR DEC MISMATCH", (h, w, st, g, f))
            continue

        w, h, st, f, g = GRAY_POOL[trials % len(GRAY_POOL)]
        img = _content(rng, h, w, int(rng.integers(0, 4)))
        qf = rng.choice([0.05, 0.2, 0.6, 1.0, 2.0])
        quota = max(64, int(h * w * 2 * qf))
        cfg = CodecConfig(stages=st, filt=f, segments=g, byte_quota=quota)
        trials += 1
        _, cs = o.compress_u16(img, st, f, g, quota)
        ours = G.compress_jax(img, cfg)
        if ours != cs:
            bad += 1
            print("ENC MISMATCH", (h, w, st, g, f, float(qf)))
            continue
        if trials % decode_every == 0:
            _, cdec = o.decompress_u16(cs, st, f, g, h * w * 8)
            md = np.asarray(decompress_lanes(cs, cfg, dtype=np.uint16,
                                             backend=dec_backend))
            if not np.array_equal(md, cdec):
                bad += 1
                print("DEC MISMATCH", (h, w, st, g, f, float(qf)))
    print(f"jax fuzz [{dec_backend}]: {trials} trials, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    dur = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else None
    sys.exit(main(dur, seed))
