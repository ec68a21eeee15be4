#!/usr/bin/env python
"""Randomized color (YUV) differential fuzz vs the reference build.

Covers encode parity, decode parity (production + lane-batched decoder),
within the defined-behavior envelope: streams where the quota cut removed
every segment of a channel are skipped -- the reference decoder then adds
an UNINITIALIZED stack value as that channel's LL mean
(icer_color.c:555/229, see ROADMAP.md known quirks); we use mean 0.

Run directly with an optional duration in seconds (default 300).
"""

import sys, time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
import oracle
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.models.color import compress_yuv, decompress_yuv
from icer_compression_tpu.models.decode_jax import decompress_yuv_lanes
o = oracle.get_oracle()
dur = int(sys.argv[1]) if len(sys.argv) > 1 else 300
_seed = int(sys.argv[2]) if len(sys.argv) > 2 else None
rng = np.random.default_rng(_seed)
t0 = time.time(); trials = bad = 0
while time.time() - t0 < dur:
    h = int(rng.integers(8, 96)); w = int(rng.integers(8, 96))
    st = int(rng.integers(1, 5))
    if min(-(-w // (1 << st)), -(-h // (1 << st))) < 3: continue
    from icer_compression_tpu.models.grayscale import all_subbands
    from icer_compression_tpu.core.subbands import subband_view
    minpix = min(subband_view(w, h, s_, sb).h * subband_view(w, h, s_, sb).w
                 for (s_, sb) in all_subbands(st))
    g = int(rng.integers(1, min(16, minpix) + 1))
    f = int(rng.integers(0, 7))
    qf = rng.choice([0.15, 0.6, 1.5])
    u8 = bool(rng.integers(0, 2))
    if u8:
        planes = [(rng.integers(0, 100, (h, w))
                   + rng.integers(0, 26, (h, w))).astype(np.uint8)
                  for _ in range(3)]
    else:
        planes = [rng.integers(0, 256, (h, w)).astype(np.uint16)
                  for _ in range(3)]
    quota = max(256, int(h * w * (3 if u8 else 6) * qf))
    trials += 1
    comp = o.compress_yuv_u8 if u8 else o.compress_yuv_u16
    _, cs = comp(*planes, st, f, g, quota)
    cfg = CodecConfig(stages=st, filt=f, segments=g, byte_quota=quota)
    try:
        ours = compress_yuv(*planes, cfg)
    except Exception as e:
        # uint8 DWT overflow parity: the reference returns an error and
        # writes nothing; we raise.
        if len(cs) == 0:
            continue
        bad += 1; print("ENC RAISES but C produced bytes", (h, w, st, g, f), e)
        continue
    if ours != cs:
        bad += 1; print("ENC MISMATCH", (h, w, st, g, f, float(qf))); continue
    # skip reference-UB streams: a channel with no surviving segments
    # makes the C decoder read an uninitialized ll_mean (icer_color.c:555)
    from icer_compression_tpu.core.header import scan_bytestream
    chans_present = {hd.channel for hd, _ in scan_bytestream(cs)}
    if chans_present != {0, 1, 2}:
        continue
    dt = np.uint8 if u8 else np.uint16
    dec = o.decompress_yuv_u8 if u8 else o.decompress_yuv_u16
    _, (cy, cu, cv) = dec(cs, st, f, g, h * w * 16)
    my = decompress_yuv(cs, cfg, dtype=dt)
    if not all(np.array_equal(a, b) for a, b in zip(my, (cy, cu, cv))):
        bad += 1; print("DEC MISMATCH", (h, w, st, g, f)); continue
    # the lane-batched decoder costs ~3 s/trial on host (it is built for
    # wide device batches); sampling it every 6th trial keeps the soak's
    # trial rate while still exercising it hundreds of times per run
    if trials % 6 == 0:
        ml = decompress_yuv_lanes(cs, cfg, dtype=dt)
        if not all(np.array_equal(a, b) for a, b in zip(ml, my)):
            bad += 1; print("LANE DEC MISMATCH", (h, w, st, g, f))
print(f"color fuzz: {trials} trials, {bad} failures")
