"""Estimate the decode kernel's zero-tile fast-path hit rate.

A (row, tile, round) step qualifies for the batched fast path when EVERY
lane's 8 pixels are either inactive or decode a zero bit as category 0
(final magnitude >> lsb == 0: the pixel is insignificant from higher
planes AND its bit this plane is 0).  Qualifying tiles skip the 8-pixel
sequential decode walk: contexts/bins batch-verify vectorized, counters
and bin stacks batch-update, canvas/sign state untouched.

This host probe is an UPPER BOUND: the kernel's predicate additionally
requires no bin refill mid-tile, no counter rescale, and inv == 0 --
all common on the zero-heavy planes where this fires.

Run: python scripts/probe_zerotile.py [B] [--mix]
  --mix: fill the batch with flipped/rolled variants instead of copies
         (a serving batch has DIFFERENT images; the conjunction across
         lanes is the honest predicate)
"""
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, ".")
from icer_compression_tpu.models.grayscale import (CodecConfig, _bitplanes,
                                                   _mag_bits)
from icer_compression_tpu.models.decode_jax import _plan_lanes
from icer_compression_tpu.ops import wavelet
from icer_compression_tpu.core.subbands import dim_low

B = int([a for a in sys.argv[1:] if not a.startswith("-")][0]) \
    if [a for a in sys.argv[1:] if not a.startswith("-")] else 21
MIX = "--mix" in sys.argv
img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"),
                 np.uint16)
h, w = img.shape
cfg = CodecConfig(stages=4, filt=0, segments=6)
mag_bits = _mag_bits(np.uint16)
bitplanes = _bitplanes(mag_bits)


def mags_of(im):
    t, _ = wavelet.forward_stages(im.astype(np.int32), cfg.stages, cfg.filt,
                                  mag_bits)
    ll_w, ll_h = dim_low(w, cfg.stages), dim_low(h, cfg.stages)
    t = np.asarray(t).copy()
    t[:ll_h, :ll_w] -= int(t[:ll_h, :ll_w].mean())
    sm = np.asarray(wavelet.to_sign_magnitude(t, mag_bits))
    return sm & ((1 << mag_bits) - 1)


variants = [img]
if MIX:
    variants = [img, img[::-1].copy(), img[:, ::-1].copy(),
                np.roll(img, 64, 0), np.roll(img, 128, 1),
                img.T.copy(), np.roll(img, 200, 0)[::-1].copy()]
mags_v = [mags_of(v) for v in variants]

BLK = 128
tot_steps = 0
fast_steps = 0
per_round = {}
for lanes in _plan_lanes(w, h, cfg):
    n1 = len(lanes)
    Hmax = max(u["h"] for u in lanes)
    Wmax = max(u["w"] for u in lanes)
    ntiles = -(-Wmax // 8)
    n = n1 * B
    for blk in range(0, n, BLK):
        idx = np.arange(blk, min(blk + BLK, n))
        for rnd in range(bitplanes):
            lsb = bitplanes - 1 - rnd
            ok = np.ones((Hmax, ntiles), bool)
            for li in idx:
                u = lanes[li % n1]
                img_i = li // n1
                m = mags_v[img_i % len(mags_v)][
                    u["row"]:u["row"] + u["h"], u["col"]:u["col"] + u["w"]]
                z = (m >> lsb) == 0          # insignificant AND bit 0
                lane_ok = np.ones((Hmax, ntiles), bool)
                for ti in range(ntiles):
                    c0, c1 = ti * 8, min(ti * 8 + 8, u["w"])
                    if c1 <= c0:
                        continue
                    lane_ok[:u["h"], ti] = z[:, c0:c1].all(axis=1)
                ok &= lane_ok
            tot_steps += ok.size
            fast_steps += int(ok.sum())
            a, b = per_round.get(rnd, (0, 0))
            per_round[rnd] = (a + ok.size, b + int(ok.sum()))

print(f"B={B} mix={MIX}: tile-steps {tot_steps}, all-zero fast "
      f"{fast_steps} ({100*fast_steps/tot_steps:.1f}%)")
for rnd in sorted(per_round):
    a, b = per_round[rnd]
    print(f"  round {rnd} (lsb={bitplanes-1-rnd}): {100*b/a:5.1f}% fast")
