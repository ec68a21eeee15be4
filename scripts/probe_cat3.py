"""Measure the all-cat3 tile fraction for the decode kernel fast path.

For each decode bucket / 128-lane block / plane round / row / 8-pixel
tile, a tile is "fast-path eligible" when EVERY lane's pixels in it are
either inactive (outside the segment rect) or category 3 (magnitude
already >= 8 over the current plane, i.e. final_mag >= 2^(lsb+3)).
Those tiles reduce to one raw-bit ring fetch + 8 bit extracts, with no
context/counter work -- the decode-side analogue of the C++ runtime's
16-uncoded-bits-per-step batching (icer_runtime.cpp:543-571).

Run: python scripts/probe_cat3.py [B]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 21
img = np.asarray(Image.open("tests/data/boat.512.png").convert("L"),
                 np.uint16)
h, w = img.shape
cfg = CodecConfig(stages=4, filt=0, segments=6)
mag_bits = _mag_bits(np.uint16)
bitplanes = _bitplanes(mag_bits)

t, _ov = wavelet.forward_stages(img.astype(np.int32), cfg.stages, cfg.filt,
                                mag_bits)
ll_w, ll_h = dim_low(w, cfg.stages), dim_low(h, cfg.stages)
llm = int(t[:ll_h, :ll_w].mean())  # close enough for a statistics probe
t = np.asarray(t).copy()
t[:ll_h, :ll_w] -= llm
sm = np.asarray(wavelet.to_sign_magnitude(t, mag_bits))
mags = sm & ((1 << mag_bits) - 1)

BLK = 128
tot_tiles = 0
fast_tiles = 0
tot_rows = 0
for lanes in _plan_lanes(w, h, cfg):
    n1 = len(lanes)
    Hmax = max(u["h"] for u in lanes)
    Wmax = max(u["w"] for u in lanes)
    ntiles = -(-Wmax // 8)
    n = n1 * B  # B images share the block (identical content here)
    # per-lane (Hmax, Wpad-tiles) cat3 eligibility per plane
    for blk in range(0, n, BLK):
        idx = np.arange(blk, min(blk + BLK, n))
        # eligibility per (round, row, tile): all lanes all-px cat3|inactive
        for rnd in range(bitplanes):
            lsb = bitplanes - 1 - rnd
            thresh = 1 << (lsb + 3)
            ok = np.ones((Hmax, ntiles), bool)
            for li in idx:
                u = lanes[li % n1]
                m = mags[u["row"]:u["row"] + u["h"],
                         u["col"]:u["col"] + u["w"]]
                c3 = m >= thresh
                lane_ok = np.ones((Hmax, ntiles), bool)
                for ti in range(ntiles):
                    c0, c1 = ti * 8, min(ti * 8 + 8, u["w"])
                    if c1 <= c0:
                        continue  # tile fully inactive for this lane
                    seg_ok = c3[:, c0:c1].all(axis=1)
                    lane_ok[:u["h"], ti] = seg_ok
                ok &= lane_ok
            tot_tiles += ok.size
            fast_tiles += int(ok.sum())
            tot_rows += Hmax

print(f"B={B} blocks: total tile-steps {tot_tiles}, "
      f"all-cat3 fast {fast_tiles} ({100*fast_tiles/tot_tiles:.1f}%)")

# Also: per-plane breakdown to see where the mass is
for lsb in range(bitplanes):
    thresh = 1 << (lsb + 3)
    frac = (mags >= thresh).mean()
    print(f"  lsb={lsb}: cat3 pixel fraction {100*frac:.1f}%")
