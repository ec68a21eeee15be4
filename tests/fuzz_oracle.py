#!/usr/bin/env python
"""Randomized differential fuzz vs the reference build (not collected by
pytest; run directly with an optional duration in seconds).

Samples random geometry/config/content classes within the reference's
defined-behavior envelope (segments bounded by the smallest subband --
beyond that the reference encodes from uninitialized partition geometry,
see tests/test_extremes.py) and asserts byte-identical streams and
pixel-identical decodes.

Last full runs: 27,036 + 62,529 trials (2026-08-17) and 63,016 +
18,445 seeded trials (2026-08-18), 0 reproducible mismatches.

One nonreproducible DEC MISMATCH was observed on 2026-08-18 (seeded rerun
of the identical trial sequence passed, as did 400 fresh trials of the
same config): consistent with the reference decoder's zero-copy
over-read UB touching heap residue past the oracle buffer's zero pad
(now 4 KB, tests/oracle.py) or a transient on this shared box.  DEC
mismatches now dump the image/stream to /tmp and re-run both decoders
to classify determinism on the spot.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import oracle  # noqa: E402
from icer_compression_tpu.models import grayscale as G  # noqa: E402
from icer_compression_tpu.models.grayscale import (  # noqa: E402
    CodecConfig, all_subbands)
from icer_compression_tpu.core.subbands import subband_view  # noqa: E402


def main(duration=300, seed=None):
    o = oracle.get_oracle()
    rng = np.random.default_rng(seed)
    t0 = time.time()
    trials = bad = 0
    while time.time() - t0 < duration:
        h = int(rng.integers(8, 160))
        w = int(rng.integers(8, 160))
        stages = int(rng.integers(1, 7))
        if min(-(-w // (1 << stages)), -(-h // (1 << stages))) < 3:
            continue
        minpix = min(subband_view(w, h, st, sb).h * subband_view(w, h, st, sb).w
                     for (st, sb) in all_subbands(stages))
        segs = int(rng.integers(1, min(32, minpix) + 1))
        filt = int(rng.integers(0, 7))
        qf = rng.choice([0.05, 0.2, 0.6, 1.0, 2.0])
        kind = rng.integers(0, 4)
        if kind == 0:
            img = rng.integers(0, 256, (h, w)).astype(np.uint16)
        elif kind == 1:
            base = np.add.outer(np.arange(h) * 3, np.arange(w)) % 200
            img = (base + rng.integers(0, 40, (h, w))).astype(np.uint16)
        elif kind == 2:
            img = ((rng.random((h, w)) < rng.random()).astype(np.uint16)
                   * int(rng.integers(1, 512)))
        else:
            img = np.full((h, w), int(rng.integers(0, 500)), np.uint16)
        quota = max(64, int(h * w * 2 * qf))
        trials += 1
        _, cs = o.compress_u16(img, stages, filt, segs, quota)
        cfg = CodecConfig(stages=stages, filt=filt, segments=segs,
                          byte_quota=quota)
        ours = G.compress(img, cfg)
        if ours != cs:
            bad += 1
            print("ENC MISMATCH", (h, w, stages, segs, filt, float(qf),
                                   int(kind)))
            np.save(f"/tmp/fuzz_fail_enc_{trials}.npy", img)
            continue
        _, cd = o.decompress_u16(cs, stages, filt, segs, h * w * 8)
        md = np.asarray(G.decompress(cs, cfg))
        if not np.array_equal(md, cd):
            bad += 1
            print("DEC MISMATCH", (h, w, stages, segs, filt, float(qf),
                                   int(kind)))
            np.save(f"/tmp/fuzz_fail_dec_{trials}.npy", img)
            with open(f"/tmp/fuzz_fail_dec_{trials}.bin", "wb") as fh:
                fh.write(cs)
            # re-run both decoders once more: a repeat mismatch is a real
            # codec divergence, a clean repeat points at nondeterminism
            # (e.g. the reference's zero-copy over-read past the buffer)
            _, cd2 = o.decompress_u16(cs, stages, filt, segs, h * w * 8)
            md2 = np.asarray(G.decompress(cs, cfg))
            print("  repeat: oracle stable", np.array_equal(cd, cd2),
                  "| ours stable", np.array_equal(md, md2),
                  "| match on repeat", np.array_equal(md2, cd2))
    print(f"fuzz: {trials} trials, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    dur = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else None
    sys.exit(main(dur, seed))
