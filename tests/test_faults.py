"""Fault injection: error containment and progressive robustness."""

import numpy as np

from icer_compression_tpu.models import grayscale as G
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.utils import faults

from conftest import make_test_image


def _stream(rng, segs=4):
    img = make_test_image(64, 64, rng)
    cfg = CodecConfig(stages=2, filt=0, segments=segs, byte_quota=None)
    return img, cfg, G.compress(img, cfg)


def test_drop_one_segment_contains_damage(rng):
    img, cfg, stream = _stream(rng)
    # Drop every packet of spatial segment 0 of the finest HH subband.
    cut = faults.drop_segments(
        stream, lambda h: h.segment_number == 0 and h.decomp_level == 1
        and h.subband_type == 3)
    dec = np.asarray(G.decompress(cut, cfg, dtype=np.uint16))
    full = np.asarray(G.decompress(stream, cfg, dtype=np.uint16))
    assert dec.shape == full.shape
    # Reconstruction differs only moderately and decode survives.
    assert np.abs(dec.astype(int) - full.astype(int)).mean() < 16


def test_random_corruption_graceful(rng):
    img, cfg, stream = _stream(rng)
    for n in (1, 4, 16):
        bad = faults.corrupt_random(stream, n, seed=n)
        dec = np.asarray(G.decompress(bad, cfg, dtype=np.uint16))
        assert dec.shape == img.shape


def test_corruption_matches_reference_decoder(oracle, rng):
    img, cfg, stream = _stream(rng)
    bad = faults.corrupt_random(stream, 8, seed=3)
    mine = np.asarray(G.decompress(bad, cfg, dtype=np.uint16))
    _, ref = oracle.decompress_u16(bad, cfg.stages, cfg.filt, cfg.segments,
                                   64 * 64 * 4)
    assert np.array_equal(mine, ref)


def test_census_counts(rng):
    img, cfg, stream = _stream(rng, segs=3)
    census = faults.segment_census(stream)
    # 9 bitplanes x 3 segments x (3 subbands x 2 stages + LL)
    assert len(census) == 9 * 3 * 7


def test_progressive_prefixes_monotone(rng):
    img, cfg, stream = _stream(rng)
    prev_err = None
    for frac in (0.2, 0.5, 0.9, 1.0):
        dec = np.asarray(G.decompress(faults.truncate(stream, frac), cfg,
                                      dtype=np.uint16))
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        if prev_err is not None:
            assert err <= prev_err + 1e-9
        prev_err = err
    assert prev_err == 0  # full stream is lossless
