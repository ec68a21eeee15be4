"""Extreme-configuration differential coverage vs the oracle."""

import numpy as np
import pytest

from icer_compression_tpu.models import grayscale as G
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.core.status import IcerError

from conftest import make_test_image


# Note: segments > LL pixels is undefined behavior in the reference (the
# partition error return is ignored at icer_compress.c:141 and encode
# proceeds on uninitialized geometry); this framework raises
# TOO_MANY_SEGMENTS instead, so such configs are out of parity scope.
@pytest.mark.parametrize("h,w,stages,segs", [
    (200, 200, 6, 1),      # max stages
    (97, 201, 5, 8),       # deep stages, odd dims
    (12, 300, 2, 8),       # thin wide
    (300, 12, 2, 8),       # thin tall
    (512, 512, 1, 32),     # single stage, many segments
])
def test_extreme_geometries(oracle, rng, h, w, stages, segs):
    img = make_test_image(h, w, rng)
    quota = h * w * 2
    _, cstream = oracle.compress_u16(img, stages, 0, segs, quota)
    cfg = CodecConfig(stages=stages, filt=0, segments=segs, byte_quota=quota)
    assert G.compress(img, cfg) == cstream
    _, cdec = oracle.decompress_u16(cstream, stages, 0, segs, h * w * 4)
    assert np.array_equal(np.asarray(G.decompress(cstream, cfg)), cdec)


def test_flat_and_extreme_images(oracle, rng):
    for img in [
        np.zeros((64, 64), np.uint16),                     # all zero
        np.full((64, 64), 255, np.uint16),                 # flat max 8-bit
        (rng.random((64, 64)) < 0.5).astype(np.uint16) * 511,  # bimodal
    ]:
        _, cstream = oracle.compress_u16(img, 3, 0, 4, 64 * 64 * 2)
        cfg = CodecConfig(stages=3, filt=0, segments=4,
                          byte_quota=64 * 64 * 2)
        assert G.compress(img, cfg) == cstream
        _, cdec = oracle.decompress_u16(cstream, 3, 0, 4, 64 * 64 * 4)
        assert np.array_equal(np.asarray(G.decompress(cstream, cfg)), cdec)


def test_tiny_quota_parity(oracle, rng):
    img = make_test_image(64, 64, rng)
    for quota in (29, 60, 100, 500):
        _, cstream = oracle.compress_u16(img, 2, 0, 2, quota)
        cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=quota)
        assert G.compress(img, cfg) == cstream, quota


def test_too_many_stages_rejected():
    cfg = CodecConfig(stages=6, filt=0, segments=1, byte_quota=None)
    with pytest.raises(IcerError):
        G.compress(np.zeros((40, 40), np.uint16), cfg)


def test_vectorized_backend_matches_native(rng):
    img = make_test_image(48, 56, rng)
    cfg = CodecConfig(stages=2, filt=1, segments=3, byte_quota=None)
    assert (G.compress(img, cfg, backend="native")
            == G.compress(img, cfg, backend="vectorized"))


def test_deep_uint16_msb_loss_matches_oracle(oracle, rng):
    """>9-bitplane uint16 content: magnitudes above the BITPLANES_16 = 9
    coded planes silently lose their MSBs -- a reference behavior
    (icer.h:44-46), pinned here byte- and pixel-exactly against the C
    oracle so nobody mistakes it for a codec bug (round-2 test authors
    did)."""
    # 12-bit noise: transformed magnitudes pass bit 9 (MSB loss) while
    # staying clear of the int16 DWT overflow check (full-scale noise
    # correctly raises INTEGER_OVERFLOW instead, like the reference)
    img = rng.integers(0, 1 << 12, (64, 64)).astype(np.uint16)
    cfg = CodecConfig(stages=3, filt=0, segments=4,
                      byte_quota=64 * 64 * 4)
    _, cstream = oracle.compress_u16(img, 3, 0, 4, 64 * 64 * 4)
    stream = G.compress(img, cfg)
    assert stream == cstream
    _, cdec = oracle.decompress_u16(cstream, 3, 0, 4, 64 * 64 * 4)
    dec = np.asarray(G.decompress(stream, cfg))
    assert np.array_equal(dec, cdec)
    # and the behavior IS lossy here: the MSB loss is real
    assert not np.array_equal(dec, img)
