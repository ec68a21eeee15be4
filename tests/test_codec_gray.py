"""Grayscale codec end-to-end vs the C oracle: streams byte-identical,
decodes pixel-identical, quota truncation semantics equal."""

import numpy as np
import pytest

from icer_compression_tpu.models import grayscale as G
from icer_compression_tpu.models.grayscale import CodecConfig

from conftest import make_test_image


CASES_U16 = [
    # (h, w, filt, stages, segments, quota_factor)
    (48, 40, 0, 2, 3, None),
    (48, 40, 0, 2, 3, 0.2),      # heavy truncation
    (33, 47, 2, 3, 2, None),     # filter C
    (37, 53, 4, 2, 5, None),
    (64, 64, 1, 3, 6, None),
    (64, 64, 0, 4, 6, None),     # max stages for 64
    (40, 56, 6, 2, 1, 0.5),
]


@pytest.mark.parametrize("h,w,filt,stages,segs,qf", CASES_U16)
def test_stream_and_decode_parity_u16(oracle, rng, h, w, filt, stages, segs, qf):
    img = make_test_image(h, w, rng)
    quota = int(h * w * 2 * (qf or 1.0))
    cfg = CodecConfig(stages=stages, filt=filt, segments=segs,
                      byte_quota=quota)
    _, cstream = oracle.compress_u16(img, stages, filt, segs, quota)
    ours = G.compress(img, cfg)
    assert ours == cstream

    _, cdec = oracle.decompress_u16(cstream, stages, filt, segs, h * w * 4)
    mydec = G.decompress(cstream, cfg, dtype=np.uint16)
    assert np.array_equal(np.asarray(mydec), cdec)


@pytest.mark.parametrize("h,w,filt,stages,segs", [
    (48, 40, 0, 2, 3), (33, 47, 4, 2, 2), (64, 64, 0, 3, 6),
])
def test_stream_and_decode_parity_u8(oracle, rng, h, w, filt, stages, segs):
    img = make_test_image(h, w, rng, dtype=np.uint8, amplitude=100, noise=25)
    quota = h * w
    cfg = CodecConfig(stages=stages, filt=filt, segments=segs,
                      byte_quota=quota)
    _, cstream = oracle.compress_u8(img, stages, filt, segs, quota)
    ours = G.compress(img, cfg)
    assert ours == cstream
    _, cdec = oracle.decompress_u8(cstream, stages, filt, segs, h * w * 2)
    mydec = G.decompress(cstream, cfg, dtype=np.uint8)
    assert np.array_equal(np.asarray(mydec), cdec)


def test_lossless_roundtrip_unlimited_quota(rng):
    img = make_test_image(48, 40, rng)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=None)
    stream = G.compress(img, cfg)
    dec = G.decompress(stream, cfg, dtype=np.uint16)
    assert np.array_equal(np.asarray(dec), img)


def test_progressive_truncation_decodes(rng):
    """Any prefix of the rearranged stream decodes to a coarser image."""
    img = make_test_image(48, 40, rng)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=None)
    stream = G.compress(img, cfg)
    for frac in (0.25, 0.5, 0.75):
        cut = stream[:int(len(stream) * frac)]
        dec = np.asarray(G.decompress(cut, cfg, dtype=np.uint16))
        assert dec.shape == img.shape
        # coarser but correlated reconstruction
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 128


def test_corrupt_segment_contained(oracle, rng):
    """Flipping bytes inside one segment only degrades that region."""
    img = make_test_image(64, 64, rng)
    cfg = CodecConfig(stages=2, filt=0, segments=4, byte_quota=None)
    stream = bytearray(G.compress(img, cfg))
    # Corrupt a byte in the middle of the stream (some segment payload).
    stream[len(stream) // 2] ^= 0xFF
    dec = np.asarray(G.decompress(bytes(stream), cfg, dtype=np.uint16))
    assert dec.shape == img.shape  # graceful, no exception
    # The C decoder must agree on the corrupted stream too.
    _, cdec = oracle.decompress_u16(bytes(stream), 2, 0, 4, 64 * 64 * 4)
    assert np.array_equal(dec, cdec)
