"""Round-2 parity/robustness fixes: packet-count limit, decode allocation
cap, grayscale channel-nibble semantics, fault-harness edge cases."""

import numpy as np
import pytest

from icer_compression_tpu.core.packets import (build_packets_color,
                                               build_packets_grayscale)
from icer_compression_tpu.core.status import IcerError, IcerStatus
from icer_compression_tpu.models import color as MC
from icer_compression_tpu.models import grayscale as MG
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.utils import faults

import oracle


def test_packet_count_exceeded_color_uint8():
    # 3*(3*stages*7 + 7) >= 300 at stages >= 5 (icer.h:36, icer_color.c:90)
    with pytest.raises(IcerError) as e:
        build_packets_color(64, 64, 5, [0, 0, 0], 7)
    assert e.value.status == IcerStatus.PACKET_COUNT_EXCEEDED
    # stages=4 fits (273 packets)
    assert len(build_packets_color(64, 64, 4, [0, 0, 0], 7)) == 273
    # uint16 color never exceeds 800
    assert len(build_packets_color(64, 64, 6, [0, 0, 0], 9)) == 513
    # grayscale never exceeds either cap
    assert len(build_packets_grayscale(64, 64, 6, 0, 9)) == 171


@pytest.mark.skipif(not oracle.available(), reason="no reference tree")
def test_packet_count_exceeded_matches_oracle():
    orc = oracle.get_oracle()
    # stages=5 needs LL >= 3x3 (>= 96 px) and smooth data so the uint8 DWT
    # does not overflow before the packet-list build runs.
    xx, yy = np.meshgrid(np.arange(128), np.arange(128))
    img = ((xx + yy) // 8 % 32 + 20).astype(np.uint8)
    res, _ = orc.compress_yuv_u8(img, img, img, 5, 0, 2, 128 * 128 * 3)
    assert res == int(IcerStatus.PACKET_COUNT_EXCEEDED)
    with pytest.raises(IcerError) as e:
        MC.compress_yuv(img, img, img,
                        CodecConfig(stages=5, filt=0, segments=2,
                                    byte_quota=128 * 128 * 3))
    assert e.value.status == IcerStatus.PACKET_COUNT_EXCEEDED


def test_decompress_max_pixels_cap():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32)).astype(np.uint16)
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=None)
    stream = MG.compress(img, cfg)
    # default cap: fine
    dec = MG.decompress(stream, cfg, dtype=np.uint16)
    assert np.array_equal(dec, img)
    # tiny cap: rejected before allocation
    with pytest.raises(IcerError) as e:
        MG.decompress(stream, cfg, dtype=np.uint16, max_pixels=100)
    assert e.value.status == IcerStatus.INVALID_INPUT
    with pytest.raises(IcerError):
        MC.decompress_yuv(stream, cfg, dtype=np.uint16, max_pixels=100)


@pytest.mark.skipif(not oracle.available(), reason="no reference tree")
def test_gray_decode_of_color_stream_matches_reference():
    """The reference grayscale decoder ignores the channel nibble (its
    reconstruct table has no channel axis: icer_compress.c:449-467), so
    color streams decode with last-segment-wins channel mixing.  Verify
    our grayscale decode of a color stream is pixel-identical to the C
    grayscale decoder's."""
    orc = oracle.get_oracle()
    rng = np.random.default_rng(2)
    y = rng.integers(0, 40, (48, 40)).astype(np.uint8)
    u = rng.integers(0, 40, (48, 40)).astype(np.uint8)
    v = rng.integers(0, 40, (48, 40)).astype(np.uint8)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=None)
    stream = MC.compress_yuv(y, u, v, cfg)
    res, ref = orc.decompress_u8(stream, cfg.stages, cfg.filt, cfg.segments,
                                 48 * 40)
    ours = MG.decompress(stream, cfg, dtype=np.uint8)
    assert np.array_equal(ours, ref)


def test_faults_empty_stream():
    assert faults.flip_bytes(b"", [0, 5]) == b""
    assert faults.corrupt_random(b"", 3) == b""
