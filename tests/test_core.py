"""Core format layer: partition geometry, headers, CRC, tables."""

import numpy as np
import pytest

from icer_compression_tpu.core import constants as C
from icer_compression_tpu.core.header import (SegmentHeader, crc32,
                                              get_image_dimensions,
                                              scan_bytestream)
from icer_compression_tpu.core.partition import (generate_partition_params,
                                                 partition_segments)
from icer_compression_tpu.core.status import IcerError


def test_crc32_check_value():
    # ANSI X3.66 reflected CRC32 check value.
    assert crc32(b"123456789") == 0xCBF43926


def test_golomb_params():
    # (m, l, i) with l = ceil(log2 m), i = 2^l - m.
    assert C.GOLOMB_PARAMS[8].tolist() == [5, 3, 3]
    assert C.GOLOMB_PARAMS[16].tolist() == [512, 9, 0]
    for b in range(8, 17):
        m, l, i = C.GOLOMB_PARAMS[b]
        assert 1 << (l - 1) < m <= 1 << l
        assert i == (1 << l) - m


def test_custom_codes_prefix_free():
    # Within each bin, input patterns form a prefix-free set and the table
    # values are unique (the reference indexes them by value alone).
    for b, entries in C.CUSTOM_CODES.items():
        vals = [(iv, ib) for (iv, ib, _, _) in entries]
        assert len({iv for iv, _ in vals}) == len(vals)
        seqs = [tuple((iv >> k) & 1 for k in range(ib)) for iv, ib in vals]
        for i, s in enumerate(seqs):
            for j, t in enumerate(seqs):
                if i != j:
                    assert s != t[:len(s)], (b, s, t)


@pytest.mark.parametrize("llw,llh,segs", [
    (64, 64, 6), (128, 128, 10), (32, 32, 32), (7, 5, 6), (16, 3, 4),
    (3, 16, 4), (33, 47, 17), (5, 5, 25),
])
def test_partition_tiles_exactly(llw, llh, segs):
    rects = partition_segments(llw, llh, segs)
    assert len(rects) == segs
    cover = np.zeros((llh, llw), dtype=int)
    for r in rects:
        assert r.h > 0 and r.w > 0
        cover[r.row:r.row + r.h, r.col:r.col + r.w] += 1
    assert (cover == 1).all()


def test_partition_rejects_too_many():
    with pytest.raises(IcerError):
        generate_partition_params(2, 2, 5)
    with pytest.raises(IcerError):
        generate_partition_params(100, 100, 33)


def test_header_roundtrip_and_scan():
    hdr = SegmentHeader(ll_mean_val=77, decomp_level=3, subband_type=2,
                        segment_number=5, lsb=4, channel=1, image_w=512,
                        image_h=384, data_length=101)
    payload = bytes(range(13))
    blob = hdr.pack(payload)
    assert len(blob) == C.HEADER_SIZE + 13
    # Prepend garbage to exercise byte-by-byte resync.
    stream = b"\x5b\x60garbage" + blob + b"trailing"
    found = scan_bytestream(stream)
    assert len(found) == 1
    h2, p2 = found[0]
    assert p2 == payload
    assert (h2.ll_mean_val, h2.decomp_level, h2.subband_type,
            h2.segment_number, h2.lsb, h2.channel, h2.image_w, h2.image_h,
            h2.data_length) == (77, 3, 2, 5, 4, 1, 512, 384, 101)
    assert get_image_dimensions(stream) == (512, 384)


def test_corrupt_segment_rejected():
    hdr = SegmentHeader(ll_mean_val=0, decomp_level=1, subband_type=0,
                        segment_number=0, lsb=0, channel=0, image_w=8,
                        image_h=8, data_length=16)
    blob = bytearray(hdr.pack(b"\xaa\xbb"))
    blob[-1] ^= 0xFF  # corrupt payload -> payload CRC fails
    assert scan_bytestream(bytes(blob)) == []
    blob2 = bytearray(hdr.pack(b"\xaa\xbb"))
    blob2[4] ^= 0x01  # corrupt header -> header CRC fails
    assert scan_bytestream(bytes(blob2)) == []
