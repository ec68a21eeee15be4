"""Lane-batched decoder model vs the sequential reference decoder."""

import numpy as np
import pytest

from icer_compression_tpu.backend import sequential as S
from icer_compression_tpu.backend.decode_plane import decode_bitplane
from icer_compression_tpu.core.status import IcerError
from icer_compression_tpu.ops import decode_lanes as DL
from icer_compression_tpu.ops.context_model import plane_emissions


def _encode_plane(seg, subband, lsb, mag_bits):
    valid, ctx, bit = plane_emissions(seg, subband, lsb, mag_bits)
    payload, nbits, _ = S.encode_emissions(valid, ctx, bit)
    return payload, nbits


def test_lane_decoder_matches_sequential(rng):
    """Random segments per lane, all planes, random shapes/subbands."""
    n = DL.LANES
    Hmax, Wmax = 10, 12
    mag_bits = 7
    nplanes = 7
    h = rng.integers(1, Hmax + 1, n).astype(np.int32)
    w = rng.integers(1, Wmax + 1, n).astype(np.int32)
    subband = rng.integers(0, 4, n).astype(np.int32)
    # original sign-magnitude data per lane
    full = np.zeros((Hmax, Wmax, n), np.int32)
    for lane in range(n):
        mag = rng.integers(0, 1 << mag_bits, (h[lane], w[lane]))
        sign = rng.integers(0, 2, (h[lane], w[lane]))
        kind = lane % 4
        if kind == 1:
            mag = (mag > 96) * mag  # sparse
        elif kind == 2:
            mag = np.zeros_like(mag)  # all-zero (golomb runs)
        full[:h[lane], :w[lane], lane] = mag | (sign << mag_bits)
        if kind == 2:
            full[:h[lane], :w[lane], lane] = 0

    # encode every plane of every lane with the sequential coder
    payloads = {}
    for lane in range(n):
        for lsb in range(nplanes):
            payloads[(lane, lsb)] = _encode_plane(
                full[:h[lane], :w[lane], lane], int(subband[lane]), lsb,
                mag_bits)

    # reference decode (python sequential)
    ref = np.zeros_like(full)
    ref_ok = np.ones((n, nplanes), bool)
    for lane in range(n):
        seg = ref[:h[lane], :w[lane], lane]
        for lsb in range(nplanes - 1, -1, -1):
            pl, nb = payloads[(lane, lsb)]
            cnt = S.ContextCounters()
            dec = S.InterleavedDecoder(pl, nb)
            try:
                decode_bitplane(seg, int(subband[lane]), lsb, mag_bits,
                                cnt, dec)
            except IcerError:
                ref_ok[lane, lsb] = False
                break

    # lane-batched decode, one plane round at a time
    out = np.zeros_like(full)
    lane_alive = np.ones(n, bool)
    for lsb in range(nplanes - 1, -1, -1):
        maxb = max(len(payloads[(lane, lsb)][0]) for lane in range(n)) + 8
        data = np.zeros((n, maxb), np.uint8)
        readable = np.zeros(n, np.int64)
        ebits = np.zeros(n, np.int64)
        for lane in range(n):
            pl, nb = payloads[(lane, lsb)]
            data[lane, :len(pl)] = np.frombuffer(pl, np.uint8)
            readable[lane] = len(pl)
            ebits[lane] = nb
        dec = DL.LaneDecoders(data, readable, ebits)
        ok = DL.decode_plane_lanes(
            out, h, w, subband, np.full(n, lsb, np.int32),
            np.full(n, mag_bits, np.int32), dec, lane_alive)
        lane_alive &= ok

    for lane in range(n):
        a = ref[:h[lane], :w[lane], lane]
        b = out[:h[lane], :w[lane], lane]
        assert np.array_equal(a, b), f"lane {lane} mismatch"


def test_lane_decoder_flags_corrupt_streams(rng):
    """A corrupted lane errors out; the others decode exactly."""
    n = DL.LANES
    Hmax = Wmax = 8
    mag_bits = 7
    h = np.full(n, Hmax, np.int32)
    w = np.full(n, Wmax, np.int32)
    subband = np.zeros(n, np.int32)
    full = rng.integers(0, 1 << (mag_bits + 1), (Hmax, Wmax, n)).astype(
        np.int32)
    lsb = 0
    data_list = []
    for lane in range(n):
        pl, nb = _encode_plane(full[..., lane], 0, lsb, mag_bits)
        data_list.append((bytearray(pl), nb))
    # corrupt lane 5 (truncate hard) -- decoder must flag, not crash
    data_list[5] = (data_list[5][0][:2], data_list[5][1])

    maxb = max(len(d) for d, _ in data_list) + 8
    data = np.zeros((n, maxb), np.uint8)
    readable = np.zeros(n, np.int64)
    ebits = np.zeros(n, np.int64)
    for lane, (d, nb) in enumerate(data_list):
        data[lane, :len(d)] = np.frombuffer(bytes(d), np.uint8)
        readable[lane] = len(d)
        ebits[lane] = nb

    # pre-set every plane above lsb as already decoded (single-plane test)
    out = (full & ~(1 << lsb) & ((1 << mag_bits) - 1)).astype(np.int32)
    out |= full & (1 << mag_bits)
    # zero the signs of pixels that only become significant at lsb
    newly = ((full & ((1 << mag_bits) - 1)) >> (lsb + 1)) == 0
    out = np.where(newly, out & ((1 << mag_bits) - 1) & ~(1 << lsb), out)

    dec = DL.LaneDecoders(data, readable, ebits)
    DL.decode_plane_lanes(out, h, w, subband,
                          np.full(n, lsb, np.int32),
                          np.full(n, mag_bits, np.int32), dec,
                          np.ones(n, bool))
    # sign bits of never-significant pixels are never coded
    exp = full.copy()
    exp[(full & ((1 << mag_bits) - 1)) == 0] &= (1 << mag_bits) - 1
    good = [lane for lane in range(n) if lane != 5]
    assert np.array_equal(out[..., good], exp[..., good])
