"""Sequential bitplane decoding (host reference path).

Decoding is inherently serial within one (segment, bitplane): each decoded
bit updates the partial coefficient array that feeds the *next* pixel's
context (icer_context_modeller.c:461-603).  This module is the exact,
python-level mirror used for correctness; the production paths are the
native C++ runtime (multithreaded across segments) and the batched TPU
decoder.

Parallelism across segments / subbands / channels / images is exploited at
the call layer: every segment-plane decode touches only its own rectangle.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from ..core.status import IcerError
from .sequential import ContextCounters, InterleavedDecoder


def decode_bitplane(seg: np.ndarray, subband_type: int, lsb: int,
                    mag_bits: int, counters: ContextCounters,
                    decoder: InterleavedDecoder) -> None:
    """Decode one bitplane of one segment, in place.

    ``seg`` is an int32 (h, w) array holding the partially reconstructed
    sign-magnitude coefficients (bitplanes above ``lsb`` plus signs decoded
    so far).  Raises IcerError on stream corruption/underrun, leaving the
    partial reconstruction in place (caller stops refining this segment,
    matching icer_partition.c:206-221).
    """
    h, w = seg.shape
    prev = lsb + 1
    sign_bit = mag_bits  # sign lives just above the magnitude bits
    ll_table = C.CONTEXT_TABLE_LL_LH_HL
    hh_table = C.CONTEXT_TABLE_HH
    sgn_ctx_t = C.SIGN_CONTEXT_TABLE
    sgn_pred_t = C.SIGN_PREDICTION_TABLE
    is_hl = subband_type == C.SUBBAND_HL
    is_hh = subband_type == C.SUBBAND_HH

    def sig(r, c, plane):
        return 1 if (int(seg[r, c]) >> plane) & ((1 << (mag_bits - plane)) - 1) else 0

    def sgn(r, c, plane):
        if not sig(r, c, plane):
            return 0
        return -1 if (int(seg[r, c]) >> sign_bit) & 1 else 0

    for r in range(h):
        for c in range(w):
            v = int(seg[r, c])
            mag = v & ((1 << mag_bits) - 1)
            msb = (mag | 1).bit_length() - 1
            category = msb - lsb
            if category < 0:
                category = 0
            elif category > 3:
                category = 3

            if category == 3:
                bit = decoder.decode_bit(1, 2)
                seg[r, c] = v | (bit << lsb)
                continue

            if category <= 1:
                hcnt = vcnt = dcnt = 0
                if c > 0:
                    hcnt += sig(r, c - 1, lsb)
                if c < w - 1:
                    hcnt += sig(r, c + 1, prev)
                if r > 0:
                    vcnt += sig(r - 1, c, lsb)
                if r < h - 1:
                    vcnt += sig(r + 1, c, prev)
                if c > 0 and r > 0:
                    dcnt += sig(r - 1, c - 1, lsb)
                if c > 0 and r < h - 1:
                    dcnt += sig(r + 1, c - 1, prev)
                if c < w - 1 and r > 0:
                    dcnt += sig(r - 1, c + 1, lsb)
                if c < w - 1 and r < h - 1:
                    dcnt += sig(r + 1, c + 1, prev)

            if category == 0:
                if is_hl:
                    hcnt, vcnt = vcnt, hcnt
                if not is_hh:
                    ctx = int(ll_table[hcnt, vcnt, dcnt])
                else:
                    ctx = int(hh_table[hcnt + vcnt, dcnt])
            elif category == 1:
                ctx = 9 if (hcnt + vcnt) == 0 else 10
            else:
                ctx = 11

            bit = decoder.decode_bit(counters.zero[ctx], counters.total[ctx])
            v |= bit << lsb
            seg[r, c] = v
            counters.update(ctx, bit)

            if category == 0 and bit:
                sh0 = sgn(r, c - 1, lsb) if c > 0 else 0
                sh1 = sgn(r, c + 1, prev) if c < w - 1 else 0
                sv0 = sgn(r - 1, c, lsb) if r > 0 else 0
                sv1 = sgn(r + 1, c, prev) if r < h - 1 else 0
                sh = sh0 + sh1 + 2
                sv = sv0 + sv1 + 2
                if is_hl:
                    sh, sv = sv, sh
                sctx = int(sgn_ctx_t[sh, sv])
                pred = int(sgn_pred_t[sh, sv])
                agreement = decoder.decode_bit(counters.zero[sctx],
                                               counters.total[sctx])
                actual = (agreement ^ pred) & 1
                seg[r, c] = int(seg[r, c]) | (actual << sign_bit)
                counters.update(sctx, agreement)


def decode_segment_planes(seg: np.ndarray, subband_type: int, mag_bits: int,
                          plane_payloads, bitplanes: int) -> None:
    """Decode a segment MSB -> LSB, stopping at the first gap or error.

    ``plane_payloads``: mapping lsb -> (payload bytes, bit_length) or None.
    Mirrors the refinement loop of icer_decompress_partition_*
    (icer_partition.c:427-443).
    """
    for lsb in range(bitplanes - 1, -1, -1):
        entry = plane_payloads.get(lsb)
        if entry is None:
            break
        payload, nbits = entry
        counters = ContextCounters()
        decoder = InterleavedDecoder(payload, nbits)
        try:
            decode_bitplane(seg, subband_type, lsb, mag_bits, counters, decoder)
        except IcerError:
            break
