"""Lane-batched ICER bitplane decoder: the vectorization model.

Decoding one (segment, plane) is inherently serial -- every decoded bit
feeds the next pixel's context (icer_context_modeller.c:461-603) and the
interleaved decoder's bin FIFOs couple pixels through the stream
(icer_decoding.c) -- but it is embarrassingly parallel across segments.
This module runs the *exact* sequential algorithm for LANES segments at
once, one pixel sub-step at a time, with all per-lane state in fixed-shape
arrays:

  * bin FIFO stacks collapse to two registers per (bin, lane): the stack
    content is always `maybe a 1 at position 0, zeros above` for Golomb
    bins and an arbitrary <=5-bit pattern for the custom bins, so
    (depth, low-5-bits) represents every reachable stack exactly;
  * the custom-code refill (incremental prefix match, icer_decoding.c
    lookup loop) becomes one dense LUT keyed by (bin, next-5-stream-bits):
    valid codewords are at most 5 bits, so the first matching prefix is a
    function of the 5-bit lookahead; longer prefixes can only hit the
    reference's invalid-data guards, which we reproduce as error flags;
  * the decoder's out-of-data guards compare against the *frozen* total
    plane bit count (the reference never updates decoded_bits_total:
    icer_decoding.c), a per-lane constant here;
  * stream reads past the readable extent return zeros, matching the
    native runtime's bounds-checked replication of the reference's
    zero-copy over-read.

This numpy implementation is the semantic model (differentially tested
against backend/sequential.InterleavedDecoder); the pallas kernel port
(ops/pallas_decode.py) replaces the per-lane fancy indexing with
lookahead registers + one-hot fetch sweeps but keeps this step structure.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C

LANES = 128
_CUT = np.asarray(C.BIN_PROBABILITY_CUTOFFS[:16], np.int64)
_GOL_M = np.asarray(C.GOLOMB_M, np.int32)
_GOL_L = np.asarray(C.GOLOMB_L, np.int32)
_GOL_I = np.asarray(C.GOLOMB_I, np.int32)


def _build_custom_refill_lut():
    """(bin 1..7, 5-bit lookahead) -> (hit_len, in_val_reversed, in_bits).

    hit_len == 0 encodes "no valid codeword prefix" (the reference would
    read on and fail its invalid-data guards).
    """
    hit_len = np.zeros((8, 32), np.int32)
    in_val = np.zeros((8, 32), np.int32)
    in_bits = np.zeros((8, 32), np.int32)
    for b, entries in C.CUSTOM_CODES.items():
        by_code = {(ov, ob): (iv, ib) for (iv, ib, ov, ob) in entries}
        for look in range(32):
            for nb in range(1, 6):
                cw = look & ((1 << nb) - 1)
                hit = by_code.get((cw, nb))
                if hit is not None:
                    iv, ib = hit
                    hit_len[b, look] = nb
                    in_val[b, look] = int(C.reverse_bits(iv, ib))
                    in_bits[b, look] = ib
                    break
    return hit_len, in_val, in_bits


_CHIT, _CVAL, _CBITS = _build_custom_refill_lut()

# Context model tables (as arrays for vectorized lookups).
_LL = np.asarray(C.CONTEXT_TABLE_LL_LH_HL, np.int32)      # (3,3,5)
_HH = np.asarray(C.CONTEXT_TABLE_HH, np.int32)            # (5,5)
_SCTX = np.asarray(C.SIGN_CONTEXT_TABLE, np.int32)        # (5,5)
_SPRED = np.asarray(C.SIGN_PREDICTION_TABLE, np.int32)    # (5,5)


class LaneDecoders:
    """Vectorized interleaved decoders for LANES independent streams.

    data: (LANES, max_bytes) uint8, already positioned at each lane's
    plane payload; readable[l] bytes are valid (reads past return 0).
    encoded_bits: per-lane frozen total (the plane's data_length).
    """

    def __init__(self, data: np.ndarray, readable: np.ndarray,
                 encoded_bits: np.ndarray):
        n = data.shape[0]
        self.data = data
        self.readable = readable.astype(np.int64)
        self.encoded_bits = encoded_bits.astype(np.int64)
        self.pos = np.zeros(n, np.int64)
        self.decoded_words = np.zeros(n, np.int64)
        self.bin_n = np.zeros((17, n), np.int32)
        self.bin_low = np.zeros((17, n), np.int32)
        self.bin_index = np.zeros((17, n), np.int64)
        self.zero = np.full((17, n), 2, np.int32)
        self.total = np.full((17, n), 4, np.int32)
        self.err = np.zeros(n, bool)

    # -- raw stream access (vectorized bit_at; the pallas port replaces
    # this with per-lane lookahead registers) ------------------------------
    def _bits_at(self, pos, nbits_max: int):
        """Next ``nbits_max`` bits at per-lane ``pos`` (LSB-first)."""
        lanes = np.arange(self.data.shape[0])
        out = np.zeros(len(pos), np.int64)
        for i in range(nbits_max):
            p = pos + i
            byte_i = p >> 3
            ok = byte_i < self.readable
            b = np.where(ok, self.data[lanes, np.minimum(
                byte_i, self.data.shape[1] - 1)], 0)
            out |= ((b >> (p & 7)) & 1).astype(np.int64) << i
        return out

    # -- one decode_bit step over all lanes --------------------------------
    def decode_bit(self, ctx: np.ndarray, active: np.ndarray) -> np.ndarray:
        """Decode one context-modelled bit per active lane.

        ctx: (LANES,) context ids (0..16).  Marks lanes with stream errors
        in self.err (sticky); returns the decoded bits (garbage where
        inactive/errored).  Counter updates are the caller's job (exactly
        as in the sequential pipeline).
        """
        m = active & ~self.err
        lanes = np.arange(self.data.shape[0])
        zc = self.zero[ctx, lanes]
        tc = self.total[ctx, lanes]
        inv = zc < (tc >> 1)
        zeff = np.where(inv, tc - zc, zc)
        comp = zeff.astype(np.int64) * 65536
        bn = (comp[:, None] >= tc.astype(np.int64)[:, None]
              * _CUT[None, :]).sum(axis=1).astype(np.int32)

        need = m & ((self.bin_n[bn, lanes] <= 0)
                    | (self.decoded_words - self.bin_index[bn, lanes]
                       >= C.CIRC_BUF_SIZE))

        # ---- refill: Golomb bins ------------------------------------
        g = need & (bn >= 8)
        if g.any():
            look = self._bits_at(self.pos, 11)
            gm = _GOL_M[bn]
            gl = _GOL_L[bn]
            gi = _GOL_I[bn]
            first = (look & 1).astype(bool)
            # out-of-data guards (frozen totals), in reference order:
            # peek_bit has no guard; peek_bits(l) / (l+1) check l(+1).
            kl = np.zeros(len(lanes), np.int64)
            for i in range(1, 11):
                kl = np.where(gl >= i, (kl << 1) | ((look >> (i - 1)) & 1),
                              kl)  # reversed l bits
            short = ~first & (gl > self.encoded_bits)
            klong = np.zeros(len(lanes), np.int64)
            for i in range(1, 12):
                klong = np.where(gl + 1 >= i,
                                 (klong << 1) | ((look >> (i - 1)) & 1),
                                 klong)
            long_needed = ~first & (kl >= gi)
            short2 = ~first & long_needed & (gl + 1 > self.encoded_bits)
            gerr = g & (short | short2)
            self.err |= gerr
            gok = g & ~gerr
            adv = np.where(first, 1, np.where(long_needed, gl + 1, gl))
            zeros = np.where(first, gm,
                             np.where(long_needed, klong - gi, kl))
            ones = np.where(first, 0, 1)
            self.pos = np.where(gok, self.pos + adv, self.pos)
            self.bin_n[bn[gok], lanes[gok]] = (
                zeros[gok] + ones[gok]).astype(np.int32)
            self.bin_low[bn[gok], lanes[gok]] = ones[gok].astype(np.int32)

        # ---- refill: custom bins ------------------------------------
        cu = need & (bn >= 1) & (bn <= 7)
        if cu.any():
            look5 = self._bits_at(self.pos, 5).astype(np.int64)
            bnc = np.where(cu, bn, 1)
            hit = _CHIT[bnc, look5]
            ival = _CVAL[bnc, look5]
            ibits = _CBITS[bnc, look5]
            # reference guard: error when num_bits+1 >= encoded_bits is
            # hit before the match, i.e. when hit_len >= encoded_bits;
            # no-hit within 5 bits can only end in the invalid-data /
            # out-of-data guards (valid codes are <= 5 bits).
            cerr = cu & ((hit == 0) | (hit >= self.encoded_bits))
            self.err |= cerr
            cok = cu & ~cerr
            self.pos = np.where(cok, self.pos + hit, self.pos)
            self.bin_n[bn[cok], lanes[cok]] = ibits[cok]
            self.bin_low[bn[cok], lanes[cok]] = ival[cok]

        # ---- refill: uncoded bin ------------------------------------
        un = need & (bn == 0)
        if un.any():
            uerr = un & (1 > self.encoded_bits)
            self.err |= uerr
            uok = un & ~uerr
            v = (self._bits_at(self.pos, 1) & 1).astype(np.int32)
            self.pos = np.where(uok, self.pos + 1, self.pos)
            self.bin_n[bn[uok], lanes[uok]] = 1
            self.bin_low[bn[uok], lanes[uok]] = v[uok]

        done = need & ~self.err
        self.decoded_words = np.where(done, self.decoded_words + 1,
                                      self.decoded_words)
        self.bin_index[bn[done], lanes[done]] = self.decoded_words[done]

        # ---- consume top of stack -----------------------------------
        m2 = m & ~self.err
        n1 = self.bin_n[bn, lanes] - 1
        bitv = np.where(n1 < 5, (self.bin_low[bn, lanes] >> np.maximum(
            n1, 0)) & 1, 0).astype(np.int32)
        self.bin_n[bn[m2], lanes[m2]] = n1[m2]
        low_cleared = self.bin_low[bn, lanes] & ~np.where(
            n1 < 5, 1 << np.maximum(n1, 0), 0)
        self.bin_low[bn[m2], lanes[m2]] = low_cleared[m2]
        return np.where(m2, bitv ^ inv.astype(np.int32), 0)

    def update_counters(self, ctx, bit, active):
        m = active & ~self.err
        lanes = np.arange(self.data.shape[0])
        tc = self.total[ctx, lanes] + 1
        zc = self.zero[ctx, lanes] + (bit == 0)
        resc = tc >= C.CONTEXT_RESCALING_CAP
        tc = np.where(resc, tc >> 1, tc)
        zc = np.where(resc & (zc > tc), zc >> 1, zc)
        self.total[ctx[m], lanes[m]] = tc[m]
        self.zero[ctx[m], lanes[m]] = zc[m]


def decode_plane_lanes(seg: np.ndarray, h: np.ndarray, w: np.ndarray,
                       subband: np.ndarray, lsb: np.ndarray,
                       mag_bits: np.ndarray, dec: LaneDecoders,
                       active: np.ndarray) -> np.ndarray:
    """Decode one bitplane for LANES segments in lock-step.

    seg: (Hmax, Wmax, LANES) int32 sign-magnitude state, updated in
    place.  h/w/subband/lsb/mag_bits: per-lane int32.  active: lanes
    participating in this plane round.  Returns the per-lane success mask
    (False where the decoder flagged a stream error; partial updates
    remain, matching the reference's stop-refining behavior).

    Pixel (r, c) is processed for every lane with r < h and c < w; the
    zero padding outside a lane's rectangle doubles as the reference's
    "insignificant outside the segment" border rule.
    """
    Hmax, Wmax, n = seg.shape
    lanes = np.arange(n)
    magmask = (np.int64(1) << mag_bits.astype(np.int64)).astype(np.int32) - 1
    prev = lsb + 1
    is_hl = subband == C.SUBBAND_HL
    is_hh = subband == C.SUBBAND_HH
    started = active & ~dec.err

    def sig(r, c, plane):
        v = seg[r, c] & magmask
        return ((v >> plane) != 0).astype(np.int32)

    def sgn(r, c, plane):
        s = sig(r, c, plane)
        neg = (seg[r, c] >> mag_bits) & 1
        return np.where(s != 0, -neg, 0)

    for r in range(int(Hmax)):
        row_act = started & (r < h)
        if not row_act.any():
            continue
        for c in range(int(Wmax)):
            act = row_act & (c < w) & ~dec.err
            if not act.any():
                continue
            v = seg[r, c]
            mag = v & magmask
            msb = np.zeros(n, np.int32)
            mm = mag.copy()
            while (mm > 1).any():
                adv = mm > 1
                msb += adv
                mm = np.where(adv, mm >> 1, mm)
            cat = np.clip(msb - lsb, 0, 3)

            hc = np.zeros(n, np.int32)
            vc = np.zeros(n, np.int32)
            dc = np.zeros(n, np.int32)
            if c > 0:
                hc += sig(r, c - 1, lsb)
            hc += np.where(c + 1 < w, sig(r, min(c + 1, Wmax - 1), prev), 0)
            if r > 0:
                vc += sig(r - 1, c, lsb)
            vc += np.where(r + 1 < h, sig(min(r + 1, Hmax - 1), c, prev), 0)
            if r > 0 and c > 0:
                dc += sig(r - 1, c - 1, lsb)
            if c > 0:
                dc += np.where(r + 1 < h,
                               sig(min(r + 1, Hmax - 1), c - 1, prev), 0)
            if r > 0:
                dc += np.where(c + 1 < w,
                               sig(r - 1, min(c + 1, Wmax - 1), lsb), 0)
            dc += np.where((r + 1 < h) & (c + 1 < w),
                           sig(min(r + 1, Hmax - 1), min(c + 1, Wmax - 1),
                               prev), 0)

            hh = np.where(is_hl, vc, hc)
            vv = np.where(is_hl, hc, vc)
            ctx = np.where(
                cat == 0,
                np.where(is_hh, _HH[np.minimum(hh + vv, 4), dc],
                         _LL[np.minimum(hh, 2), np.minimum(vv, 2), dc]),
                np.where(cat == 1, np.where(hc + vc == 0, 9, 10),
                         11)).astype(np.int32)

            is_cat3 = cat == 3
            # cat 3: uncoded bin with fixed counts (1, 2)
            ctx_eff = ctx
            zc_save = None
            if is_cat3.any():
                # emulate fixed (1,2) counters through the same machine:
                # temporarily swap in (1,2) for context 0 rows? Instead,
                # call decode_bit with a virtual context: patch counters.
                zc_save = (dec.zero[0].copy(), dec.total[0].copy())
                dec.zero[0, is_cat3] = 1
                dec.total[0, is_cat3] = 2
                ctx_eff = np.where(is_cat3, 0, ctx)
            bit = dec.decode_bit(ctx_eff, act)
            if zc_save is not None:
                dec.zero[0] = zc_save[0]
                dec.total[0] = zc_save[1]
            ok = act & ~dec.err
            seg[r, c] = np.where(ok, v | (bit << lsb), seg[r, c])
            dec.update_counters(ctx, bit, ok & ~is_cat3)

            sgn_act = ok & (cat == 0) & (bit == 1)
            if sgn_act.any():
                sh = np.full(n, 2, np.int32)
                sv = np.full(n, 2, np.int32)
                if c > 0:
                    sh += sgn(r, c - 1, lsb)
                sh += np.where(c + 1 < w,
                               sgn(r, min(c + 1, Wmax - 1), prev), 0)
                if r > 0:
                    sv += sgn(r - 1, c, lsb)
                sv += np.where(r + 1 < h,
                               sgn(min(r + 1, Hmax - 1), c, prev), 0)
                sh2 = np.where(is_hl, sv, sh)
                sv2 = np.where(is_hl, sh, sv)
                sctx = _SCTX[sh2, sv2]
                pred = _SPRED[sh2, sv2]
                agree = dec.decode_bit(sctx, sgn_act)
                ok2 = sgn_act & ~dec.err
                actual = (agree ^ pred) & 1
                seg[r, c] = np.where(ok2, seg[r, c] | (actual << mag_bits),
                                     seg[r, c])
                dec.update_counters(sctx, agree, ok2)
    return started & ~dec.err
