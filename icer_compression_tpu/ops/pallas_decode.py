"""Pallas TPU kernel: batched ICER bitplane decoding.

One kernel call decodes ONE bitplane for LANES independent segments in
lock-step (the missing TPU-side decode path; planes of a segment chain
sequentially through repeated calls, exactly like the reference's
per-segment plane loop).  The semantic model -- bin-FIFO stacks as
(depth, low-5-bits) registers, the dense custom-code refill LUT, frozen
out-of-data guards, sticky per-lane error flags -- is ops/decode_lanes.py,
differentially validated against the sequential reference decoder; this
kernel reproduces it within Mosaic's vectorization envelope:

  * per-lane state lives in (17, LANES) registers (17-way select/masked
    broadcast, as in ops/pallas_entropy);
  * neighbor significance/sign come from eight rolling row buffers in
    VMEM -- the same scheme as the native C++ decoder
    (backend/native/icer_runtime.cpp decode_plane) -- swept in (8, LANES)
    tiles with a carried "previous tile" register so the left neighbor
    reflects the just-decoded pixel;
  * stream reads use per-lane bit positions with a one-hot two-word
    fetch over the (NW, LANES) word-transposed streams (Mosaic has no
    per-lane dynamic indexing); bits past each lane's readable extent
    are zero, matching the reference's bounds-replicated zero-copy
    over-read.

Layout contract (all int32):
  words:  (NW, LANES)  lane l's plane payload bits, word w = bits
          [32w, 32w+32) LSB-first, including over-read slack.
  geom:   (8, LANES)   rows: h, w, subband, lsb, mag_bits, active,
          encoded_bits (frozen data_length), readable_bits.
  seg:    (PX, LANES)  sign-magnitude coefficients, pixel (r, c) at row
          r * Wpad + c; aliased in/out.  Wpad % 8 == 0; columns >= w and
          rows >= h are untouched padding (doubling as the
          "insignificant outside the segment" border).
Returns (seg, err, pos): sticky error flags and final bit positions.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from . import decode_lanes as DL
from .context_model import (_ctx_hh_formula, _ctx_ll_formula,
                            _sign_formula)

LANES = 128

_CUT = [int(x) for x in C.BIN_PROBABILITY_CUTOFFS[:16]]
_GOL = [(int(C.GOLOMB_M[b]), int(C.GOLOMB_L[b]), int(C.GOLOMB_I[b]))
        for b in range(17)]


def _pack(vals, width):
    per = 32 // width
    words = []
    for w0 in range(0, len(vals), per):
        word = 0
        for k, v in enumerate(vals[w0:w0 + per]):
            word |= int(v) << (k * width)
        words.append(word)
    return words, per, width


# custom-code refill LUTs from the validated model (bin 1..7 x 32 lookups)
_RHIT = {b: _pack(list(DL._CHIT[b]), 4) for b in range(1, 8)}
_RVAL = {b: _pack(list(DL._CVAL[b]), 8) for b in range(1, 8)}
_RBITS = {b: _pack(list(DL._CBITS[b]), 4) for b in range(1, 8)}

# combined custom-refill LUT for the sublane-parallel lookup: entry =
# hit(4b) | in_bits(4b) | in_val(8b), keyed (bin-1)*32 + look5, packed
# two 16-bit entries per int32 word -> 112 words
_CPACK = np.zeros(7 * 32, np.int64)
for _b in range(1, 8):
    for _lk in range(32):
        _CPACK[(_b - 1) * 32 + _lk] = (int(DL._CHIT[_b][_lk])
                                       | (int(DL._CBITS[_b][_lk]) << 4)
                                       | (int(DL._CVAL[_b][_lk]) << 8))
_CPACK2 = (_CPACK[0::2] | (_CPACK[1::2] << 16)).astype(
    np.uint32).view(np.int32)                       # (112,)

# golomb (m, l, i) packed per bin: m 10b | l 4b | i 10b (default bin: 1,1,0)
_GOLPK = [(m & 1023) | (l << 10) | (i << 14) for (m, l, i) in _GOL]
_GOLPK_NP = np.asarray([_GOLPK[b] if b >= 8 else (1 | (1 << 10))
                        for b in range(17)], np.int32)
_CUT_NP = np.asarray(_CUT, np.int32)                 # (16,)


def _plookup(packed, idx, jnp):
    words, per, width = packed
    mask = (1 << width) - 1
    wi = idx // per
    off = (idx % per) * width
    out = jnp.zeros_like(idx)
    for k, word in enumerate(words):
        out = jnp.where(wi == k, (jnp.int32(word) >> off) & mask, out)
    return out


def make_decode_plane_pallas(PX: int, Wpad: int, NW: int, interpret=False,
                             nrounds: int | None = None,
                             lanes: int = LANES):
    """Kernel factory: decode bitplanes of ``lanes`` segments.

    ``lanes`` (multiple of 128) widens the lock-step lane block: the
    per-step cost is dominated by the serial dependency chain's ALU
    latency, so wider blocks amortize it (same flat-in-width behavior
    as the encode kernel) at the cost of proportional VMEM.

    PX = padded pixel rows of the seg array (multiple of Wpad), Wpad the
    padded width (multiple of 8), NW the stream word rows per round.

    With ``nrounds=None`` one call decodes a single plane (words (NW,
    LANES), geom (8, LANES), seg (PX, LANES)).  With ``nrounds=R`` the
    kernel grids over R plane rounds in one call -- words (R*NW, LANES)
    and geom (R*8, LANES) stacked per round, NO seg input (every fused
    decode starts from a zero canvas, zeroed in-kernel at round 0 instead
    of shipping a (PX, LANES) zeros block through VMEM) -- and the
    per-lane retirement mask (first missing plane or stream error stops a
    lane for all later rounds, matching the reference's per-segment plane
    loop) persists in the err output across rounds.  One device round
    trip for a whole bucket's decode.

    Stream windows may be TILE-ALIGNED: geom row 5 packs the active flag
    (bit 0) with the window's byte misalignment (bits 1-5, 0..31 bytes:
    windows start at the enclosing 8-word tile) -- the lane's payload
    starts at bit position (misalign * 8) inside the window, and the
    decoder's initial bit position starts there.  Callers that build
    byte-exact windows just pass active (misalign 0).  This lets the
    fused assembly gather whole 8-word tile rows (one contiguous copy
    per index) instead of serialized per-word gathers.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os as _os
    _ABL = _os.environ.get("ICER_DECODE_ABLATE", "")  # cost-probe only:
    #   "norefill" / "nosign" / "stub" disable kernel stages (WRONG
    #   results; used by scripts/bench_decode_kernel.py share probes)
    # Zero-tile fast path (exact): a tile where EVERY lane's 8 pixels are
    # inactive or decode a zero bit as category 0 skips the sequential
    # pixel walk -- contexts/bins batch-verify vectorized over the tile,
    # counters/stacks batch-update, canvas/sign state provably untouched.
    # MSB plane rounds are ~100% such tiles (scripts/probe_zerotile.py:
    # 31% of all tile-steps at B=21).  Disabled under ablation probes so
    # stage shares measure the slow path.
    _FAST = (_os.environ.get("ICER_DECODE_FAST", "1") != "0"
             and _ABL in ("", "freefast"))
    # The refill / sign-pass machinery runs UNCONDITIONALLY by default
    # (internally masked, exact): at 126 lock-step lanes the scalar
    # any() + scf.if gates fire nearly every step anyway, and the gate
    # overhead measured 15% of the whole kernel (87.6 -> 74.0 ms on the
    # 512^2 stage-1 block, checksum-identical).  ICER_DECODE_COND=1
    # restores the gated form (narrow-lane or sparse-content callers).
    _UNCOND = (_os.environ.get("ICER_DECODE_COND") != "1"
               and _ABL != "norefill" and _ABL != "nosign")
    # The SIGN pass stays scalar-cond-gated by default: unlike the refill
    # gate, skipping it skips a whole second decode_bit (~40% of a step),
    # so the gate pays for itself unless nearly every step has a sign
    # event.  ICER_DECODE_SIGN_UNCOND=1 runs it unconditionally (exact:
    # an all-false act mask is a state no-op) for wide-lane A/B.
    _SUNCOND = (_os.environ.get("ICER_DECODE_SIGN_UNCOND") == "1"
                and _UNCOND and _ABL != "nosign")
    # ring-scan variant: 1 (default) scans the demanding lanes' [min,
    # max] tile range per sweep; 0 restores the [0, max) prefix scan
    # (A/B: the min-bound saves iterations when lane frontiers cluster,
    # but costs one extra cross-lane reduce per sweep)
    _SCANV = _os.environ.get("ICER_DECODE_SCANV", "1") != "0"
    # debug instrumentation: the pos output carries (fast_tiles |
    # zeroish_tiles << 16) instead of bit positions (bench-only)
    _DBG = _os.environ.get("ICER_DECODE_DEBUG") == "1" and _FAST

    LANES = lanes            # shadows the module default for the closure
    assert LANES % 128 == 0
    assert Wpad % 8 == 0 and PX % Wpad == 0
    assert NW % 8 == 0 and NW >= 16  # ring needs two tiles
    Hmax = PX // Wpad
    ntiles = Wpad // 8
    NBUF = Wpad + 16  # row buffers with one spare tile each side

    multi = nrounds is not None

    # constant LUT block (one VMEM input, read once per round): rows
    # 0..15 the bin cutoff ladder, 16..32 packed golomb params, 33..144
    # the combined custom-refill LUT (hit|bits<<4|val<<8, 2 entries/word)
    _LUTS = np.zeros((152, LANES), np.int32)
    _LUTS[0:16] = _CUT_NP[:, None]
    _LUTS[16:33] = _GOLPK_NP[:, None]
    _LUTS[33:145] = _CPACK2[:, None]

    def kernel(words_ref, geom_ref, luts_ref, *refs):
        if multi:
            (out_ref, err_ref, pos_ref, buf_ref, ring_ref, win_ref,
             dsem) = refs
        else:
            seg_ref, out_ref, err_ref, pos_ref, buf_ref, ring_ref = refs
        cutc = luts_ref[0:16, :]
        golc = luts_ref[16:33, :]
        cpkc = luts_ref[33:145, :]
        # buf_ref: (8, NBUF, LANES) scratch: rolling row buffers
        #   0 above_sig_lsb  1 cur_sig_lsb  2 cur_sig_prev  3 below_sig_prev
        #   4 above_sgn_lsb  5 cur_sgn_lsb  6 cur_sgn_prev  7 below_sgn_prev
        h_l = geom_ref[0, :]
        w_l = geom_ref[1, :]
        subband = geom_ref[2, :]
        lsb = geom_ref[3, :]
        mag_bits = geom_ref[4, :]
        g5 = geom_ref[5, :]
        active0 = (g5 & 1) != 0
        # tile-aligned windows: payload starts (misalign * 8) bits in,
        # misalign up to 31 bytes (windows start at 8-word tiles so the
        # host gather runs at row, not scalar, granularity)
        pos0 = ((jax.lax.shift_right_logical(g5, 1)) & 31) * 8
        ebits = geom_ref[6, :]
        readable = geom_ref[7, :]
        if multi:
            g = pl.program_id(0)
            # retirement persists across rounds via the err output block
            prev_err = jnp.where(g == 0, 0, err_ref[0, :])
            # window-clip hazard accumulates across rounds via the pos
            # output block (read before the init section zeroes it)
            prev_haz = jnp.where(g == 0, 0, pos_ref[0, :])
        else:
            g = 0
            prev_err = jnp.zeros((LANES,), jnp.int32)
            prev_haz = jnp.zeros((LANES,), jnp.int32)
        magmask = (jnp.int32(1) << mag_bits) - 1
        prev = lsb + 1
        is_hl = subband == 1
        is_hh = subband == 3
        iota17 = jax.lax.broadcasted_iota(jnp.int32, (17, LANES), 0)

        if multi:
            # The coefficient canvas STREAMS through HBM: out lives in
            # ANY memory space (VMEM at wide lane blocks would be PX *
            # LANES * 4 bytes -- 5.8 MB per 128 lanes for the 512^2
            # stage-1 bucket, the former lane-width ceiling) and a 4-slot
            # rolling row window in VMEM holds rows [r, r+2].  Access is
            # strictly row-sequential, so one synchronous DMA read +
            # write per row suffices (~Wpad*LANES*4 bytes each, ~2% of a
            # row's compute time; no double buffering needed).  Round 0
            # starts from a zero canvas: the freshly loaded slot is
            # zeroed instead of shipping a zeros block.
            def _slot(r):
                return (r & 3) * Wpad

            def canvas_tile(r, t):
                return win_ref[pl.ds(_slot(r) + t * 8, 8), :]

            def canvas_tile_write(r, t, vals):
                win_ref[pl.ds(_slot(r) + t * 8, 8), :] = vals

            def canvas_load(r):
                dma = pltpu.make_async_copy(
                    out_ref.at[pl.ds(r * Wpad, Wpad), :],
                    win_ref.at[pl.ds(_slot(r), Wpad), :], dsem.at[0])
                dma.start()
                dma.wait()

                @pl.when(g == 0)
                def _():
                    win_ref[pl.ds(_slot(r), Wpad), :] = jnp.zeros(
                        (Wpad, LANES), jnp.int32)

            def canvas_store(r):
                dma = pltpu.make_async_copy(
                    win_ref.at[pl.ds(_slot(r), Wpad), :],
                    out_ref.at[pl.ds(r * Wpad, Wpad), :], dsem.at[1])
                dma.start()
                dma.wait()
        else:
            out_ref[:] = seg_ref[:]

            def canvas_tile(r, t):
                return out_ref[pl.ds(r * Wpad + t * 8, 8), :]

            def canvas_tile_write(r, t, vals):
                out_ref[pl.ds(r * Wpad + t * 8, 8), :] = vals

            def canvas_load(r):
                pass

            def canvas_store(r):
                pass

        # State selects/writes run in SUBLANE-PARALLEL form: a (17, LANES)
        # one-hot mask (3 vregs) feeds one masked reduce per select and
        # one masked where per write, instead of 17-deep chains of
        # one-vreg compare+select steps (~12 vector ops vs ~34).
        def selrows(mask, st):
            return jnp.sum(jnp.where(mask, st, 0), axis=0)

        def golpk_tree(bv):
            """Packed golomb (m, l, i) for bin ``bv`` via a constant
            select tree (3 levels over bins 8..15 + the bin-16 leaf):
            ~12 (1, LANES) ops vs a (17, LANES) one-hot reduce.  Values
            for bv < 8 are arbitrary real params -- callers mask golomb
            results with bn >= 8, exactly as they did the former
            harmless-default rows."""
            b0 = (bv & 1) != 0
            b1 = (bv & 2) != 0
            b2 = (bv & 4) != 0
            pe = jnp.where(
                b2,
                jnp.where(b1, jnp.where(b0, _GOLPK[15], _GOLPK[14]),
                          jnp.where(b0, _GOLPK[13], _GOLPK[12])),
                jnp.where(b1, jnp.where(b0, _GOLPK[11], _GOLPK[10]),
                          jnp.where(b0, _GOLPK[9], _GOLPK[8])))
            return jnp.where(bv >= 16, _GOLPK[16], pe)

        # ---- stream access: per-lane 512-bit ring ---------------------
        # Each lane holds words [rbase, rbase+16) of its stream in two
        # (8, LANES) register tiles (r0, r1).  A single one-hot scan over
        # the word array -- serving ALL lanes at once -- tops the ring up
        # once per 8-pixel tile (consumption is <= 22 bits/pixel, so one
        # 8-word advance per sweep keeps every lookahead in-ring).  Bits
        # past a lane's readable extent are zeroed at fetch time (the
        # reference's zero-copy over-read reads zeros here).
        iota8L = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def mask_readable_tile(tile, tidx):
            wglob = tidx[None, :] * 8 + iota8L
            rem = readable[None, :] - wglob * 32
            remc = jnp.clip(rem, 0, 31)
            keep = jnp.where(
                rem >= 32, -1,
                jnp.where(rem <= 0, 0, (jnp.int32(1) << remc) - 1))
            return tile & keep

        def scan_tiles(tidx, demand):
            # (1, LANES) -> (8, LANES) broadcasts must be anchored on an
            # (8, LANES) iota: Mosaic cannot relayout a natural (1, 128)
            # vector into a sublane-replicated destination inside a loop.
            tidx8 = jnp.concatenate([tidx[None, :]] * 8, axis=0)

            def body(t, acc):
                rows = words_ref[pl.ds(t * 8, 8), :]
                return jnp.where(tidx8 == t, rows, acc)
            # scan only [lo, hi): lanes consume monotonically, so tiles
            # past max(tidx) can't be needed, and non-demanding lanes'
            # results are discarded by the caller -- the scan cost is the
            # SPREAD of the demanding lanes' frontiers (usually a few
            # tiles), not the frontier depth itself (a [0, max) scan paid
            # O(frontier) selects per sweep, quadratic over a round)
            hi = jnp.minimum(jnp.max(jnp.where(demand, tidx + 1, 0)),
                             NW // 8)
            lo = (jnp.min(jnp.where(demand, tidx, NW // 8)) if _SCANV
                  else 0)
            acc = jax.lax.fori_loop(lo, hi, body,
                                    jnp.zeros((8, LANES), jnp.int32))
            return mask_readable_tile(acc, tidx)

        # The ring lives in VMEM scratch, not in loop carries: Mosaic's
        # layout inference rejects 1D carries that are conditionally
        # updated against other carries (relayout natural->replicated),
        # so the mutable ring state is read/written through ring_ref.
        def ring_sweep(pos):
            r0 = ring_ref[0:8, :]
            r1 = ring_ref[8:16, :]
            rbase = ring_ref[16, :]
            wi = (pos >> 5) - rbase
            shift = wi >= 8
            shift8 = shift[None, :]
            # only lanes that shift need a fetch; the scan runs over the
            # demanding lanes' [min, max] tile range (empty when nothing
            # shifts)
            fetched = scan_tiles((rbase >> 3) + 2, shift)
            ring_ref[0:8, :] = jnp.where(shift8, r1, r0)
            ring_ref[8:16, :] = jnp.where(shift8, fetched, r1)
            ring_ref[16, :] = jnp.where(shift, rbase + 8, rbase)

        def ring_look11(pos):
            # two (16, LANES) masked reduces over the ring block replace
            # the former 16-way one-vreg select chains (2 x ~48 vector
            # ops -> ~20)
            ring = ring_ref[0:16, :]
            rbase = ring_ref[16, :]
            wi = (pos >> 5) - rbase    # 0..14 by the sweep invariant
            off = pos & 31
            io16 = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0)
            wi16 = wi[None, :]
            w0 = selrows(io16 == wi16, ring)
            w1 = selrows(io16 == wi16 + 1, ring)
            lo = jax.lax.shift_right_logical(w0, off)
            hi = jnp.where(off == 0, 0,
                           jax.lax.shift_left(w1, (32 - off) & 31))
            return ((lo | hi) & 0x7FF).astype(jnp.int32)

        # ---- one decode_bit over all lanes --------------------------
        # Per-lane coder state is packed to halve the 17-way
        # select/broadcast chains: zt = zero | total << 9 (counters cap
        # at 500), nl = n | low << 11 | age << 19 (bin-FIFO depth 11b --
        # a golomb refill can push up to 2^(l+1) entries -- low bits 8b,
        # staleness age 12b).  ``age`` counts decoded codewords since the
        # bin's stack
        # was refilled (the reference's decoded_words - bin_decode_index):
        # every successful refill ticks ALL bins' ages by one broadcast
        # add, replacing the former (17, LANES) bn_idx state and its
        # select/write chains; tile_body clamps ages at CIRC_BUF_SIZE
        # (the test is >=) so the 13-bit field cannot wrap.
        def decode_bit(st, ctx, act, cat3, zlo=0, zhi=12):
            # zlo/zhi bound the context-counter select/write rows:
            # magnitude bits only touch contexts 0..11, the (cond-gated)
            # sign pass only 12..16
            (zt, nl, pos, erri) = st
            if _ABL == "stub":
                return st, jnp.zeros((LANES,), jnp.int32)
            err = erri != 0
            m = act & ~err
            # context one-hot over the pass's OWN row range only (mag
            # 0..11, sign 12..16): the compare and the counter write
            # shrink with it
            iz = (jax.lax.broadcasted_iota(jnp.int32,
                                           (zhi - zlo, LANES), 0)
                  == (ctx - zlo)[None, :])
            ztc = selrows(iz, zt[zlo:zhi])
            zc0 = ztc & 511
            tc0 = jax.lax.shift_right_logical(ztc, 9)
            zc = jnp.where(cat3, 1, zc0)
            tc = jnp.where(cat3, 2, tc0)
            inv = zc < (tc >> 1)
            zeff = jnp.where(inv, tc - zc, zc)
            comp = zeff * 65536
            # bin selection, width-dependent (A/B'd both ways on chip):
            # at <= 512 lanes the kernel is latency-bound and the one-hot
            # ladder's shorter serial path (mul+cmp+sum tree, ~7 deps)
            # wins; past 512 the (16, LANES) blocks' issue cost dominates
            # and the 4-test binary search over constant cutoffs (+ one
            # direct bn=16 test, ~14 deps but ~27 ops) is faster
            if LANES <= 512:
                bn = jnp.sum((comp[None, :] >= tc[None, :] * cutc).astype(
                    jnp.int32), axis=0)
            else:
                t3 = comp >= tc * _CUT[7]
                c4v = jnp.where(t3, _CUT[11], _CUT[3])
                t2 = comp >= tc * c4v
                c2v = jnp.where(t3, jnp.where(t2, _CUT[13], _CUT[9]),
                                jnp.where(t2, _CUT[5], _CUT[1]))
                t1 = comp >= tc * c2v
                c1v = jnp.where(
                    t3,
                    jnp.where(t2, jnp.where(t1, _CUT[14], _CUT[12]),
                              jnp.where(t1, _CUT[10], _CUT[8])),
                    jnp.where(t2, jnp.where(t1, _CUT[6], _CUT[4]),
                              jnp.where(t1, _CUT[2], _CUT[0])))
                t0 = comp >= tc * c1v
                bn = ((t3.astype(jnp.int32) << 3)
                      | (t2.astype(jnp.int32) << 2)
                      | (t1.astype(jnp.int32) << 1)
                      | t0.astype(jnp.int32))
                bn = jnp.where(comp >= tc * _CUT[15], 16, bn)

            ibn = iota17 == bn[None, :]
            nlb = selrows(ibn, nl)
            sn = nlb & 2047
            low_old = jax.lax.shift_right_logical(nlb, 11) & 255
            age = jax.lax.shift_right_logical(nlb, 19)
            need = m & ((sn <= 0) | (age >= C.CIRC_BUF_SIZE))

            # The refill machinery (ring lookahead + Golomb / custom-LUT
            # codeword parse, ~300 vector ops) is SKIPPED whenever no lane
            # refills this step via scalar-predicated cond: a refill with
            # an all-false need mask provably changes nothing (okany
            # false => pos/nl/err unchanged), so the guard is pure
            # savings.  Stacks hold several bits per codeword, so most
            # steps skip.  Same trick again inside for the custom-LUT
            # block (the single largest select chain) and the Golomb
            # parse: MSB planes are golomb-dominated, LSB planes custom-
            # dominated, so one of the two inner blocks usually skips.
            def do_refill(pos, erri):
                look = ring_look11(pos)

                # Golomb refill
                isg = bn >= 8
                g = need & isg
                first = (look & 1) != 0

                def golomb_parse(_):
                    pe = golpk_tree(bn)      # packed (m, l, i); results
                    #                          masked with bn >= 8 below
                    m_e = pe & 1023
                    l_e = jax.lax.shift_right_logical(pe, 10) & 15
                    i_e = jax.lax.shift_right_logical(pe, 14)
                    # kl = reverse of the low l_e bits of look: closed-form
                    # 16-bit bit reversal (4 swap rounds) + top-bits shift
                    # replaces the former 10-step shift-in build loop
                    v = look
                    v = ((jax.lax.shift_right_logical(v, 1) & 0x5555)
                         | ((v & 0x5555) << 1))
                    v = ((jax.lax.shift_right_logical(v, 2) & 0x3333)
                         | ((v & 0x3333) << 2))
                    v = ((jax.lax.shift_right_logical(v, 4) & 0x0F0F)
                         | ((v & 0x0F0F) << 4))
                    v = ((jax.lax.shift_right_logical(v, 8) & 0x00FF)
                         | ((v & 0x00FF) << 8))
                    kl = jax.lax.shift_right_logical(v, 16 - l_e)
                    # the (l_e+1)-bit reversed prefix is the l_e-bit one
                    # with the next lookahead bit appended (bit l_e is a
                    # vector shift, not another 11-step build loop)
                    klong = (kl << 1) | (
                        jax.lax.shift_right_logical(look, l_e) & 1)
                    long_needed = (~first) & (kl >= i_e)
                    gerr = g & (~first) & ((l_e > ebits)
                                           | (long_needed
                                              & (l_e + 1 > ebits)))
                    adv_g = jnp.where(first, 1,
                                      jnp.where(long_needed, l_e + 1, l_e))
                    zeros_g = jnp.where(first, m_e,
                                        jnp.where(long_needed,
                                                  klong - i_e, kl))
                    return adv_g, zeros_g, gerr

                z1 = jnp.zeros((LANES,), jnp.int32)
                # cond results cross the scf.if boundary as int32: Mosaic
                # rejects i1 mask vectors as branch yields (layout cast)
                if _UNCOND:
                    a_, z_, e_ = golomb_parse(0)
                    adv_g, zeros_g, gerr_i = a_, z_, e_.astype(jnp.int32)
                else:
                    adv_g, zeros_g, gerr_i = jax.lax.cond(
                        jnp.any(g),
                        lambda _: (lambda a, z, e:
                                   (a, z, e.astype(jnp.int32)))(
                            *golomb_parse(0)),
                        lambda _: (z1, z1, z1), 0)
                gerr = gerr_i != 0
                gok = g & ~gerr
                ones_g = jnp.where(first, 0, 1)

                # Custom refill (dense 5-bit-lookahead LUT)
                isc = (bn >= 1) & (bn <= 7)
                cu = need & isc
                look5 = look & 31

                def custom_parse(_):
                    # one (112, LANES) masked fetch of the combined packed
                    # LUT (hit | bits<<4 | val<<8, two entries per word)
                    # replaces 7 bins x 3 packed-word select chains
                    key = (jnp.clip(bn - 1, 0, 6) << 5) | look5
                    io112 = jax.lax.broadcasted_iota(jnp.int32,
                                                     (112, LANES), 0)
                    wsel = jax.lax.shift_right_logical(key, 1)
                    word = selrows(io112 == wsel[None, :], cpkc)
                    ent = jnp.where((key & 1) != 0,
                                    jax.lax.shift_right_logical(word, 16),
                                    word) & 0xFFFF
                    hit = ent & 15
                    ival = jax.lax.shift_right_logical(ent, 8)
                    ibits = jax.lax.shift_right_logical(ent, 4) & 15
                    return hit, ival, ibits

                if _UNCOND:
                    hit, ival, ibits = custom_parse(0)
                else:
                    hit, ival, ibits = jax.lax.cond(
                        jnp.any(cu), custom_parse,
                        lambda _: (z1, z1, z1), 0)
                cerr = cu & ((hit == 0) | (hit >= ebits))
                cok = cu & ~cerr

                # Uncoded refill
                un = need & (bn == 0)
                uerr = un & (ebits < 1)
                uok = un & ~uerr

                err2 = gerr | cerr | uerr
                okany = gok | cok | uok
                adv = jnp.where(gok, adv_g, jnp.where(cok, hit, 1))
                new_n = jnp.where(gok, zeros_g + ones_g,
                                  jnp.where(cok, ibits, 1))
                new_low = jnp.where(gok, ones_g,
                                    jnp.where(cok, ival, look & 1))
                return (okany.astype(jnp.int32), adv, new_n, new_low,
                        err2.astype(jnp.int32))

            def no_refill(pos, erri):
                z = jnp.zeros((LANES,), jnp.int32)
                return z, z, z, z, z

            if _UNCOND and _ABL != "norefill":
                # no scalar any()+scf.if gate: always run the
                # (internally masked) refill -- see _UNCOND note
                okany_i, adv, new_n, new_low, err2_i = do_refill(pos,
                                                                 erri)
            else:
                okany_i, adv, new_n, new_low, err2_i = jax.lax.cond(
                    jnp.bool_(False) if _ABL == "norefill"
                    else jnp.any(need),
                    do_refill, no_refill, pos, erri)
            okany = okany_i != 0
            err = err | (err2_i != 0)
            erri = jnp.where(err, 1, erri).astype(jnp.int32)
            pos = jnp.where(okany, pos + adv, pos)

            # one decoded word: every bin's stack ages by one (the write
            # below resets the refilled bin's age to zero)
            nl = nl + jnp.where(okany, jnp.int32(1) << 19, 0)[None, :]

            # consume top of stack; refilled lanes (okany, a subset of
            # m2) consume from the just-computed (new_n, new_low), so no
            # re-select of the written state is needed
            m2 = m & ~err
            n_now = jnp.where(okany, new_n, sn)
            low_now = jnp.where(okany, new_low, low_old)
            age_now = jnp.where(okany, 0, age)
            n1 = n_now - 1
            n1c = jnp.clip(n1, 0, 31)
            bitv = jnp.where(n1 < 5,
                             jax.lax.shift_right_logical(low_now, n1c) & 1,
                             0)
            cleared = low_now & ~jnp.where(n1 < 5,
                                           jax.lax.shift_left(
                                               jnp.int32(1), n1c), 0)
            nlw = (n1 | jax.lax.shift_left(cleared, 11)
                   | jax.lax.shift_left(age_now, 19))
            nl = jnp.where(ibn & m2[None, :], nlw[None, :], nl)
            bit = jnp.where(m2, bitv ^ inv.astype(jnp.int32), 0)

            # counter update (skipped for the fixed cat-3 pseudo-context)
            mu = m2 & ~cat3
            tc2 = tc0 + 1
            zc2 = zc0 + jnp.where(bit == 0, 1, 0)
            resc = tc2 >= C.CONTEXT_RESCALING_CAP
            tc2 = jnp.where(resc, tc2 >> 1, tc2)
            zc2 = jnp.where(resc & (zc2 > tc2), zc2 >> 1, zc2)
            ztw = zc2 | jax.lax.shift_left(tc2, 9)
            ztn = jnp.where(iz & mu[None, :], ztw[None, :], zt[zlo:zhi])
            if zlo == 0:
                zt = jnp.concatenate([ztn, zt[zhi:]], axis=0)
            else:
                zt = jnp.concatenate([zt[:zlo], ztn], axis=0)
            return (zt, nl, pos, erri), bit

        # ---- row buffer fills ---------------------------------------
        ONEB = NBUF // 8

        def fill_row(bsel_sig, bsel_sgn, r):
            """buf[bsel_*][8 + c] = sig/sgn of seg row r at plane prev
            (above/cur-at-lsb rows only ever come from copies + in-place
            updates, never from a fill)."""
            plane = prev

            def tilefill(t, _):
                rows = canvas_tile(r, t)
                mag = rows & magmask[None, :]
                s = ((jax.lax.shift_right_logical(mag, plane[None, :]))
                     != 0).astype(jnp.int32)
                neg = jax.lax.shift_right_logical(
                    rows, mag_bits[None, :]) & 1
                sg = jnp.where(s != 0, -neg, 0)
                valid_row = (r < h_l)[None, :]
                s = jnp.where(valid_row, s, 0)
                sg = jnp.where(valid_row, sg, 0)
                buf_ref[bsel_sig, pl.ds(8 + t * 8, 8), :] = s
                buf_ref[bsel_sgn, pl.ds(8 + t * 8, 8), :] = sg
                return 0

            jax.lax.fori_loop(0, ntiles, tilefill, 0)

        def zero_row(bsel):
            buf_ref[bsel, :, :] = jnp.zeros((NBUF, LANES), jnp.int32)

        def copy_row(dst, src):
            buf_ref[dst, :, :] = buf_ref[src, :, :]

        # ---- init ---------------------------------------------------
        err_ref[0, :] = jnp.zeros((LANES,), jnp.int32)
        pos_ref[0, :] = jnp.zeros((LANES,), jnp.int32)
        if _DBG and multi:
            @pl.when(g == 0)
            def _():
                ring_ref[17, :] = jnp.zeros((LANES,), jnp.int32)
                ring_ref[18, :] = jnp.zeros((LANES,), jnp.int32)
                ring_ref[19, :] = jnp.zeros((LANES,), jnp.int32)
                ring_ref[20, :] = jnp.zeros((LANES,), jnp.int32)
        elif _DBG:
            ring_ref[17, :] = jnp.zeros((LANES,), jnp.int32)
            ring_ref[18, :] = jnp.zeros((LANES,), jnp.int32)
            ring_ref[19, :] = jnp.zeros((LANES,), jnp.int32)
            ring_ref[20, :] = jnp.zeros((LANES,), jnp.int32)
        for b in range(8):
            zero_row(b)
        canvas_load(jnp.int32(0))
        fill_row(2, 6, 0)              # cur @ prev
        copy_row(1, 2)                 # cur @ lsb starts == cur @ prev
        copy_row(5, 6)

        if Hmax > 1:
            canvas_load(jnp.int32(1))
            fill_row(3, 7, 1)          # below @ prev

        tz = jnp.zeros((LANES,), jnp.int32)
        ring_ref[0:8, :] = mask_readable_tile(words_ref[pl.ds(0, 8), :], tz)
        ring_ref[8:16, :] = mask_readable_tile(words_ref[pl.ds(8, 8), :],
                                               tz + 1)
        ring_ref[16, :] = tz
        st0 = (jnp.full((17, LANES), 2 | (4 << 9), jnp.int32),  # zt
               jnp.zeros((17, LANES), jnp.int32),               # nl
               pos0.astype(jnp.int32),                          # pos
               jnp.where(active0 & (prev_err == 0), 0,
                         1).astype(jnp.int32))                  # erri

        # ---- main sweep ---------------------------------------------
        def row_body(r, st):
            def tile_body(t, st):
                # ring top-up once per 8-pixel tile (see ring_sweep)
                ring_sweep(st[2])
                seg_tile = canvas_tile(r, t)
                # 24-row strips starting at the aligned tile base: the
                # column window [c-1, c+1] lives at strip rows j+7..j+9
                # (column c of the buffers is index 8 + c).  Aligned
                # starts are REQUIRED: Mosaic cannot lower sublane loads
                # at offset 7 mod 8 once lanes > 128 (a logical row spans
                # several vregs), and the pixel loop's static strip-row
                # indexing works on any strip width.
                as_t = buf_ref[0, pl.ds(t * 8, 24), :]
                cs_t = buf_ref[1, pl.ds(t * 8, 24), :]
                cp_t = buf_ref[2, pl.ds(t * 8, 24), :]
                bp_t = buf_ref[3, pl.ds(t * 8, 24), :]
                ag_t = buf_ref[4, pl.ds(t * 8, 24), :]
                cg_t = buf_ref[5, pl.ds(t * 8, 24), :]
                pg_t = buf_ref[6, pl.ds(t * 8, 24), :]
                bg_t = buf_ref[7, pl.ds(t * 8, 24), :]

                zt0, nl0, pos_0, err_0 = st

                # The pixel loop is UNROLLED (static j): every strip
                # access becomes a fixed vreg row read/write instead of an
                # 8/10-way select chain -- the single largest per-bit op
                # count in this kernel (~130 vector ops/pixel).
                #
                # In-loop writebacks are REGISTER-CARRIED: the only
                # updated rows any later pixel reads are the PREVIOUS
                # column's significance/sign (cs_t[j+7] / cg_t[j+7] =
                # last iteration's cs_row/cg_row), so those ride scalar
                # rows and the 8 updated rows write back ONCE per tile
                # as a stacked block -- the former per-pixel one-hot
                # strip selects (iota24/iota8 where-chains) were ~112
                # vreg ops/pixel, more than decode_bit itself.
                def slow_tile(args):
                    st = args
                    prev_cs = cs_t[7, :]
                    prev_cg = cg_t[7, :]
                    cs_rows = []
                    cg_rows = []
                    seg_rows = []
                    for j in range(8):
                        c = t * 8 + j
                        act = (r < h_l) & (c < w_l)

                        v = seg_tile[j, :]
                        mag = v & magmask
                        # cat = clip(msb - lsb, 0, 3) via the shifted
                        # magnitude: three compares instead of a 16-step
                        # msb count
                        mq = jax.lax.shift_right_logical(mag, lsb)
                        cat = ((mq >= 2).astype(jnp.int32)
                               + (mq >= 4) + (mq >= 8))

                        # neighbor counts from buffers (index j+8 == column
                        # c relative to the loaded 24-row strips; the c-1
                        # column's updated rows are the carried prev_*)
                        hc = prev_cs + cp_t[j + 9, :]
                        vc = as_t[j + 8, :] + bp_t[j + 8, :]
                        dc = (as_t[j + 7, :] + bp_t[j + 7, :]
                              + as_t[j + 9, :] + bp_t[j + 9, :])
                        hh = jnp.where(is_hl, vc, hc)
                        vv = jnp.where(is_hl, hc, vc)
                        # closed-form context tables (context_model.py
                        # formulas, verified exhaustively vs the constants)
                        ctx_ll = _ctx_ll_formula(jnp.minimum(hh, 2),
                                                 jnp.minimum(vv, 2), dc, jnp)
                        ctx_hh = _ctx_hh_formula(hh + vv, dc, jnp)
                        ctx0 = jnp.where(is_hh, ctx_hh, ctx_ll)
                        ctx = jnp.where(
                            cat == 0, ctx0,
                            jnp.where(cat == 1,
                                      jnp.where(hc + vc == 0, 9, 10), 11))
                        cat3 = cat == 3
                        ctx = jnp.where(cat3, 0, ctx)

                        st, bit = decode_bit(st, ctx, act, cat3)
                        err = st[3] != 0
                        ok = act & ~err
                        newv = jnp.where(ok, v | jax.lax.shift_left(bit, lsb),
                                         v)
                        # significance update for newly-significant pixels
                        cs_row = jnp.where(ok & (cat == 0), bit, cs_t[j + 8, :])

                        # sign pass -- skipped entirely (scalar cond) when no
                        # lane's pixel became significant this step: a
                        # decode_bit with an all-false act mask is a no-op
                        sgn_act = ok & (cat == 0) & (bit == 1)

                        def sign_pass(st):
                            sh = (2 + prev_cg + pg_t[j + 9, :])
                            sv = (2 + ag_t[j + 8, :] + bg_t[j + 8, :])
                            sh2 = jnp.where(is_hl, sv, sh)
                            sv2 = jnp.where(is_hl, sh, sv)
                            sctx, pred = _sign_formula(sh2, sv2, jnp)
                            st, agree = decode_bit(st, sctx, sgn_act,
                                                   sgn_act & ~sgn_act,
                                                   zlo=12, zhi=17)
                            return st + (agree, pred)

                        if _SUNCOND:
                            res = sign_pass(st)
                        else:
                            res = jax.lax.cond(
                                jnp.bool_(False) if _ABL == "nosign"
                                else jnp.any(sgn_act), sign_pass,
                                lambda st: st + (jnp.zeros((LANES,),
                                                           jnp.int32),
                                                 jnp.zeros((LANES,),
                                                           jnp.int32)),
                                st)
                        st, agree, pred = res[:4], res[4], res[5]
                        err = st[3] != 0
                        ok2 = sgn_act & ~err
                        actual = (agree ^ pred) & 1
                        newv = jnp.where(
                            ok2, newv | jax.lax.shift_left(actual, mag_bits),
                            newv)
                        # sign buffer update: newly significant -> -actual;
                        # already-significant keep their prev-plane sign
                        cg_row = jnp.where(ok2, -actual, cg_t[j + 8, :])

                        # carry this column's updated rows to the next pixel;
                        # the strip blocks write back once per tile below
                        prev_cs = cs_row
                        prev_cg = cg_row
                        cs_rows.append(cs_row)
                        cg_rows.append(cg_row)
                        seg_rows.append(jnp.where(ok, newv, v))

                    zt_b, nl_b, pos_b, err_b = st
                    return (zt_b, nl_b, pos_b, err_b,
                            jnp.stack(seg_rows), jnp.stack(cs_rows),
                            jnp.stack(cg_rows))

                if _FAST:
                    # ---- zero-tile fast path --------------------------
                    # Predicate stage 1 (cheap, ~10 ops): every active
                    # pixel of every lane has mag >> lsb == 0, i.e. is
                    # category 0 AND decodes bit 0 -- then the tile
                    # changes no canvas/significance/sign state and no
                    # sign events fire.  Stage 2 (under a scalar cond)
                    # verifies exactly that the slow walk would (a) never
                    # refill (stack depth covers the tile's per-bin
                    # demand, no staleness), (b) never invert (inv == 0
                    # for every evolved counter state), (c) never rescale
                    # (tc + k + 1 < cap), and (d) pop only zero bits --
                    # and, when true, applies the counter / stack-depth
                    # batch updates in closed form.
                    col8 = t * 8 + iota8L
                    act8 = ((col8 < w_l[None, :])
                            & ((r < h_l) & (err_0 == 0))[None, :])
                    magt = seg_tile & magmask[None, :]
                    mqt = jax.lax.shift_right_logical(magt, lsb[None, :])
                    zeroish = ~jnp.any(act8 & (mqt != 0))

                    def sh_dn(x, d):
                        # out[j] = x[j - d], zero-filled (static shift)
                        return jnp.concatenate(
                            [jnp.zeros((d, LANES), jnp.int32), x[:8 - d]],
                            axis=0)

                    def full_check(_):
                        csm1 = cs_t[7:15, :]
                        cpp1 = cp_t[9:17, :]
                        as0 = as_t[7:15, :]
                        as1 = as_t[8:16, :]
                        as2 = as_t[9:17, :]
                        bp0 = bp_t[7:15, :]
                        bp1 = bp_t[8:16, :]
                        bp2 = bp_t[9:17, :]
                        hc = csm1 + cpp1
                        vc = as1 + bp1
                        dc = as0 + bp0 + as2 + bp2
                        hh = jnp.where(is_hl[None, :], vc, hc)
                        vv = jnp.where(is_hl[None, :], hc, vc)
                        ctx_ll = _ctx_ll_formula(jnp.minimum(hh, 2),
                                                 jnp.minimum(vv, 2), dc,
                                                 jnp)
                        ctx_hh = _ctx_hh_formula(hh + vv, dc, jnp)
                        ctx = jnp.where(is_hh[None, :], ctx_hh, ctx_ll)
                        ctx = jnp.where(act8, ctx, 31)
                        # same-ctx predecessors inside the tile: the
                        # counters a pixel sees are the row state plus one
                        # (t+1, z+1) step per earlier same-ctx pixel
                        k8 = jnp.zeros((8, LANES), jnp.int32)
                        for d in range(1, 8):
                            k8 = k8 + ((ctx == sh_dn(ctx, d))
                                       & (iota8L >= d)).astype(jnp.int32)
                        ztc = jnp.zeros((8, LANES), jnp.int32)
                        for cc in range(9):       # cat-0 contexts: 0..8
                            ztc = jnp.where(ctx == cc, zt0[cc][None, :],
                                            ztc)
                        zc0 = ztc & 511
                        tc0 = jax.lax.shift_right_logical(ztc, 9)
                        # counters after k8 all-zero updates, in closed
                        # form INCLUDING one rescale: every hot context
                        # cycles total 250..500 (cap CONTEXT_RESCALING_CAP
                        # halves it), so ~any tile at steady state has a
                        # lane mid-rescale -- rejecting those killed the
                        # fast path.  At most one rescale fits in a tile
                        # (250 + 8 < 500); it fires at update s+1 where
                        # s = cap-1 - total, leaving total = cap/2 exactly
                        # and zero halved iff it exceeds cap/2.
                        _half = C.CONTEXT_RESCALING_CAP >> 1
                        s8 = (C.CONTEXT_RESCALING_CAP - 1) - tc0
                        resc8 = k8 > s8
                        rr = k8 - s8 - 1
                        zmid = zc0 + s8 + 1
                        zre = jnp.where(zmid > _half, zmid >> 1, zmid)
                        tcp = jnp.where(resc8, _half + rr, tc0 + k8)
                        zcp = jnp.where(resc8, zre + rr, zc0 + k8)
                        bad = act8 & (zcp < (tcp >> 1))
                        comp = zcp << 16
                        bn = jnp.zeros((8, LANES), jnp.int32)
                        for q in range(16):
                            bn = bn + (comp >= tcp * _CUT[q]).astype(
                                jnp.int32)
                        bnm = jnp.where(act8, bn, 31)
                        k2 = jnp.zeros((8, LANES), jnp.int32)
                        for d in range(1, 8):
                            k2 = k2 + ((bnm == sh_dn(bnm, d))
                                       & (iota8L >= d)).astype(jnp.int32)
                        nlv = jnp.zeros((8, LANES), jnp.int32)
                        for b in range(17):
                            nlv = jnp.where(bnm == b, nl0[b][None, :],
                                            nlv)
                        n_b = nlv & 2047
                        low_b = jax.lax.shift_right_logical(nlv, 11) & 255
                        age_b = jax.lax.shift_right_logical(nlv, 19)
                        navail = n_b - k2
                        idxb = jnp.clip(navail - 1, 0, 31)
                        bitv = jnp.where(
                            navail - 1 < 5,
                            jax.lax.shift_right_logical(low_b, idxb) & 1,
                            0)
                        # ONE refill per lane is tolerated (a zero-run
                        # tile refills its dominant golomb bin every
                        # m bits, so an all-lane no-refill conjunction
                        # almost never holds): the dry demands must all
                        # belong to one bin, fit a single parsed
                        # codeword, and pop only zero bits from it.
                        dry = act8 & (navail < 1)
                        hasR = jnp.any(dry, axis=0)             # (L,)
                        hasR_i = hasR.astype(jnp.int32)
                        bad = bad | (act8 & ~dry & (bitv != 0))
                        bad = bad | (act8 & (age_b + hasR_i[None, :]
                                             >= C.CIRC_BUF_SIZE))
                        bR = jnp.max(jnp.where(dry, bnm, 0), axis=0)
                        lane_bad = jnp.any(dry & (bnm != bR[None, :]),
                                           axis=0)
                        cnt_post = jnp.sum(dry.astype(jnp.int32), axis=0)
                        # parse the refill codeword at pos (the ring
                        # covers 11 lookahead bits; a fast tile consumes
                        # at most one codeword, well inside the sweep
                        # invariant).  Mirrors decode_bit's do_refill
                        # with bin := bR.
                        look = ring_look11(pos_0)
                        isg = bR >= 8
                        isc = (bR >= 1) & (bR <= 7)
                        first = (look & 1) != 0
                        zv = jnp.zeros((LANES,), jnp.int32)

                        def golomb_parse(_):
                            pe = golpk_tree(bR)
                            m_e = pe & 1023
                            l_e = jax.lax.shift_right_logical(pe, 10) & 15
                            i_e = jax.lax.shift_right_logical(pe, 14)
                            v = look
                            v = ((jax.lax.shift_right_logical(v, 1)
                                  & 0x5555) | ((v & 0x5555) << 1))
                            v = ((jax.lax.shift_right_logical(v, 2)
                                  & 0x3333) | ((v & 0x3333) << 2))
                            v = ((jax.lax.shift_right_logical(v, 4)
                                  & 0x0F0F) | ((v & 0x0F0F) << 4))
                            v = ((jax.lax.shift_right_logical(v, 8)
                                  & 0x00FF) | ((v & 0x00FF) << 8))
                            kl = jax.lax.shift_right_logical(v, 16 - l_e)
                            klong = (kl << 1) | (
                                jax.lax.shift_right_logical(look, l_e) & 1)
                            long_needed = (~first) & (kl >= i_e)
                            gerr = (~first) & ((l_e > ebits)
                                               | (long_needed
                                                  & (l_e + 1 > ebits)))
                            adv_g = jnp.where(
                                first, 1,
                                jnp.where(long_needed, l_e + 1, l_e))
                            zeros_g = jnp.where(
                                first, m_e,
                                jnp.where(long_needed, klong - i_e, kl))
                            nn_g = zeros_g + jnp.where(first, 0, 1)
                            lo_g = jnp.where(first, 0, 1)
                            return adv_g, nn_g, lo_g, gerr.astype(
                                jnp.int32)

                        adv_g, nn_g, lo_g, gerr_i = jax.lax.cond(
                            jnp.any(hasR & isg), golomb_parse,
                            lambda _: (zv, zv, zv, zv), 0)

                        def custom_parse(_):
                            key = (jnp.clip(bR - 1, 0, 6) << 5) | (
                                look & 31)
                            io112 = jax.lax.broadcasted_iota(
                                jnp.int32, (112, LANES), 0)
                            wsel = jax.lax.shift_right_logical(key, 1)
                            word = selrows(io112 == wsel[None, :], cpkc)
                            ent = jnp.where(
                                (key & 1) != 0,
                                jax.lax.shift_right_logical(word, 16),
                                word) & 0xFFFF
                            hit = ent & 15
                            ival = jax.lax.shift_right_logical(ent, 8)
                            ibits2 = jax.lax.shift_right_logical(ent,
                                                                 4) & 15
                            cerr = (hit == 0) | (hit >= ebits)
                            return hit, ival, ibits2, cerr.astype(
                                jnp.int32)

                        hit, ival, ibits2, cerr_i = jax.lax.cond(
                            jnp.any(hasR & isc), custom_parse,
                            lambda _: (zv, zv, zv, zv), 0)

                        uerr_i = (ebits < 1).astype(jnp.int32)
                        adv = jnp.where(isg, adv_g,
                                        jnp.where(isc, hit, 1))
                        nn = jnp.where(isg, nn_g,
                                       jnp.where(isc, ibits2, 1))
                        lo = jnp.where(isg, lo_g,
                                       jnp.where(isc, ival, look & 1))
                        # select on int32, not i1: Mosaic rejects bool
                        # vector operands in select chains
                        rerr = jnp.where(isg, gerr_i,
                                         jnp.where(isc, cerr_i, uerr_i))
                        lane_bad = lane_bad | (hasR & ((rerr != 0)
                                                       | (cnt_post > nn)))
                        # the refilled bits consumed this tile (new-stack
                        # indices nn-1 .. nn-cnt_post) must all be zero;
                        # indices >= 5 read as zero in the consume path
                        a0 = jnp.clip(nn - cnt_post, 0, 31)
                        wid = jnp.clip(jnp.minimum(nn, 5) - a0, 0, 5)
                        consumed = (jax.lax.shift_right_logical(lo, a0)
                                    & ((jnp.int32(1) << wid) - 1))
                        lane_bad = lane_bad | (hasR & (consumed != 0))
                        anyb = jnp.any(bad)
                        anyl = jnp.any(lane_bad)
                        ok = (~(anyb | anyl)).astype(jnp.int32)
                        if _DBG:
                            ok = ok | (anyb.astype(jnp.int32) << 8) | (
                                anyl.astype(jnp.int32) << 9)
                        # batch updates: zero bits -> each context row
                        # gains (z + cnt, t + cnt); each bin row pops
                        # its demand count (popped bits are zero, so the
                        # slow path's bit-clear is a no-op); a refilling
                        # lane ages every bin by one and rewrites bin
                        # bR's row with the partially-consumed new stack
                        # at age 0 (exactly decode_bit's refill effects)
                        # per-row demand counts as (17, L) one-hot sums
                        # over the tile's 8 pixels (inactive pixels carry
                        # ctx/bin 31 and match no row); then ALL context
                        # rows update at once with the vectorized
                        # one-rescale closed form (cnt == 0 rows are
                        # identities) -- the former per-row where-chains
                        # were the fast path's single largest cost
                        cmat = jnp.zeros((17, LANES), jnp.int32)
                        dmat = jnp.zeros((17, LANES), jnp.int32)
                        for j in range(8):
                            cmat = cmat + (iota17 == ctx[j][None, :])
                            dmat = dmat + (iota17 == bnm[j][None, :])
                        z0m = zt0 & 511
                        t0m = jax.lax.shift_right_logical(zt0, 9)
                        srm = (C.CONTEXT_RESCALING_CAP - 1) - t0m
                        rrm = cmat - srm - 1
                        zmm = z0m + srm + 1
                        zhm = jnp.where(zmm > _half, zmm >> 1, zmm)
                        resm = cmat > srm
                        tfm = jnp.where(resm, _half + rrm, t0m + cmat)
                        zfm = jnp.where(resm, zhm + rrm, z0m + cmat)
                        zt2 = zfm | (tfm << 9)
                        nl2 = nl0 + (hasR_i << 19)[None, :] - dmat
                        newrow = (nn - cnt_post) | (lo << 11)   # age 0
                        mR = (iota17 == bR[None, :]) & hasR[None, :]
                        nl2 = jnp.where(mR, newrow[None, :], nl2)
                        pos2 = pos_0 + jnp.where(hasR, adv, 0)
                        return ok, zt2, nl2, pos2

                    def no_check(_):
                        return (jnp.zeros((), jnp.int32), zt0, nl0,
                                pos_0)

                    if _ABL == "freefast":
                        # ceiling probe ONLY (wrong results): every
                        # zeroish tile is treated as fast with no state
                        # update -- bounds the best case of this path
                        ok_i = zeroish.astype(jnp.int32)
                        zt_f, nl_f, pos_f = zt0, nl0, pos_0
                    else:
                        ok_i, zt_f, nl_f, pos_f = jax.lax.cond(
                            zeroish, full_check, no_check, 0)

                    def fast_tile(args):
                        return (zt_f, nl_f, pos_f, err_0, seg_tile,
                                cs_t[8:16, :], cg_t[8:16, :])

                    res = jax.lax.cond((ok_i & 1) != 0, fast_tile,
                                       slow_tile,
                                       (zt0, nl0, pos_0, err_0))
                else:
                    res = slow_tile((zt0, nl0, pos_0, err_0))

                if _DBG:
                    ring_ref[17, :] = ring_ref[17, :] + (ok_i & 1)
                    ring_ref[18, :] = (ring_ref[18, :]
                                       + zeroish.astype(jnp.int32))
                    ring_ref[19, :] = (ring_ref[19, :]
                                       + ((ok_i >> 8) & 1))
                    ring_ref[20, :] = (ring_ref[20, :]
                                       + ((ok_i >> 9) & 1))
                canvas_tile_write(r, t, res[4])
                buf_ref[1, pl.ds(t * 8 + 8, 8), :] = res[5]
                buf_ref[5, pl.ds(t * 8 + 8, 8), :] = res[6]
                # saturate bin ages at CIRC_BUF_SIZE (the staleness test
                # is >=): ages grow <= 16 per tile, so a per-tile clamp
                # keeps the 12-bit field from ever wrapping
                zt, nl, pos, erri = res[:4]
                nl = jnp.where(
                    nl >= jnp.int32((C.CIRC_BUF_SIZE + 1) << 19),
                    (nl & ((1 << 19) - 1))
                    | jnp.int32(C.CIRC_BUF_SIZE << 19), nl)
                return (zt, nl, pos, erri)

            st = jax.lax.fori_loop(0, ntiles, tile_body, st)
            canvas_store(r)

            # rotate row buffers for row r+1
            copy_row(0, 1)
            copy_row(4, 5)
            copy_row(2, 3)
            copy_row(6, 7)
            copy_row(1, 2)
            copy_row(5, 6)

            # prefetch row r+2 for fill_row; past the last row, reload
            # the already-stored row r-2 instead (same window slot, never
            # read again) so the DMA stays unconditional
            canvas_load(jnp.where(r + 2 < Hmax, r + 2,
                                  jnp.maximum(r - 2, 0)))

            @pl.when(r + 2 < Hmax)
            def _():
                fill_row(3, 7, r + 2)

            @pl.when(r + 2 >= Hmax)
            def _():
                zero_row(3)
                zero_row(7)

            return st

        st = jax.lax.fori_loop(0, Hmax, row_body, st0)
        err_ref[0, :] = st[3]
        if _DBG:
            # counters go out via pos; the cause counts ride err but only
            # AFTER the last round (multi mode reads err for retirement
            # at every round start -- clobbering it earlier retires all
            # lanes and corrupts the decode)
            pos_ref[0, :] = ring_ref[17, :] | (ring_ref[18, :] << 16)
            if multi:
                @pl.when(g == nrounds - 1)
                def _():
                    err_ref[0, :] = (ring_ref[19, :]
                                     | (ring_ref[20, :] << 16))
            else:
                err_ref[0, :] = (ring_ref[19, :]
                                 | (ring_ref[20, :] << 16))
        elif multi:
            # WINDOW-CLIP HAZARD flag, accumulated across rounds in the
            # pos output: the reference decoder's frozen-bounds quirk
            # lets a plane's decode consume stream bytes PAST its
            # payload (incomplete-flush cascades read the FOLLOWING
            # packets' real bytes), so a lane whose consumption (+11-bit
            # lookahead, margin 16) reached a window end that was
            # CLIPPED below the stream remainder may have read zeros
            # where the reference read real bytes.  geom row 5 bits 6+
            # carry the clip threshold in words (0x3FFF = window covers
            # the remainder: never flags); flagged lanes' images are
            # re-decoded on the exact host path by the caller.
            thrw = jax.lax.shift_right_logical(g5, 6)
            haz = (active0
                   & (st[2] + 16 > thrw * 32)).astype(jnp.int32)
            pos_ref[0, :] = prev_haz | haz
        else:
            pos_ref[0, :] = st[2]

    def run_impl(words, geom, seg=None):
        luts = jnp.asarray(_LUTS)
        if multi:
            call = pl.pallas_call(
                kernel,
                grid=(nrounds,),
                out_shape=[jax.ShapeDtypeStruct((PX, LANES), jnp.int32),
                           jax.ShapeDtypeStruct((1, LANES), jnp.int32),
                           jax.ShapeDtypeStruct((1, LANES), jnp.int32)],
                in_specs=[
                    pl.BlockSpec((NW, LANES), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, LANES), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((152, LANES), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((1, LANES), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, LANES), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM)],
                scratch_shapes=[pltpu.VMEM((8, NBUF, LANES), jnp.int32),
                                pltpu.VMEM((21, LANES), jnp.int32),
                                pltpu.VMEM((4 * Wpad, LANES), jnp.int32),
                                pltpu.SemaphoreType.DMA((2,))],
                interpret=interpret,
            )
            out, err, pos = call(words, geom, luts)
        else:
            call = pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((PX, LANES), jnp.int32),
                           jax.ShapeDtypeStruct((1, LANES), jnp.int32),
                           jax.ShapeDtypeStruct((1, LANES), jnp.int32)],
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                scratch_shapes=[pltpu.VMEM((8, NBUF, LANES), jnp.int32),
                                pltpu.VMEM((21, LANES), jnp.int32)],
                interpret=interpret,
            )
            out, err, pos = call(words, geom, luts, seg)
        return out, err[0], pos[0]

    if interpret:
        def run(words, geom, seg=None):
            import jax
            with jax.default_device(jax.devices("cpu")[0]):
                return run_impl(words, geom, seg)
        return run
    import jax
    return jax.jit(run_impl)
