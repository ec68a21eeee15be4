"""Sort-centric ICER entropy encoder for TPU (v2).

Motivation (measured on TPU v5e, 324 lanes x 22016 emissions): XLA:TPU
executes `lax.sort` (~2 ms), cumulative ops (~free) and elementwise work at
full speed, while arbitrary-index gathers (~70 ms) and scatters with
millions of updates (~36 ms+) serialize.  The v1 position-aligned encoder
(ops/entropy_jax.py) leans on rank-space scatters/gathers and lands at
seconds per image; this module re-derives every stage on top of sorts,
segmented cumulative ops, shifts, and packed-constant arithmetic lookups:

  1. counters: one stable sort by (context, position); per-context
     occurrence indices and zero-prefixes become segmented cumsums; the
     rescale-chunk state expands back to elements as a piecewise-constant
     function materialized by a ~1.6k-element delta scatter + cumsum;
  2. codeword grouping: one stable sort by (bin, position); golomb runs,
     the 5-state custom-code automaton (with per-segment resets) and
     *virtual ends* (each segment's unfinished tail word ends at its last
     element with the flush code) make every segment's k-th start pair
     with its k-th end globally -- so start/end attribute lists align by
     index after two mask-compactions (sorts), with no cross lookups;
  3. codeword records sort by opening emission position (the circular
     buffer pops in allocation order); the buffer-flush condition becomes
     a plain shift by CIRC_BUF_SIZE in record space;
  4. bit packing: each record expands to 10 (target_bit_position, bit)
     slot entries; a final sort by target position *is* the packed
     bitstream, read off with strided byte assembly.

Golomb codewords are computed arithmetically (SWAR bit reversal), custom
codes via constants packed into 32-bit words indexed by shifts -- no table
gathers anywhere on the hot path.

Everything is generic over numpy / jax.numpy and bit-exact vs the
sequential reference coder (differentially tested).
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from .entropy_vec import TAIL_BITS, TAIL_CODE, WIN_BITS, WIN_CODE, WIN_LEN

NCTX_SENT = 18          # sort key for invalid emissions (contexts 0..17)
NBIN_SENT = 17          # sort key for invalid (bins 0..16)
_CHUNK = C.CONTEXT_RESCALING_CAP // 2                       # 250
_FIRST = C.CONTEXT_RESCALING_CAP - C.DEFAULT_CONTEXT_TOTAL_COUNT  # 496


def _is_jax(xp) -> bool:
    return xp.__name__.startswith("jax")


def _sort_by(key, ops, xp, stable=True):
    """Ascending sort by ``key``; returns (sorted_key, sorted_ops).

    Pass stable=False when ties are impossible or tie order is
    immaterial (e.g. values only enter commutative sums, or tied rows
    are masked out downstream): the stable lowering on TPU adds an iota
    tiebreaker operand to the sort, and compare-exchange cost scales
    with operand count.
    """
    if _is_jax(xp):
        import jax
        out = jax.lax.sort((key,) + tuple(ops), dimension=-1, num_keys=1,
                           is_stable=stable)
        return out[0], list(out[1:])
    order = np.argsort(key, kind="stable")
    return key[order], [o[order] for o in ops]


def _cummax(a, xp):
    if _is_jax(xp):
        import jax
        return jax.lax.cummax(a, axis=a.ndim - 1)
    return np.maximum.accumulate(a, axis=-1)


def _shift1(a, fill, xp):
    return xp.concatenate(
        [xp.full(a.shape[:-1] + (1,), fill, dtype=a.dtype), a[..., :-1]],
        axis=-1)


def _shiftl(a, k, fill, xp):
    """Shift left by k: out[i] = a[i+k], tail filled."""
    if k == 0:
        return a
    return xp.concatenate(
        [a[..., k:], xp.full(a.shape[:-1] + (k,), fill, dtype=a.dtype)],
        axis=-1)


# --------------------------------------------------------------------------
# Packed-constant LUTs (lookup by shift, no gathers)
# --------------------------------------------------------------------------

def _pack_table(vals, width):
    """Pack small ints into a list of int32 words (32//width per word)."""
    per = 32 // width
    words = []
    for w0 in range(0, len(vals), per):
        word = 0
        for k, v in enumerate(vals[w0:w0 + per]):
            word |= int(v) << (k * width)
        words.append(word)
    return words, per


def _packed_lookup(words, per, width, idx, xp):
    """value = table[idx] via shifts and selects over packed constants."""
    mask = (1 << width) - 1
    word_i = idx // per
    off = (idx % per) * width
    out = xp.zeros_like(idx)
    for wi, word in enumerate(words):
        out = xp.where(word_i == wi,
                       (xp.int32(word) >> off) & mask, out)
    return out


class _CustomLUTs:
    """Per-custom-bin packed window/tail tables (built once)."""

    def __init__(self):
        self.win_len = {}
        self.win_code = {}
        self.win_bits = {}
        self.tail_code = {}
        self.tail_bits = {}
        for bi, b in enumerate(range(1, 8)):
            self.win_len[b] = _pack_table(WIN_LEN[b][:32], 4)
            self.win_code[b] = _pack_table(WIN_CODE[b][:32], 8)
            self.win_bits[b] = _pack_table(WIN_BITS[b][:32], 4)
            # tail: index = nb*16 + value (nb 0..4, value 0..15)
            tc = [TAIL_CODE[b][nb][v] for nb in range(5) for v in range(16)]
            tb = [TAIL_BITS[b][nb][v] for nb in range(5) for v in range(16)]
            self.tail_code[b] = _pack_table(tc, 8)
            self.tail_bits[b] = _pack_table(tb, 4)


_CLUT = _CustomLUTs()

_GOL_M = [int(C.GOLOMB_M[b]) for b in range(17)]
_GOL_L = [int(C.GOLOMB_L[b]) for b in range(17)]
_GOL_I = [int(C.GOLOMB_I[b]) for b in range(17)]


def _bitrev16(v, nbits, xp):
    """Reverse the low ``nbits`` bits of v (SWAR constant shifts)."""
    v = v.astype(xp.int32) & 0xFFFF
    v = ((v >> 1) & 0x5555) | ((v & 0x5555) << 1)
    v = ((v >> 2) & 0x3333) | ((v & 0x3333) << 2)
    v = ((v >> 4) & 0x0F0F) | ((v & 0x0F0F) << 4)
    v = ((v >> 8) & 0x00FF) | ((v & 0x00FF) << 8)
    return v >> (16 - nbits)


# --------------------------------------------------------------------------
# Stage 1: counters and bins (context-sorted space)
# --------------------------------------------------------------------------

def counters_and_bins_sorted(valid, ctx, bit, xp=np, max_chunks=None):
    """Returns (spos, sbin, scoded): emission position, bin id and coded
    bit in context-sorted order (invalid emissions carry bin NBIN_SENT).
    """
    L = valid.shape[-1]
    if max_chunks is None:
        max_chunks = (L - _FIRST) // _CHUNK + 2 if L > _FIRST else 2
    J = max_chunks
    valid = valid.astype(xp.int32)
    pos = xp.arange(L, dtype=xp.int32)
    ctx_eff = xp.where(valid != 0, ctx.astype(xp.int32), NCTX_SENT)

    key = ctx_eff * L + pos
    skey, (sbit,) = _sort_by(key, (bit.astype(xp.int32),), xp)
    sctx = skey // L
    spos = skey % L

    idx = pos
    adaptive = sctx <= 16
    zb = ((sbit == 0) & adaptive).astype(xp.int32)

    grp_start = xp.concatenate(
        [xp.ones(1, dtype=bool), sctx[1:] != sctx[:-1]])
    gstart_idx = _cummax(xp.where(grp_start, idx, 0), xp)
    occ = idx - gstart_idx

    cz = xp.cumsum(zb)
    cz_excl = cz - zb
    base_zb = _cummax(xp.where(grp_start, cz_excl, -1), xp)
    seg_cz_excl = cz_excl - base_zb        # zeros among earlier occs in grp

    total = xp.where(occ < _FIRST, C.DEFAULT_CONTEXT_TOTAL_COUNT + occ,
                     _CHUNK + (occ - _FIRST) % _CHUNK)

    # ---- rescale-chunk state ------------------------------------------
    # group boundaries per context via searchsorted over the sorted keys
    cvals = xp.arange(NCTX_SENT + 1, dtype=xp.int32)
    gs = xp.searchsorted(sctx, cvals)            # (19,) group starts
    n_c = gs[1:] - gs[:-1]                       # (18+,) sizes (ctx 0..17)
    n_c = n_c[:17]                               # adaptive contexts only
    gs17 = gs[:17]

    b_vals = np.concatenate(
        [[0], _FIRST + _CHUNK * np.arange(J - 1, dtype=np.int64)]
    ).astype(np.int32)                           # chunk start occs (J,)
    Bj = xp.asarray(b_vals)[:, None]             # (J, 1)
    exists = Bj < n_c[None, :]                   # chunk j exists in ctx c

    # zeros among first K occurrences of ctx c: seg_cz at sorted position
    # gs[c] + K (value of cz_excl relative to group base).  Use cz (incl)
    # with an exclusive read at gs[c]+K-1 via cz_excl at gs[c]+K.
    cz_pad = xp.concatenate([cz_excl, cz[-1:]])  # read at index L allowed
    kpos = xp.clip(gs17[None, :] + xp.minimum(Bj, n_c[None, :]), 0, L)
    base = cz_pad[xp.clip(gs17, 0, L)][None, :]
    czK = cz_pad[kpos] - base                    # (J, 17): zeros among
    #                                              first min(Bj, n_c) occs

    # chunk scan: z at the start of each chunk
    z0 = xp.full((17,), C.DEFAULT_CONTEXT_ZERO_COUNT, dtype=xp.int32)
    z0 = z0 + valid[:1].sum() * 0
    if _is_jax(xp):
        import jax

        czK_ext = xp.concatenate([czK, czK[-1:]], axis=0)

        def step2(z_prev, j):
            zj = z_prev + (czK_ext[j + 1] - czK_ext[j])
            zj = xp.where(zj > _CHUNK, zj >> 1, zj)
            return zj, z_prev

        _, z_starts = jax.lax.scan(step2, z0, xp.arange(J))
    else:
        czK_ext = np.concatenate([czK, czK[-1:]], axis=0)
        zs = [z0]
        z = z0
        for j in range(J - 1):
            zj = z + (czK_ext[j + 1] - czK_ext[j])
            z = np.where(zj > _CHUNK, zj >> 1, zj)
            zs.append(z)
        z_starts = np.stack(zs)                  # (J, 17)

    # ---- piecewise-constant expansion (delta scatter + cumsum) ---------
    # ranges: for (c, j) with exists: sorted positions
    #   [gs[c] + Bj, ...) carry z_starts[j, c] and czK[j, c].
    # delta at a range start = value - previous range's value, where the
    # "previous" chain runs over all existing ranges in sorted-position
    # order (groups are consecutive, chunks within a group consecutive).
    zlast_idx = xp.clip(
        xp.where(n_c > 0,
                 xp.where(n_c - 1 < _FIRST, 0,
                          1 + (n_c - 1 - _FIRST) // _CHUNK), 0), 0, J - 1)
    zlast = xp.take_along_axis(z_starts, zlast_idx[None, :], axis=0)[0]
    czlast = xp.take_along_axis(czK, xp.clip(zlast_idx, 0, J - 1)[None, :],
                                axis=0)[0]
    czlast = xp.where(n_c > 0, czlast, 0)
    zlast = xp.where(n_c > 0, zlast, 0)

    # running value before each group = zlast of the previous non-empty
    # group (tiny 17-step unrolled chain)
    prev_z = xp.zeros((17,), dtype=xp.int32)
    prev_cz = xp.zeros((17,), dtype=xp.int32)
    run_z = xp.zeros((), dtype=xp.int32)
    run_cz = xp.zeros((), dtype=xp.int32)
    prev_z_list = []
    prev_cz_list = []
    for c in range(17):
        prev_z_list.append(run_z)
        prev_cz_list.append(run_cz)
        run_z = xp.where(n_c[c] > 0, zlast[c], run_z)
        run_cz = xp.where(n_c[c] > 0, czlast[c], run_cz)
    prev_z = xp.stack(prev_z_list)
    prev_cz = xp.stack(prev_cz_list)

    dz = xp.where(Bj == 0, z_starts - prev_z[None, :],
                  z_starts - _shift_rows(z_starts, xp))
    dcz = xp.where(Bj == 0, czK - prev_cz[None, :],
                   czK - _shift_rows(czK, xp))

    bnd_pos = xp.where(exists, gs17[None, :] + Bj, L + 1)
    zdelta = _small_scatter_add(L + 2, bnd_pos.reshape(-1),
                                xp.where(exists, dz, 0).reshape(-1), xp)
    czdelta = _small_scatter_add(L + 2, bnd_pos.reshape(-1),
                                 xp.where(exists, dcz, 0).reshape(-1), xp)
    z_start_elem = xp.cumsum(zdelta[:L])
    cz_cs_elem = xp.cumsum(czdelta[:L])

    zero = z_start_elem + (seg_cz_excl - cz_cs_elem)

    # uncoded / invalid overrides
    unc = sctx == 17
    zero = xp.where(unc, 1, zero)
    total = xp.where(unc, 2, total)

    inv = zero < (total >> 1)
    zero = xp.where(inv, total - zero, zero)
    scoded = (sbit ^ inv).astype(xp.int32)

    comp = zero * C.BIN_PROBABILITY_DENOMINATOR
    cut = C.BIN_PROBABILITY_CUTOFFS[:16].astype(np.int32)
    sbin = xp.zeros(L, dtype=xp.int32)
    for bq in range(16):
        sbin = sbin + (comp >= total * int(cut[bq]))
    sbin = xp.where(sctx >= NCTX_SENT, NBIN_SENT, sbin)
    return spos, sbin, scoded


# --------------------------------------------------------------------------
# Stage 2+3: codewords (bin-sorted space) -> records (open order)
# --------------------------------------------------------------------------

def _select_over_bins(b, values, bins, xp, default=0):
    """out[i] = values[bin_index] where b[i]==bins[k] (small select chain)."""
    out = xp.full(b.shape, default, dtype=xp.int32)
    for bb, v in zip(bins, values):
        out = xp.where(b == bb, v, out)
    return out


def _custom_lookup(b, idx, table_dict, xp):
    """Packed-constant lookup per custom bin: table_dict[bin] applied at
    idx, selected by b (elementwise, gather-free)."""
    out = xp.zeros(b.shape, dtype=xp.int32)
    for bb in range(1, 8):
        words, per = table_dict[bb]
        width = 32 // per
        out = xp.where(b == bb, _packed_lookup(words, per, width, idx, xp),
                       out)
    return out


def build_records(spos, sbin, scoded, xp=np):
    """Codeword records in allocation (opening) order.

    Returns (open_pos, code, nbits, done, rec_valid), each (L,):
    record i is the i-th codeword allocated; rec_valid marks real records.
    done is BIG for words completed only by the end-of-plane flush.
    """
    L = spos.shape[-1]
    BIG = xp.int32(2 ** 30)
    key = sbin * L + spos
    skey, (cb,) = _sort_by(key, (scoded,), xp)
    b = skey // L                 # = sbin, recovered from the sorted key
    p = skey % L                  # = spos

    idx = xp.arange(L, dtype=xp.int32)
    seg_start = xp.concatenate([xp.ones(1, dtype=bool), b[1:] != b[:-1]])
    seg_start_idx = _cummax(xp.where(seg_start, idx, 0), xp)
    seg_last = xp.concatenate([b[:-1] != b[1:], xp.ones(1, dtype=bool)])

    is0 = b == 0
    isC = (b >= 1) & (b <= 7)
    isG = (b >= 8) & (b <= 16)

    # ---- golomb ---------------------------------------------------------
    gbins = list(range(8, 17))
    m_e = _select_over_bins(b, [_GOL_M[g] for g in gbins], gbins, xp, 1)
    l_e = _select_over_bins(b, [_GOL_L[g] for g in gbins], gbins, xp, 1)
    i_e = _select_over_bins(b, [_GOL_I[g] for g in gbins], gbins, xp, 0)

    one = isG & (cb == 1)
    prev_one_excl = _shift1(_cummax(xp.where(one, idx, -1), xp),
                            xp.int32(-1), xp)
    reset_base = xp.maximum(prev_one_excl, seg_start_idx - 1)
    run_pos = idx - reset_base - 1
    ends_g_real = one | (isG & (cb == 0) & (run_pos % m_e == m_e - 1))

    # ---- custom ---------------------------------------------------------
    # 5-bit forward windows within the segment
    w = xp.zeros(L, dtype=xp.int32)
    sameseg_f = []
    for j in range(5):
        bj = _shiftl(cb, j, xp.int32(0), xp)
        sj = _shiftl(b, j, xp.int32(-1), xp) == b
        sameseg_f.append(sj)
        w = w | xp.where(sj, bj, 0) << j
    clen = _custom_lookup(b, w, _CLUT.win_len, xp)

    # countdown automaton with per-segment resets
    cl1 = xp.clip(clen - 1, 0, 4).astype(xp.int8)
    trans_rows = []
    for d in range(5):
        # in-custom: d==0 starts a word (next state clen-1), else count
        # down; at a segment start every incoming state starts a word
        # (fresh coder per segment); outside custom bins: identity.
        base = cl1 if d == 0 else xp.full(L, d - 1, xp.int8)
        t = xp.where(isC, xp.where(seg_start, cl1, base),
                     xp.full(L, d, xp.int8))
        trans_rows.append(t.astype(xp.int8))
    trans = xp.stack(trans_rows, axis=0)          # (5, L)
    pref = _prefix_compose5(trans, xp)
    state_after = pref[0].astype(xp.int32)
    ends_c_real = isC & (state_after == 0)

    # ---- ends (incl. per-segment virtual flush ends) --------------------
    ends_real = ends_g_real | ends_c_real | is0
    virt = seg_last & (isG | isC) & (~ends_real)
    ends = ends_real | virt

    prev_end_excl = xp.maximum(
        _shift1(_cummax(xp.where(ends, idx, -1), xp), xp.int32(-1), xp),
        seg_start_idx - 1)
    span = idx - prev_end_excl                    # word length at an end

    # golomb codeword attrs at ends
    kz = (span - 1) + (cb == 0)                   # zeros consumed
    kz = xp.clip(kz, 0, m_e)
    adj = xp.where(kz < i_e, kz, kz + i_e)
    gn = l_e + (kz >= i_e)
    gcode = _bitrev16(adj, gn, xp)
    full_run = kz >= m_e                          # m zeros -> '1'
    flush_m1 = virt & (kz == m_e - 1)             # flush quirk
    gcode = xp.where(full_run | flush_m1, 1, gcode)
    gn = xp.where(full_run | flush_m1, 1, gn)

    # custom codeword attrs at ends
    vlen = xp.clip(span, 1, 5)
    v = xp.zeros(L, dtype=xp.int32)
    sh = cb
    for j in range(5):
        if j > 0:
            sh = _shift1(sh, xp.int32(0), xp)
        v = v | xp.where(j < vlen, sh << xp.clip(vlen - 1 - j, 0, 4), 0)
    ccode = _custom_lookup(b, xp.clip(v, 0, 31), _CLUT.win_code, xp)
    cn = _custom_lookup(b, xp.clip(v, 0, 31), _CLUT.win_bits, xp)
    # tails: lookup idx = nb*16 + value (nb <= 4)
    tidx = xp.clip(vlen, 0, 4) * 16 + xp.clip(v, 0, 15)
    tcode = _custom_lookup(b, tidx, _CLUT.tail_code, xp)
    tn = _custom_lookup(b, tidx, _CLUT.tail_bits, xp)
    ccode = xp.where(virt, tcode, ccode)
    cn = xp.where(virt, tn, cn)

    code_e = xp.where(isG, gcode, xp.where(isC, ccode, cb))
    nbits_e = xp.where(isG, gn, xp.where(isC, cn, 1))
    done_e = xp.where(virt, BIG, p)

    # ---- starts ---------------------------------------------------------
    starts = (isG | isC | is0) & (seg_start | _shift1(ends, True, xp))
    # (for bin0 every element is an end, so consecutive elements all start)

    # Sorts carry ONE packed operand each (compare-exchange cost scales
    # with operand count); validity flags are recovered from the sorted
    # key (!= BIG) and code/nbits pack into 21 bits.
    skey = xp.where(starts, idx, BIG)
    skey_s, (open_pos,) = _sort_by(skey, (p,), xp)
    s_ok = skey_s != BIG
    ekey = xp.where(ends, idx, BIG)
    packed_e = (code_e & 0xFFFF) | (nbits_e << 16)
    ekey_s, (packed_r, done_r) = _sort_by(ekey, (packed_e, done_e), xp)
    rec_valid = s_ok & (ekey_s != BIG)

    # ---- allocation order ----------------------------------------------
    rkey = xp.where(rec_valid, open_pos, BIG)
    rkey_s, (packed_o, done_o) = _sort_by(rkey, (packed_r, done_r), xp)
    valid_o = rkey_s != BIG
    open_o = xp.where(valid_o, rkey_s, BIG)
    code_o = packed_o & 0xFFFF
    nbits_o = (packed_o >> 16) & 31
    return open_o, code_o, nbits_o, done_o, valid_o


def _prefix_compose5(trans, xp):
    """Inclusive prefix composition of (5, L) countdown transitions."""
    L = trans.shape[-1]
    pref = trans
    step = 1
    while step < L:
        later = pref[..., step:]
        earlier = pref[..., :L - step]
        rows = []
        for d in range(5):
            g = earlier[d]
            acc = later[0] * (g == 0).astype(trans.dtype)
            for k in range(1, 5):
                acc = acc + later[k] * (g == k).astype(trans.dtype)
            rows.append(acc)
        composed = xp.stack(rows, axis=0)
        pref = xp.concatenate([pref[..., :step], composed], axis=-1)
        step *= 2
    return pref


def detect_flush_records(open_o, done_o, rec_valid, xp=np):
    """Mid-plane codeword-buffer flush condition, in record space.

    Record k must have popped record k - CIRC_BUF_SIZE before allocating;
    in allocation order that is a plain shift of the running max of
    completion times (icer_encoding.c:200-206)."""
    n = open_o.shape[-1]
    if n <= C.CIRC_BUF_SIZE:
        return (rec_valid & False).any()
    runmax = _cummax(xp.where(rec_valid, done_o, -1), xp)
    old = xp.concatenate(
        [xp.full(C.CIRC_BUF_SIZE, -1, dtype=runmax.dtype),
         runmax[:-C.CIRC_BUF_SIZE]])
    return (rec_valid & (old >= open_o)).any()


def pack_records(code_o, nbits_o, rec_valid, xp=np, max_bits=None,
                 with_overflow=False, return_words=False):
    """Pack codewords (allocation order) LSB-first, sort-free.

    Bit offsets are one cumsum of the codeword lengths.  A codeword
    (<= 16 bits) then lands in at most two 32-bit output words:
    ``code << (off & 31)`` into word ``off >> 5`` plus the spill into the
    next word.  Because offsets are nondecreasing, both contribution
    streams (lo and spill) have nondecreasing word ids, so each output
    word's OR is an exact *sum* of a contiguous contribution range (bit
    ranges are disjoint): prefix-sum the contributions, locate word
    boundaries with searchsorted, difference the prefix sums.  Replaces
    the former 10L slot-expansion sort (the measured pack bottleneck,
    PERF_NOTES.md) with two cumsums + two searchsorteds + a ~W gather.

    ``max_bits`` caps the assembled payload; the theoretical worst case is
    10 bits per record (10 * L), but real streams run far below (the
    counters adapt away from the high-expansion golomb bins), so callers
    pass a ~1.5x-emissions cap and use the overflow flag (with_overflow)
    to divert pathological lanes to the host fallback."""
    L = code_o.shape[-1]
    if max_bits is None:
        max_bits = ((10 * L + 7) // 8) * 8
    nb = nbits_o * rec_valid
    off = xp.cumsum(nb) - nb
    total = nb.sum()

    W = (max_bits + 31) // 32
    sh = (off & 31).astype(xp.uint32)
    code = (code_o.astype(xp.uint32)
            & ((xp.uint32(1) << nb.astype(xp.uint32)) - 1))
    code = xp.where(rec_valid, code, xp.uint32(0))
    lo = code << sh
    hi = xp.where(sh == 0, xp.uint32(0),
                  code >> ((xp.uint32(32) - sh) & 31))
    wlo = off >> 5

    if _is_jax(xp):
        # One merged-sort "searchsorted" serves BOTH contribution streams
        # (the spill stream's word id is wlo + 1, so keying the spill by
        # wlo and shifting its per-word sums right by one word is exact).
        # jnp.searchsorted(method="sort") lowers to a co-sort PLUS a
        # full-length serializing scatter (~6 ns/elem, the measured top
        # cost of the whole encode program); this formulation is two
        # plain sorts + cumsums:
        #   sort [records keyed 2*wid+1 | queries keyed 2*q] -> running
        #   sums of (lo, hi) at each query = prefix totals below word q;
        #   a second sort by (is_query, key) compacts the W+1 query rows
        #   to the front in word order.
        L_ = wlo.shape[-1]
        BIG = xp.int32(2 ** 30)
        qkey = 2 * xp.arange(W + 1, dtype=xp.int32)
        key = xp.concatenate([2 * wlo.astype(xp.int32) + 1, qkey])
        zl = xp.concatenate([lo, xp.zeros(W + 1, xp.uint32)])
        zh = xp.concatenate([hi, xp.zeros(W + 1, xp.uint32)])
        k2, (l2, h2) = _sort_by(key, (zl, zh), xp)
        cl = xp.cumsum(l2, dtype=xp.uint32)
        ch = xp.cumsum(h2, dtype=xp.uint32)
        isq2 = (k2 & 1) == 0          # queries carry even keys
        _, (slo, shi) = _sort_by(xp.where(isq2, k2, BIG), (cl, ch), xp)
        slo, shi = slo[:W + 1], shi[:W + 1]
        dlo = slo[1:] - slo[:-1]
        dhi = shi[1:] - shi[:-1]
        words = dlo + xp.concatenate([xp.zeros(1, xp.uint32), dhi[:-1]])
    else:
        whi = wlo + 1

        def words_from(contrib, wid):
            csum = xp.cumsum(contrib, dtype=xp.uint32)
            csum = xp.concatenate([xp.zeros(1, dtype=xp.uint32), csum])
            queries = xp.arange(W + 1, dtype=wid.dtype)
            bounds = xp.searchsorted(wid, queries)
            s = csum[bounds]
            return s[1:] - s[:-1]

        words = words_from(lo, wlo) + words_from(hi, whi)
    if return_words:
        # uint32 words, little-endian == the byte stream: callers keep
        # 32-bit lanes on device (uint8 stacks force costly relayouts on
        # TPU) and reinterpret on host.
        assert max_bits % 32 == 0
        if with_overflow:
            return words, total, total > max_bits
        return words, total
    b0 = (words & 0xFF).astype(xp.uint8)
    b1 = ((words >> 8) & 0xFF).astype(xp.uint8)
    b2 = ((words >> 16) & 0xFF).astype(xp.uint8)
    b3 = ((words >> 24) & 0xFF).astype(xp.uint8)
    payload = xp.stack([b0, b1, b2, b3], axis=-1).reshape(-1)[:max_bits // 8]
    if with_overflow:
        return payload, total, total > max_bits
    return payload, total


def _shl_words(words, s, xp):
    """Bit-shift a multi-word chunk left by s in [0, 31] bits.

    ``words`` is a list of uint32 arrays (word 0 = least significant);
    returns len(words) + 1 arrays (the top spill word).  The shift-right
    by (32 - s) is split as >>(31-s)>>1 so s == 0 stays defined.
    """
    s = s.astype(xp.uint32)
    out = []
    prev = None
    for w in words:
        hi = xp.zeros_like(w) if prev is None else (prev >> (31 - s)) >> 1
        out.append((w << s) | hi)
        prev = w
    out.append((prev >> (31 - s)) >> 1)
    return out


def _merge_chunks(aw, an, bw, bn, xp):
    """Concatenate bit-chunk pairs: chunk a (list of W uint32 word arrays,
    an bits) followed by chunk b.  Returns (2W word arrays, an + bn).

    b is bit-shifted by an & 31, then word-shifted by an >> 5 via
    binary-decomposed conditional rolls -- everything stays elementwise
    (no gathers, no sorts); content never exceeds 32 * 2W bits so words
    rolled off the top are provably zero.
    """
    W = len(aw)
    bs = _shl_words(bw, an & 31, xp)
    zero = xp.zeros_like(aw[0])
    bs = bs + [zero] * (2 * W - len(bs))
    d = an >> 5                                   # word offset, 0..W
    m = 0
    while (1 << m) <= W:
        k = 1 << m
        take = ((d >> m) & 1) != 0
        bs = [xp.where(take, bs[i - k] if i >= k else zero, bs[i])
              for i in range(2 * W)]
        m += 1
    return ([aw[i] | bs[i] for i in range(W)] + bs[W:]), an + bn


def pack_records_tree(code_o, nbits_o, rec_valid, xp=np, max_bits=None,
                      with_overflow=False, return_words=False):
    """Pack codewords (allocation order) LSB-first via a static merge tree.

    Same contract as pack_records, ~3x cheaper on TPU: three levels of
    pairwise codeword concatenation (pure elementwise -- dynamic shifts
    with binary-decomposed word rolls) fold every 8 records into one
    <=128-bit chunk, so the merged-sort word placement runs at 1/8 the
    record count (the full-length sorts were the measured pack cost).
    Bit-exact vs pack_records for every input (codewords are <= 16 bits:
    golomb codes cap at GOLOMB_L+1, custom codes at 10)."""
    L = code_o.shape[-1]
    if max_bits is None:
        max_bits = ((10 * L + 7) // 8) * 8
    nb = (nbits_o * rec_valid).astype(xp.int32)
    total = nb.sum()
    W = (max_bits + 31) // 32

    code = (code_o.astype(xp.uint32)
            & ((xp.uint32(1) << nb.astype(xp.uint32)) - 1))
    code = xp.where(rec_valid, code, xp.uint32(0))

    Rp = -(-L // 8) * 8
    if Rp != L:
        code = xp.concatenate([code, xp.zeros(Rp - L, xp.uint32)])
        nb = xp.concatenate([nb, xp.zeros(Rp - L, xp.int32)])

    # level 1: record pairs -> one word (<= 32 bits; lhs <= 16 bits)
    w1 = code[0::2] | (code[1::2] << nb[0::2].astype(xp.uint32))
    n1 = nb[0::2] + nb[1::2]
    # level 2: word pairs -> 2 words (<= 64 bits)
    cw, n2 = _merge_chunks([w1[0::2]], n1[0::2], [w1[1::2]], n1[1::2], xp)
    # level 3: -> 4 words (<= 128 bits)
    cw, n4 = _merge_chunks([w[0::2] for w in cw], n2[0::2],
                           [w[1::2] for w in cw], n2[1::2], xp)

    # place chunks at their stream offsets (one cumsum over Rp/8 chunks)
    off = xp.cumsum(n4) - n4
    cw = _shl_words(cw, off & 31, xp)             # 5 word arrays
    wc = off >> 5                                 # target word, nondecr.
    NW = len(cw)

    if _is_jax(xp):
        # merged-sort prefix sums: one co-sort of [chunks | queries] keyed
        # by word id, cumsum each word stream, then compact the W + 1
        # query rows to the front (see pack_records for the derivation)
        # unstable sorts: word sums are commutative, so tie order among
        # equal-word chunks never changes a query's prefix total
        BIGK = xp.int32(2 ** 30)
        qkey = 2 * xp.arange(W + 1, dtype=xp.int32)
        key = xp.concatenate([2 * wc.astype(xp.int32) + 1, qkey])
        zpad = xp.zeros(W + 1, xp.uint32)
        ops = [xp.concatenate([c, zpad]) for c in cw]
        k2, ops2 = _sort_by(key, ops, xp, stable=False)
        isq2 = (k2 & 1) == 0
        cums = [xp.cumsum(o, dtype=xp.uint32) for o in ops2]
        _, qs = _sort_by(xp.where(isq2, k2, BIGK), cums, xp, stable=False)
        ds = [q[1:W + 1] - q[:W] for q in qs]
    else:
        # bounds[q] = #chunks with wc < q, so S(q) = sum over wc < q and
        # ds[w] = S(w + 1) - S(w) = sum over wc == w
        bounds = xp.searchsorted(wc, xp.arange(W + 1, dtype=wc.dtype),
                                 side="left")
        ds = []
        for c in cw:
            cs = xp.concatenate([xp.zeros(1, xp.uint32),
                                 xp.cumsum(c, dtype=xp.uint32)])
            s = cs[bounds]
            ds.append(s[1:] - s[:-1])

    words = ds[0]
    for r in range(1, NW):
        words = words + xp.concatenate([xp.zeros(min(r, W), xp.uint32),
                                        ds[r][:max(W - r, 0)]])
    if return_words:
        assert max_bits % 32 == 0
        if with_overflow:
            return words, total, total > max_bits
        return words, total
    b0 = (words & 0xFF).astype(xp.uint8)
    b1 = ((words >> 8) & 0xFF).astype(xp.uint8)
    b2 = ((words >> 16) & 0xFF).astype(xp.uint8)
    b3 = ((words >> 24) & 0xFF).astype(xp.uint8)
    payload = xp.stack([b0, b1, b2, b3], axis=-1).reshape(-1)[:max_bits // 8]
    if with_overflow:
        return payload, total, total > max_bits
    return payload, total


def encode_emissions_sorted(valid, ctx, bit, xp=np, max_bits=None,
                            return_words=False):
    """Full sort-centric encode: (payload, total_bits, flush_flag).

    ``max_bits`` caps the packed payload (see pack_records); cap overflow
    folds into the flush flag (host fallback either way)."""
    spos, sbin, scoded = counters_and_bins_sorted(valid, ctx, bit, xp)
    open_o, code_o, nbits_o, done_o, rec_valid = build_records(
        spos, sbin, scoded, xp)
    flush = detect_flush_records(open_o, done_o, rec_valid, xp)
    payload, total, over = pack_records_tree(code_o, nbits_o, rec_valid, xp,
                                             max_bits=max_bits,
                                             with_overflow=True,
                                             return_words=return_words)
    return payload, total, flush | over


def _shift_rows(a, xp):
    """a shifted down by one along axis 0 (row j reads row j-1)."""
    return xp.concatenate([a[:1] * 0, a[:-1]], axis=0)


def _small_scatter_add(n, idx, vals, xp):
    """Scatter-add a *small* number of updates into a length-n array."""
    out = xp.zeros(n, dtype=xp.int32)
    if _is_jax(xp):
        return out.at[xp.clip(idx, 0, n - 1)].add(vals)
    np.add.at(out, np.clip(idx, 0, n - 1), vals)
    return out
