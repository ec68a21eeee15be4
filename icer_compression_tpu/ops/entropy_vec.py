"""Vectorized (data-parallel) formulation of the ICER interleaved entropy
encoder -- the TPU-shaped algorithm, prototyped on numpy.

The reference encodes one bit at a time through shared adaptive state
(icer_encoding.c).  Every piece of that state is re-derived here as a
parallel pass over the whole emission stream of one (segment, bitplane):

1. counters: each context's total_count follows a *deterministic*
   trajectory (rescale boundaries at fixed occurrence indices 496,
   746, ...), so zero_count reduces to per-context prefix sums plus a short
   scan over rescale chunks (icer_context_modeller.c:396-402);
2. bin assignment: closed-form comparison against the 17 probability
   cutoffs (icer_util.c:48-56);
3. codeword grouping: Golomb bins decompose in closed form over
   zero-run lengths; custom variable-to-variable bins are a 5-state
   jump automaton whose transitions compose associatively (prefix-compose
   by doubling -> O(log n) depth);
4. interleaving: a codeword's payload position is fully determined by the
   emission index of its *opening* bit (the circular buffer pops in
   allocation order -- icer_encoding.c:114-139), so ordering is a sort and
   bit-packing a prefix-sum + scatter;
5. end-of-plane flush codes for each bin's open tail word
   (icer_encoding.c:141-189).

The one state this pass cannot reproduce is a mid-plane forced flush when
2048 codewords are simultaneously in flight (icer_encoding.c:59-64).  The
condition is detected exactly (occupancy check over the allocation order)
and such streams -- rare in practice -- are delegated to the sequential
backend by returning None.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C

# --------------------------------------------------------------------------
# Static LUTs for the custom-code bins
# --------------------------------------------------------------------------

def _build_custom_luts():
    """Per bin: window LUT over 5-bit (LSB-first) patterns -> (len, code,
    nbits); tail LUT over (prefix value, nbits) -> (code, nbits)."""
    nbins = C.ENCODER_BIN_MAX + 1
    win_len = np.zeros((nbins, 32), dtype=np.int32)
    win_code = np.zeros((nbins, 32), dtype=np.int32)
    win_bits = np.zeros((nbins, 32), dtype=np.int32)
    # tail: indexed [bin, nbits(1..4), value(0..15)]
    tail_code = np.zeros((nbins, 5, 16), dtype=np.int32)
    tail_bits = np.zeros((nbins, 5, 16), dtype=np.int32)
    for b in C.CUSTOM_CODES:
        for w in range(32):
            v = 0
            for j in range(5):
                v |= ((w >> j) & 1) << j
                if int(C.CUSTOM_IN_BITS[b, v & 31]) == j + 1:
                    win_len[b, w] = j + 1
                    win_code[b, w] = int(C.CUSTOM_OUT_CODE[b, v & 31])
                    win_bits[b, w] = int(C.CUSTOM_OUT_BITS[b, v & 31])
                    break
        for nb in range(1, 5):
            for v in range(1 << nb):
                fv, fn = C.CUSTOM_FLUSH_BITS[b].get((v, nb), (0, 0))
                fin = v | (fv << nb)
                tail_code[b, nb, v] = int(C.CUSTOM_OUT_CODE[b, fin & 31])
                tail_bits[b, nb, v] = int(C.CUSTOM_OUT_BITS[b, fin & 31])
    return win_len, win_code, win_bits, tail_code, tail_bits


(WIN_LEN, WIN_CODE, WIN_BITS, TAIL_CODE, TAIL_BITS) = _build_custom_luts()

_RESCALE_FIRST = C.CONTEXT_RESCALING_CAP - C.DEFAULT_CONTEXT_TOTAL_COUNT - 1
# occurrence index whose processing triggers the first rescale: total goes
# 4 -> 500 after 496 increments, so bit #495 (0-based) triggers it.
_CHUNK = C.CONTEXT_RESCALING_CAP // 2  # 250


# --------------------------------------------------------------------------
# Stage 1+2: counters and bins
# --------------------------------------------------------------------------

def counters_and_bins(ctxv: np.ndarray, bitv: np.ndarray):
    """(zero, total) before each emission, then inversion + bin id.

    Returns (binv, coded_bit) arrays.
    """
    L = len(ctxv)
    zero = np.ones(L, dtype=np.int64)
    total = np.full(L, 2, dtype=np.int64)

    is_zero_bit = (bitv == 0).astype(np.int64)
    for c in range(C.CONTEXT_MAX + 1):
        mask = ctxv == c
        n_c = int(mask.sum())
        if n_c == 0:
            continue
        occ_incl = np.cumsum(mask)            # occurrences up to & incl i
        occ = occ_incl[mask] - 1              # 0-based occurrence index
        cz_incl = np.cumsum(mask & (bitv == 0))
        cz_excl = cz_incl[mask] - (is_zero_bit[mask])

        t = np.where(occ <= _RESCALE_FIRST,
                     C.DEFAULT_CONTEXT_TOTAL_COUNT + occ,
                     _CHUNK + (occ - (_RESCALE_FIRST + 1)) % _CHUNK)

        # chunk structure over occurrence indices
        chunk_id = np.where(occ <= _RESCALE_FIRST, 0,
                            1 + (occ - (_RESCALE_FIRST + 1)) // _CHUNK)
        n_chunks = int(chunk_id.max()) + 1
        # cz_at[k] = zeros among the first k occurrences (k = 0..n_c)
        cz_at = np.concatenate([[0], np.cumsum(is_zero_bit[mask])])

        z_start = np.zeros(n_chunks, dtype=np.int64)
        z_start[0] = C.DEFAULT_CONTEXT_ZERO_COUNT
        for j in range(1, n_chunks):
            bend = (_RESCALE_FIRST + 1) + _CHUNK * (j - 1)  # occs in chunks < j
            cstart = 0 if j == 1 else bend - _CHUNK
            zj = z_start[j - 1] + cz_at[min(bend, n_c)] - cz_at[cstart]
            if zj > _CHUNK:
                zj >>= 1
            z_start[j] = zj

        chunk_start_occ = np.where(
            chunk_id == 0, 0, (_RESCALE_FIRST + 1) + _CHUNK * (chunk_id - 1))
        z = z_start[chunk_id] + (cz_excl - cz_at[chunk_start_occ])
        zero[mask] = z
        total[mask] = t

    # uncoded emissions: fixed (1, 2) -- already initialized.
    inv = zero < (total >> 1)
    zero = np.where(inv, total - zero, zero)
    coded_bit = bitv ^ inv

    comp = zero * C.BIN_PROBABILITY_DENOMINATOR
    cut = C.BIN_PROBABILITY_CUTOFFS[:16].astype(np.int64)
    binv = (comp[:, None] >= total[:, None] * cut[None, :]).sum(axis=1)
    return binv.astype(np.int32), coded_bit.astype(np.int32)


# --------------------------------------------------------------------------
# Stage 3: codeword grouping
# --------------------------------------------------------------------------

def _golomb_codewords(b: int, bits_b: np.ndarray, sub_idx: np.ndarray):
    """Codewords of one Golomb bin from its bit subsequence.

    Returns (open_idx, done_idx, code, nbits, is_tail) arrays.
    done_idx of a complete word is the global index of its last consumed
    bit; tail (flush) words report done_idx = -1 (completed only at drain).
    """
    m = int(C.GOLOMB_M[b])
    L = len(bits_b)
    ones = np.flatnonzero(bits_b == 1)
    prev = np.concatenate([[-1], ones[:-1]])
    run_z = ones - prev - 1                   # zeros before each one
    q = run_z // m                            # full-m words per run
    s = run_z % m

    opens = []
    dones = []
    codes = []
    nbits = []
    tails = []
    # full-m words: open at prev+1 + j*m, done at prev+1 + j*m + m - 1
    if len(ones):
        tot_q = int(q.sum())
        if tot_q:
            rep_prev = np.repeat(prev, q)
            rep_base = np.repeat(np.concatenate([[0], np.cumsum(q)[:-1]]), q)
            j = np.arange(tot_q) - rep_base
            o = rep_prev + 1 + j * m
            opens.append(o)
            dones.append(o + m - 1)
            codes.append(np.ones(tot_q, dtype=np.int64))
            nbits.append(np.ones(tot_q, dtype=np.int64))
            tails.append(np.zeros(tot_q, dtype=bool))
        # terminated words: s zeros + the one
        o = np.where(s > 0, prev + 1 + q * m, ones)
        opens.append(o)
        dones.append(ones)
        codes.append(C.GOLOMB_CODE_VALUE[b, s].astype(np.int64))
        nbits.append(C.GOLOMB_CODE_BITS[b, s].astype(np.int64))
        tails.append(np.zeros(len(ones), dtype=bool))

    # tail run after the last one
    last_one = ones[-1] if len(ones) else -1
    tz = L - last_one - 1
    tq, ts = tz // m, tz % m
    if tq:
        o = last_one + 1 + np.arange(tq) * m
        opens.append(o)
        dones.append(o + m - 1)
        codes.append(np.ones(tq, dtype=np.int64))
        nbits.append(np.ones(tq, dtype=np.int64))
        tails.append(np.zeros(tq, dtype=bool))
    if ts:
        # flush: k == m-1 -> '1'; else the normal k-codeword
        # (icer_encoding.c:152-166)
        o = np.array([last_one + 1 + tq * m])
        opens.append(o)
        dones.append(np.array([-1]))
        if ts == m - 1:
            codes.append(np.array([1], dtype=np.int64))
            nbits.append(np.array([1], dtype=np.int64))
        else:
            codes.append(np.array([int(C.GOLOMB_CODE_VALUE[b, ts])]))
            nbits.append(np.array([int(C.GOLOMB_CODE_BITS[b, ts])]))
        tails.append(np.array([True]))

    if not opens:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z.astype(bool)
    opens = np.concatenate(opens)
    order = np.argsort(opens, kind="stable")
    return (sub_idx[opens[order]],
            np.where(np.concatenate(dones)[order] >= 0,
                     sub_idx[np.maximum(np.concatenate(dones)[order], 0)],
                     np.int64(np.iinfo(np.int64).max)),
            np.concatenate(codes)[order], np.concatenate(nbits)[order],
            np.concatenate(tails)[order])


def _prefix_compose_doubling(trans: np.ndarray) -> np.ndarray:
    """Inclusive prefix composition via doubling (Hillis-Steele).

    pref[i] = T_i o T_{i-1} o ... o T_0 (rightmost applied first).
    """
    L = trans.shape[0]
    pref = trans.astype(np.int8).copy()
    step = 1
    while step < L:
        new = pref.copy()
        # new[i] = pref[i] o pref[i-step]  for i >= step
        a = pref[step:]                      # outer (later positions)
        b = pref[:-step]                     # inner (earlier prefix)
        new[step:] = np.take_along_axis(a, b.astype(np.intp), axis=1)
        pref = new
        step *= 2
    return pref


def _custom_codewords(b: int, bits_b: np.ndarray, sub_idx: np.ndarray):
    """Codewords of one custom-code bin via the 5-state jump automaton."""
    L = len(bits_b)
    # 5-bit windows (LSB-first), zero-padded past the end.
    w = np.zeros(L, dtype=np.int64)
    for j in range(5):
        nxt = np.zeros(L, dtype=np.int64)
        k = max(L - j, 0)
        nxt[:k] = bits_b[j:j + k]
        w |= nxt << j
    clen = WIN_LEN[b, w]                      # codeword length if started here

    # Transition of the countdown automaton: state d = remaining bits of
    # the current codeword before the next start.
    d = np.arange(5)[None, :]
    start_here = d == 0
    after = np.where(start_here, clen[:, None] - 1, d - 1)
    pref = _prefix_compose_doubling(after)

    state_before = np.empty(L, dtype=np.int64)
    state_before[0] = 0
    if L > 1:
        state_before[1:] = pref[:-1, 0]
    starts = np.flatnonzero(state_before == 0)

    slen = clen[starts]
    complete = starts + slen <= L
    # guard: a start whose window-derived length over-runs L is a tail
    opens = sub_idx[starts]
    dones = np.where(complete,
                     sub_idx[np.minimum(starts + slen - 1, L - 1)],
                     np.int64(np.iinfo(np.int64).max))
    codes = WIN_CODE[b, w[starts]].astype(np.int64)
    nbits = WIN_BITS[b, w[starts]].astype(np.int64)
    if len(starts) and not complete[-1]:
        # tail word: accumulated prefix of nb = L - start bits
        st = int(starts[-1])
        nb = L - st
        v = 0
        for j in range(nb):
            v |= int(bits_b[st + j]) << j
        codes[-1] = int(TAIL_CODE[b, nb, v])
        nbits[-1] = int(TAIL_BITS[b, nb, v])
    return opens, dones, codes, nbits, ~complete


def group_codewords(binv: np.ndarray, coded_bit: np.ndarray):
    """All codewords of a stream: (open, done, code, nbits) in open order."""
    all_open = []
    all_done = []
    all_code = []
    all_nbits = []
    g = np.arange(len(binv), dtype=np.int64)
    for b in range(C.ENCODER_BIN_MAX + 1):
        mask = binv == b
        if not mask.any():
            continue
        sub_idx = g[mask]
        bits_b = coded_bit[mask]
        if b == 0:
            all_open.append(sub_idx)
            all_done.append(sub_idx)
            all_code.append(bits_b.astype(np.int64))
            all_nbits.append(np.ones(len(sub_idx), dtype=np.int64))
        elif b > 7:
            o, d, c, n, _ = _golomb_codewords(b, bits_b, sub_idx)
            all_open.append(o)
            all_done.append(d)
            all_code.append(c)
            all_nbits.append(n)
        else:
            o, d, c, n, _ = _custom_codewords(b, bits_b, sub_idx)
            all_open.append(o)
            all_done.append(d)
            all_code.append(c)
            all_nbits.append(n)
    if not all_open:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    opens = np.concatenate(all_open)
    dones = np.concatenate(all_done)
    codes = np.concatenate(all_code)
    nbits = np.concatenate(all_nbits)
    order = np.argsort(opens, kind="stable")
    return opens[order], dones[order], codes[order], nbits[order]


def buffer_overflows(opens: np.ndarray, dones: np.ndarray) -> bool:
    """True if the 2048-word codeword buffer would force a mid-plane flush.

    At the allocation of word k (emission time opens[k]) the number of
    already-popped words is the longest prefix whose running max done-time
    is < opens[k]; occupancy = k - popped (icer_encoding.c:200-206).
    """
    n = len(opens)
    if n < C.CIRC_BUF_SIZE:
        return False
    runmax = np.maximum.accumulate(dones)
    popped = np.searchsorted(runmax, opens, side="left")
    used = np.arange(n) - np.minimum(popped, np.arange(n))
    return bool((used >= C.CIRC_BUF_SIZE).any())


def pack_codewords(codes: np.ndarray, nbits: np.ndarray):
    """Concatenate codewords LSB-first into bytes.  Returns (bytes, bits)."""
    total = int(nbits.sum())
    if total == 0:
        return b"", 0
    offsets = np.concatenate([[0], np.cumsum(nbits)[:-1]])
    rep = np.repeat(np.arange(len(codes)), nbits)
    base = np.repeat(offsets, nbits)
    j = np.arange(total) - base
    bits = (codes[rep] >> j) & 1
    padded = np.zeros(-(-total // 8) * 8, dtype=np.uint8)
    padded[:total] = bits
    payload = np.packbits(padded, bitorder="little").tobytes()
    return payload, total


def encode_emissions_vec(valid, ctx, bit):
    """Vectorized encode of one segment plane.

    Returns (payload, bit_length) or None when the stream needs the
    sequential path (mid-plane codeword-buffer flush).
    """
    valid = np.asarray(valid).ravel()
    ctx = np.asarray(ctx).ravel()
    bit = np.asarray(bit).ravel()
    keep = valid != 0
    ctxv = ctx[keep]
    bitv = bit[keep]
    if len(ctxv) == 0:
        return b"", 0
    binv, coded = counters_and_bins(ctxv, bitv)
    opens, dones, codes, nbits = group_codewords(binv, coded)
    if buffer_overflows(opens, dones):
        return None
    return pack_codewords(codes, nbits)
