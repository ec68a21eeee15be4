"""Position-aligned (static-shape) ICER entropy encoder for XLA/TPU.

Same algorithm as ops/entropy_vec.py, reformulated so every array has the
static length of the emission stream (padded segments included) and every
step is a cumulative op, gather or scatter -- the shape discipline jit
requires.  All functions are generic over numpy / jax.numpy; under jit the
whole pipeline lowers to VPU integer work with no host round trips.

Key reformulations relative to the numpy prototype:
  - per-context bookkeeping via one-hot cumulative sums (L, 18);
  - the counter rescale chunks via a fixed-length scan (bounded by
    ceil(L/250)+2 chunks);
  - golomb run splitting via rank-space cummax/"next end" reverse scans
    instead of np.repeat;
  - custom-code grouping via the 5-state countdown automaton composed with
    a Hillis-Steele doubling scan over rank space, batched over all seven
    custom bins at once;
  - codeword output assembly as a masked prefix-sum + scatter into a
    statically-bounded bit buffer.

The mid-plane buffer-flush condition is detected exactly (a flag output);
affected streams are re-encoded by the sequential backend on host.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C

NCTX = 18          # contexts 0..16 + uncoded(17)
NBINS = C.ENCODER_BIN_MAX + 1
_CHUNK = C.CONTEXT_RESCALING_CAP // 2              # 250
_FIRST = C.CONTEXT_RESCALING_CAP - C.DEFAULT_CONTEXT_TOTAL_COUNT  # 496 occs

from .entropy_vec import TAIL_BITS, TAIL_CODE, WIN_BITS, WIN_CODE, WIN_LEN

_GOL_VAL = C.GOLOMB_CODE_VALUE.astype(np.int32)    # [bin, k] k=0..m ('1' at m)
_GOL_BITS = C.GOLOMB_CODE_BITS.astype(np.int32)
_GOL_M = C.GOLOMB_M.astype(np.int32)

_CUSTOM_BINS = tuple(range(1, 8))
_GOLOMB_BINS = tuple(range(8, 17))


def _is_jax(xp) -> bool:
    return xp.__name__.startswith("jax")


def _scatter_set(target, idx, vals, xp):
    """target[idx] = vals elementwise (indices assumed collision-free)."""
    if _is_jax(xp):
        return target.at[idx].set(vals)
    t = target.copy()
    t[idx] = vals
    return t


def _cummax(a, xp, axis=-1):
    if _is_jax(xp):
        import jax
        return jax.lax.cummax(a, axis=axis if axis >= 0 else a.ndim + axis)
    return np.maximum.accumulate(a, axis=axis)


def _shift1(a, fill, xp, axis=0):
    """a shifted by one along ``axis`` (exclusive), front-filled."""
    pad = xp.full(a.shape[:axis] + (1,) + a.shape[axis + 1:], fill,
                  dtype=a.dtype)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, a.shape[axis] - 1)
    return xp.concatenate([pad, a[tuple(sl)]], axis=axis)


# --------------------------------------------------------------------------
# Counters and bins
# --------------------------------------------------------------------------

def counters_and_bins_pa(valid, ctx, bit, xp=np, max_chunks: int | None = None):
    """(bin, coded_bit) per emission; junk at invalid slots.

    valid/ctx/bit: (L,) int32.  max_chunks bounds the rescale chunks
    (defaults to the exact static bound from L).
    """
    L = valid.shape[0]
    if max_chunks is None:
        max_chunks = (L - _FIRST) // _CHUNK + 2 if L > _FIRST else 1
    valid = valid.astype(xp.int32)
    bit = bit.astype(xp.int32)
    ctx = ctx.astype(xp.int32)

    # Context-major (NCTX, L) layout: keeps the long axis minor so TPU
    # tiling doesn't pad an 18-wide minor dimension to 128 lanes.
    onehot = ((ctx[None, :] == xp.arange(NCTX)[:, None]) &
              (valid[None, :] != 0)).astype(xp.int32)      # (NCTX, L)
    zero_oh = onehot * (bit == 0)[None, :]
    occ_incl = xp.cumsum(onehot, axis=1)                   # (NCTX, L)
    cz_incl = xp.cumsum(zero_oh, axis=1)

    cols = xp.arange(NCTX)[:, None]
    occ_self = (onehot * occ_incl).sum(axis=0) - 1
    cz_self_excl = ((onehot * cz_incl).sum(axis=0)
                    - ((valid != 0) & (bit == 0)).astype(xp.int32))

    n_c = occ_incl[:, -1] if L > 0 else xp.zeros(NCTX, xp.int32)  # (NCTX,)
    cz_total = cz_incl[:, -1]

    # cz_table[j, c] = zeros among the first min(B_j, n_c) occurrences of
    # context c, where B_0 = 0 and B_j = _FIRST + _CHUNK*(j-1) are the
    # (fixed) rescale-chunk boundaries.  Only these ~L/250 values of the
    # per-context zero prefix are ever needed, so this replaces a full
    # (L, NCTX) rank table (which dominated memory).
    b_vals = np.concatenate(
        [[0], _FIRST + _CHUNK * np.arange(max_chunks, dtype=np.int64)])
    is_bnd = (onehot != 0) & (occ_incl >= _FIRST) \
        & ((occ_incl - _FIRST) % _CHUNK == 0)
    j_idx = xp.where(is_bnd, (occ_incl - _FIRST) // _CHUNK + 1,
                     max_chunks + 1)
    cz_table = xp.zeros((max_chunks + 2, NCTX), dtype=xp.int32)
    cz_table = _scatter_set(cz_table,
                            (j_idx, xp.broadcast_to(cols, j_idx.shape)),
                            cz_incl, xp)[:max_chunks + 1]
    cz_table = xp.where(
        xp.asarray(b_vals[:max_chunks + 1])[:, None] > n_c[None, :],
        cz_total[None, :], cz_table)  # (max_chunks+1, NCTX)

    z0 = xp.full((NCTX,), C.DEFAULT_CONTEXT_ZERO_COUNT, dtype=xp.int32)
    # Tie the scan carry to the inputs so its "varying" type matches under
    # shard_map (a pure-constant carry trips the vma check).
    z0 = z0 + valid[:1].sum() * 0
    if _is_jax(xp):
        import jax

        def step(z_prev, j):
            zj = z_prev + (cz_table[j + 1] - cz_table[j])
            zj = xp.where(zj > _CHUNK, zj >> 1, zj)
            return zj, z_prev

        _, z_starts = jax.lax.scan(step, z0, xp.arange(max_chunks))
        # z_starts[j] = state at the *start* of chunk j
    else:
        zs = [z0]
        z = z0
        for j in range(max_chunks - 1):
            zj = z + (cz_table[j + 1] - cz_table[j])
            z = np.where(zj > _CHUNK, zj >> 1, zj)
            zs.append(z)
        z_starts = np.stack(zs)                              # (max_chunks, NCTX)

    chunk_id = xp.where(occ_self < _FIRST, 0,
                        1 + (occ_self - _FIRST) // _CHUNK).astype(xp.int32)
    chunk_id = xp.clip(chunk_id, 0, max_chunks - 1)

    z_start_g = z_starts[chunk_id, ctx]
    cz_cs = cz_table[chunk_id, ctx]
    zero = z_start_g + (cz_self_excl - cz_cs)
    total = xp.where(occ_self < _FIRST,
                     C.DEFAULT_CONTEXT_TOTAL_COUNT + occ_self,
                     _CHUNK + (occ_self - _FIRST) % _CHUNK).astype(xp.int32)

    # Uncoded emissions use fixed (1, 2).
    unc = ctx == (NCTX - 1)
    zero = xp.where(unc, 1, zero)
    total = xp.where(unc, 2, total)

    inv = zero < (total >> 1)
    zero = xp.where(inv, total - zero, zero)
    coded = (bit ^ inv).astype(xp.int32)

    comp = zero.astype(xp.int64) * C.BIN_PROBABILITY_DENOMINATOR
    cut = xp.asarray(C.BIN_PROBABILITY_CUTOFFS[:16].astype(np.int64))
    binv = (comp[:, None] >= total.astype(xp.int64)[:, None] * cut[None, :])
    binv = binv.sum(axis=1).astype(xp.int32)
    return binv, coded


# --------------------------------------------------------------------------
# Codeword construction (position-aligned)
# --------------------------------------------------------------------------

def _rank_arrays(mask, xp):
    """rank (1-based, inclusive) within the masked subsequence; count."""
    rank = xp.cumsum(mask.astype(xp.int32))
    return rank, (rank[-1] if mask.shape[0] else xp.int32(0))


def build_codewords(valid, binv, coded, xp=np):
    """Per-emission codeword arrays.

    Returns (is_open, code, nbits, done) with shape (L,):
      is_open[e]=1 iff a codeword opens at emission e; code/nbits its
      output bits (LSB-first); done[e] = emission index at whose
      processing the codeword completes (BIG for end-of-plane flushes).
    """
    L = valid.shape[0]
    BIG = xp.int32(2 ** 30)
    pos = xp.arange(L, dtype=xp.int32)
    valid = (valid != 0)

    is_open = xp.zeros(L, dtype=xp.int32)
    code = xp.zeros(L, dtype=xp.int32)
    nbits = xp.zeros(L, dtype=xp.int32)
    done = xp.full((L,), BIG, dtype=xp.int32)

    # ---- bin 0 (uncoded): one codeword per bit --------------------------
    m0 = valid & (binv == 0)
    is_open = xp.where(m0, 1, is_open)
    code = xp.where(m0, coded, code)
    nbits = xp.where(m0, 1, nbits)
    done = xp.where(m0, pos, done)

    # ---- golomb bins (all 9 batched) ------------------------------------
    gbins = xp.asarray(np.array(_GOLOMB_BINS, dtype=np.int32))
    mG = xp.asarray(_GOL_M[np.array(_GOLOMB_BINS)])[:, None]    # (9, 1)
    mbG = (valid[None, :] & (binv[None, :] == gbins[:, None]))  # (9, L)
    rankG = xp.cumsum(mbG.astype(xp.int32), axis=1)
    n_bG = rankG[:, -1:]                                         # (9, 1)
    onemG = mbG & (coded[None, :] == 1)
    zeromG = mbG & (coded[None, :] == 0)
    last1_excl = _shift1(_cummax(xp.where(onemG, rankG, 0), xp), 0, xp,
                         axis=1)
    run_pos = rankG - 1 - last1_excl             # zeros before e in this run
    ends = onemG | (zeromG & (run_pos % mG == mG - 1))
    end_rank_excl = _shift1(_cummax(xp.where(ends, rankG, 0), xp), 0, xp,
                            axis=1)
    startsG = mbG & (end_rank_excl == rankG - 1)

    # next end rank at >= e (reverse cummin along L)
    er = xp.where(ends, rankG, BIG)
    ner = xp.flip(_cummax(xp.flip(-er, -1), xp), -1) * -1
    idxG = xp.where(ends, rankG, L + 1)
    rows9 = xp.broadcast_to(xp.arange(9)[:, None], idxG.shape)
    isone_at_rank = _scatter_set(xp.zeros((9, L + 2), xp.int32),
                                 (rows9, idxG), onemG.astype(xp.int32), xp)
    pos_at_rankG = _scatter_set(xp.zeros((9, L + 2), xp.int32),
                                (rows9, idxG),
                                xp.broadcast_to(pos[None, :], idxG.shape), xp)

    has_end = ner <= n_bG
    ner_c = xp.clip(ner, 0, L + 1)
    isone_g = xp.take_along_axis(isone_at_rank, ner_c, axis=1)
    k = xp.where(coded[None, :] == 1, 0, ner_c - rankG + (1 - isone_g))
    k_tail = n_bG - rankG + 1                    # zeros to end (no end)
    k_full = xp.clip(xp.where(has_end, k, k_tail), 0, mG)
    gvG = xp.asarray(_GOL_VAL[np.array(_GOLOMB_BINS)])          # (9, mmax+1)
    gbG = xp.asarray(_GOL_BITS[np.array(_GOLOMB_BINS)])
    cw_code = xp.take_along_axis(gvG, k_full, axis=1)
    cw_bits = xp.take_along_axis(gbG, k_full, axis=1)
    # flush quirk: k_tail == m-1 emits the '1' codeword
    flushm1 = (~has_end) & (k_full == mG - 1)
    cw_code = xp.where(flushm1, 1, cw_code)
    cw_bits = xp.where(flushm1, 1, cw_bits)
    cw_done = xp.where(has_end,
                       xp.take_along_axis(pos_at_rankG, ner_c, axis=1), BIG)

    # fold the 9 bins back (each position belongs to at most one bin)
    anyG = startsG.any(axis=0)
    code_g = xp.where(startsG, cw_code, 0).sum(axis=0)
    bits_g = xp.where(startsG, cw_bits, 0).sum(axis=0)
    done_g = xp.where(startsG, cw_done, 0).sum(axis=0)
    is_open = xp.where(anyG, 1, is_open)
    code = xp.where(anyG, code_g, code)
    nbits = xp.where(anyG, bits_g, nbits)
    done = xp.where(anyG, done_g, done)

    # ---- custom bins (batched 5-state countdown automaton) --------------
    ranks = []
    nbs = []
    masks = []
    for b in _CUSTOM_BINS:
        mb = valid & (binv == b)
        rank, n_b = _rank_arrays(mb, xp)
        masks.append(mb)
        ranks.append(rank)
        nbs.append(n_b)
    mask7 = xp.stack(masks)                      # (7, L)
    rank7 = xp.stack(ranks)
    nb7 = xp.stack([xp.asarray(x) for x in nbs]) if _is_jax(xp) else np.array(nbs)

    # rank -> position and rank -> bit maps per bin
    idx7 = xp.where(mask7, rank7, L + 1)
    pos_b = xp.broadcast_to(pos[None, :], mask7.shape)
    pos_at_rank7 = xp.zeros((7, L + 7), dtype=xp.int32)
    bit_at_rank7 = xp.zeros((7, L + 7), dtype=xp.int32)
    rows = xp.arange(7)[:, None] + xp.zeros_like(idx7)
    pos_at_rank7 = _scatter_set(pos_at_rank7, (rows, idx7), pos_b, xp)
    bit_at_rank7 = _scatter_set(bit_at_rank7, (rows, idx7),
                                xp.broadcast_to(coded[None, :], mask7.shape),
                                xp)

    # 5-bit windows over rank space (zeros past n_b)
    r_idx = xp.arange(1, L + 1, dtype=xp.int32)[None, :]     # ranks 1..L
    w7 = xp.zeros((7, L), dtype=xp.int32)
    for j in range(5):
        rj = xp.clip(r_idx + j, 0, L + 6)
        valid_j = (r_idx + j) <= nb7[:, None]
        bj = xp.take_along_axis(bit_at_rank7, rj, axis=1) * valid_j
        w7 = w7 | (bj << j)

    wl = xp.asarray(WIN_LEN)[xp.asarray(_CUSTOM_BINS)[:, None], w7]  # (7, L)
    # countdown transitions over rank space: state d=0 -> start, next d =
    # clen-1; else d-1.  Identity beyond n_b.  State axis FIRST: a size-5
    # minor axis would be tile-padded to 128 lanes on TPU (25x memory).
    beyond = r_idx > nb7[:, None]                # (7, L)
    wl1 = xp.clip(wl - 1, 0, 4)
    trans = xp.stack(
        [xp.where(beyond, d, wl1 if d == 0 else d - 1) for d in range(5)],
        axis=0).astype(xp.int8)                  # (5, 7, L)
    pref = _prefix_compose(trans, xp)            # (5, 7, L)
    state_before = _shift1(pref[0], xp.int8(0), xp, axis=1).astype(xp.int32)
    start_rank = (state_before == 0) & (r_idx <= nb7[:, None])   # (7, L)

    clen = wl
    complete = (r_idx + clen - 1) <= nb7[:, None]
    cw_code7 = xp.asarray(WIN_CODE)[xp.asarray(_CUSTOM_BINS)[:, None], w7]
    cw_bits7 = xp.asarray(WIN_BITS)[xp.asarray(_CUSTOM_BINS)[:, None], w7]
    done_rank = xp.clip(r_idx + clen - 1, 0, L + 6)
    done7 = xp.where(complete,
                     xp.take_along_axis(pos_at_rank7, done_rank, axis=1), BIG)

    # tails: accumulate the remaining (<=4) bits and use the flush LUT
    tail_nb = xp.clip(nb7[:, None] - r_idx + 1, 0, 4)
    tv = xp.zeros((7, L), dtype=xp.int32)
    for j in range(4):
        rj = xp.clip(r_idx + j, 0, L + 6)
        bj = xp.take_along_axis(bit_at_rank7, rj, axis=1)
        tv = tv | xp.where(j < tail_nb, bj << j, 0)
    tc = xp.asarray(TAIL_CODE)[xp.asarray(_CUSTOM_BINS)[:, None],
                               tail_nb, tv]
    tb = xp.asarray(TAIL_BITS)[xp.asarray(_CUSTOM_BINS)[:, None],
                               tail_nb, tv]
    cw_code7 = xp.where(complete, cw_code7, tc)
    cw_bits7 = xp.where(complete, cw_bits7, tb)

    # scatter back to emission positions (via rank -> position)
    open_pos = xp.take_along_axis(pos_at_rank7, xp.clip(r_idx, 0, L + 6),
                                  axis=1)
    tgt = xp.where(start_rank, open_pos, L + 1)
    is_open = _scatter_set(
        xp.concatenate([is_open, xp.zeros(2, xp.int32)]),
        tgt.reshape(-1), xp.broadcast_to(
            xp.ones((), xp.int32), tgt.shape).reshape(-1) * start_rank.reshape(-1),
        xp)[:L]
    code = _scatter_set(
        xp.concatenate([code, xp.zeros(2, xp.int32)]),
        tgt.reshape(-1), cw_code7.reshape(-1), xp)[:L]
    nbits = _scatter_set(
        xp.concatenate([nbits, xp.zeros(2, xp.int32)]),
        tgt.reshape(-1), cw_bits7.reshape(-1), xp)[:L]
    done = _scatter_set(
        xp.concatenate([done, xp.zeros(2, xp.int32)]),
        tgt.reshape(-1), done7.reshape(-1), xp)[:L]

    return is_open, code, nbits, done


def _prefix_compose(trans, xp):
    """Inclusive prefix composition of 5-state transitions.

    trans: (5, ..., L) with the state axis FIRST (a size-5 minor axis would
    be tile-padded 25x on TPU) and the scan axis last.  Composition over
    the 5-element state space uses unrolled selects (25 fused elementwise
    ops) rather than a gather, which lowers catastrophically in the TPU
    compiler.  Hillis-Steele doubling: O(log L) steps.
    """
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


def detect_buffer_flush(is_open, done, xp=np):
    """True if >= CIRC_BUF_SIZE codewords are ever simultaneously open."""
    L = is_open.shape[0]
    BIG = xp.int32(2 ** 30)
    pos = xp.arange(L, dtype=xp.int32)
    k = xp.cumsum(is_open)                       # codeword count up to e incl
    # running max of done over codewords in open order
    runmax = _cummax(xp.where(is_open != 0, done, -1), xp)
    # position of the r-th codeword's open
    pos_of_rank = _scatter_set(xp.zeros(L + 2, xp.int32),
                               xp.where(is_open != 0, k, L + 1), pos, xp)
    r_old = k - C.CIRC_BUF_SIZE                  # rank of the word that must
    risky = (is_open != 0) & (r_old >= 1)        # have been popped
    old_pos = pos_of_rank[xp.clip(r_old, 0, L + 1)]
    not_popped = runmax[xp.clip(old_pos, 0, L - 1)] >= pos
    return (risky & not_popped).any()


def pack_payload(is_open, code, nbits, xp=np, max_bits: int | None = None):
    """Concatenate codewords (open order) LSB-first into a byte buffer.

    Returns (payload_u8[max_bits//8], total_bits).  max_bits defaults to
    the static bound 10 * L rounded to a byte multiple.
    """
    L = is_open.shape[0]
    if max_bits is None:
        max_bits = ((10 * L + 7) // 8) * 8
    nb = nbits * (is_open != 0)
    off = xp.cumsum(nb) - nb                     # exclusive prefix
    bitsbuf = xp.zeros(max_bits + 16, dtype=xp.uint8)
    for j in range(10):
        m = (is_open != 0) & (j < nb)
        tgt = xp.where(m, off + j, max_bits + 8)
        bitsbuf = _scatter_set(bitsbuf, tgt,
                               ((code >> j) & 1).astype(xp.uint8), xp)
    total = nb.sum()
    # Pack 8 bits/byte with strided slices (a reshape to (.., 8) would be
    # tile-padded 16x on TPU).
    payload = bitsbuf[0:max_bits:8]
    for j in range(1, 8):
        payload = payload + (bitsbuf[j:max_bits:8] << j)
    return payload.astype(xp.uint8), total


def encode_emissions_pa(valid, ctx, bit, xp=np):
    """Full position-aligned encode.  Returns (payload, total_bits, flush)."""
    binv, coded = counters_and_bins_pa(valid, ctx, bit, xp)
    is_open, code, nbits, done = build_codewords(
        (valid != 0), binv, coded, xp)
    flush = detect_buffer_flush(is_open, done, xp)
    payload, total = pack_payload(is_open, code, nbits, xp)
    return payload, total, flush
