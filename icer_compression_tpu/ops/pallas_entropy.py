"""Pallas TPU kernel: the ICER interleaved coder as a batched state machine.

The interleaved coder is inherently sequential per stream, but
embarrassingly parallel across streams (segments x bitplanes x channels x
images).  This kernel runs the *exact* sequential algorithm -- adaptive
counters, bin selection, golomb run-length and custom variable-to-variable
codeword construction -- for 128 lanes at once on the VPU, one emission per
loop step, with all per-lane state in VMEM:

  state: zero/total counters (17, 128) and per-bin open-word state
         (17, 128): run count / input prefix, prefix length, opening
         emission index;
  step:  17-way selects to read/update the lane's context and bin rows
         (masked broadcast writes -- no per-lane dynamic indexing, which
         Mosaic does not vectorize), bin id by 16 cutoff comparisons,
         codeword construction with packed-constant LUTs (shift
         arithmetic, no gathers), completed codewords emitted at the
         *current* output row so a record's row IS its completion time;
  out:   per-row (code, nbits, open) plus the final bin state for the
         end-of-plane flush words (computed outside, 17 tiny rows).

What stays in XLA: ordering records by opening emission (one sort --
output order equals allocation order, icer_encoding.c:114-139), the
CIRC_BUF flush-condition shift and bit packing (ops/entropy_jax2).

Status: production (opt-in): wired into the fused encoder as
ICER_JAX_ENTROPY=pallas / JaxGrayscaleEncoder(entropy="pallas"),
sha-verified bit-exact on chip against the reference golden stream;
~2 us/step on v5e (scripts/bench_pallas_tile.py; a shared-onehot
variant of the state writes measured slightly WORSE -- 2.6 vs 2.1
us/step -- so the inline compares stay).
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C

LANES = 128
BIG = 2 ** 30

_GOL = [(int(C.GOLOMB_M[b]), int(C.GOLOMB_L[b]), int(C.GOLOMB_I[b]))
        for b in range(17)]
_CUT = [int(x) for x in C.BIN_PROBABILITY_CUTOFFS[:16]]


def _packed_words(vals, width):
    per = 32 // width
    words = []
    for w0 in range(0, len(vals), per):
        word = 0
        for k, v in enumerate(vals[w0:w0 + per]):
            word |= int(v) << (k * width)
        words.append(word)
    return words, per, width


_CIN = {b: _packed_words([C.CUSTOM_IN_BITS[b, v] for v in range(32)], 4)
        for b in range(1, 8)}
_COUT = {b: _packed_words([C.CUSTOM_OUT_CODE[b, v] for v in range(32)], 8)
         for b in range(1, 8)}
_COBITS = {b: _packed_words([C.CUSTOM_OUT_BITS[b, v] for v in range(32)], 4)
           for b in range(1, 8)}


def _plookup(packed, idx, jnp):
    words, per, width = packed
    mask = (1 << width) - 1
    wi = idx // per
    off = (idx % per) * width
    out = jnp.zeros_like(idx)
    for k, word in enumerate(words):
        out = jnp.where(wi == k, (jnp.int32(word) >> off) & mask, out)
    return out


def _bitrev16(v, nbits, jnp):
    v = v & 0xFFFF
    v = ((v >> 1) & 0x5555) | ((v & 0x5555) << 1)
    v = ((v >> 2) & 0x3333) | ((v & 0x3333) << 2)
    v = ((v >> 4) & 0x0F0F) | ((v & 0x0F0F) << 4)
    v = ((v >> 8) & 0x00FF) | ((v & 0x00FF) << 8)
    return v >> (16 - nbits)


def _coder_step(state, v, c, b, emi, jax, jnp, lanes=LANES):
    """One emission step of the batched interleaved coder.

    state: (zero, total, bk, bnb, bop) -- (17, lanes) int32 each, carried
    in registers.  v/c/b: (lanes,) bool/int32.  Returns (state, code,
    nbits, open) where nbits == 0 marks "no codeword completed here".
    Mirrors icer_encode_bit/icer_compute_bin (icer_encoding.c) exactly;
    see the module docstring for the vectorization scheme.
    """
    zero, total, bk, bnb, bop = state
    iota17 = jax.lax.broadcasted_iota(jnp.int32, (17, lanes), 0)

    def sel17(st, cc):
        out = jnp.zeros((lanes,), jnp.int32)
        for k in range(17):
            out = jnp.where(cc == k, st[k, :], out)
        return out

    def wr17(st, cc, vals, mask):
        m = (iota17 == cc[None, :]) & mask[None, :]
        return jnp.where(m, vals[None, :], st)

    unc = c >= 17
    zc = sel17(zero, c)
    tc = sel17(total, c)
    zcu = jnp.where(unc, 1, zc)
    tcu = jnp.where(unc, 2, tc)
    inv = zcu < (tcu >> 1)
    zeff = jnp.where(inv, tcu - zcu, zcu)
    cb = (b ^ inv).astype(jnp.int32)

    comp = zeff * 65536
    bn = jnp.zeros((lanes,), jnp.int32)
    for q in range(16):
        bn = bn + (comp >= tcu * _CUT[q])

    upd = v & (~unc)
    tc2 = tc + 1
    zc2 = zc + (b == 0)
    resc = tc2 >= C.CONTEXT_RESCALING_CAP
    tc2 = jnp.where(resc, tc2 >> 1, tc2)
    zc2 = jnp.where(resc & (zc2 > tc2), zc2 >> 1, zc2)
    zero = wr17(zero, c, zc2, upd)
    total = wr17(total, c, tc2, upd)

    k = sel17(bk, bn)
    nb = sel17(bnb, bn)
    op = sel17(bop, bn)
    newly = op < 0
    op2 = jnp.where(newly, emi, op)
    k = jnp.where(newly, 0, k)
    nb = jnp.where(newly, 0, nb)

    isg = bn >= 8
    isc = (bn >= 1) & (bn <= 7)

    m_e = jnp.ones((lanes,), jnp.int32)
    l_e = jnp.ones((lanes,), jnp.int32)
    i_e = jnp.zeros((lanes,), jnp.int32)
    for gb in range(8, 17):
        m, l, ii = _GOL[gb]
        m_e = jnp.where(bn == gb, m, m_e)
        l_e = jnp.where(bn == gb, l, l_e)
        i_e = jnp.where(bn == gb, ii, i_e)

    kz = k + (cb == 0)
    g_run_done = (cb == 0) & (kz >= m_e)
    adj = jnp.where(k < i_e, k, k + i_e)
    gl = l_e + (k >= i_e)
    g_code = jnp.where(g_run_done, 1, _bitrev16(adj, gl, jnp))
    g_bits = jnp.where(g_run_done, 1, gl)
    g_complete = (cb == 1) | g_run_done

    val = (k | (cb << nb)) & 31
    nb2 = nb + 1
    cin = jnp.zeros((lanes,), jnp.int32)
    ccode = jnp.zeros((lanes,), jnp.int32)
    cbits = jnp.zeros((lanes,), jnp.int32)
    for bb in range(1, 8):
        s = bn == bb
        cin = jnp.where(s, _plookup(_CIN[bb], val, jnp), cin)
        ccode = jnp.where(s, _plookup(_COUT[bb], val, jnp), ccode)
        cbits = jnp.where(s, _plookup(_COBITS[bb], val, jnp), cbits)
    c_complete = cin == nb2

    is0 = (~isg) & (~isc)
    complete = v & ((isg & g_complete) | (isc & c_complete) | is0)
    code = jnp.where(isg, g_code, jnp.where(isc, ccode, cb))
    nbits = jnp.where(isg, g_bits, jnp.where(isc, cbits, 1))

    newk = jnp.where(isg, kz, val)
    bk = wr17(bk, bn, jnp.where(complete, 0, newk), v)
    bnb = wr17(bnb, bn, jnp.where(complete, 0, nb2), v)
    bop = wr17(bop, bn, jnp.where(complete, -1, op2), v)

    out_code = jnp.where(complete, code, 0)
    out_nbits = jnp.where(complete, nbits, 0)
    out_open = jnp.where(complete, op2, BIG)
    return (zero, total, bk, bnb, bop), out_code, out_nbits, out_open


def make_encode_lanes_pallas(L: int, chunk: int = 2048, interpret=False,
                             lanes: int = LANES):
    """Kernel factory for padded stream length L (L % chunk == 0).

    Returns fn(valid, ctx, bit) -- (L, lanes) int32 each -- producing
    (rec_code, rec_nbits, rec_open) of shape (L + 17, lanes): rows < L are
    codewords completed at that emission (nbits == 0 means none); rows
    L + b are bin b's end-of-plane flush word.  Record completion time is
    the row index (BIG for flush rows), so downstream ordering/packing is
    ops/entropy_jax2's record machinery.

    ``lanes`` may exceed the 128 native vector width: wider rows give the
    VPU multiple independent vregs per step, hiding ALU latency in the
    otherwise serial dependency chain (measured: see PERF_NOTES.md).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert L % chunk == 0 and lanes % 128 == 0
    ngrid = L // chunk

    def kernel(valid_ref, ctx_ref, bit_ref,
               code_ref, nbits_ref, open_ref, fk_ref, fnb_ref, fop_ref,
               zero_s, total_s, bk_s, bnb_s, bop_s):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            zero_s[:] = jnp.full((17, lanes), 2, jnp.int32)
            total_s[:] = jnp.full((17, lanes), 4, jnp.int32)
            bk_s[:] = jnp.zeros((17, lanes), jnp.int32)
            bnb_s[:] = jnp.zeros((17, lanes), jnp.int32)
            bop_s[:] = jnp.full((17, lanes), -1, jnp.int32)

        def body(i, state):
            v = valid_ref[i, :] != 0
            c = ctx_ref[i, :]
            b = bit_ref[i, :]
            emi = g * chunk + i
            state, oc, onb, oop = _coder_step(state, v, c, b, emi, jax, jnp,
                                              lanes)
            code_ref[i, :] = oc
            nbits_ref[i, :] = onb
            open_ref[i, :] = oop
            return state

        state = (zero_s[:], total_s[:], bk_s[:], bnb_s[:], bop_s[:])
        zero, total, bk, bnb, bop = jax.lax.fori_loop(0, chunk, body, state)
        zero_s[:] = zero
        total_s[:] = total
        bk_s[:] = bk
        bnb_s[:] = bnb
        bop_s[:] = bop

        @pl.when(g == ngrid - 1)
        def _():
            fk_ref[:] = bk
            fnb_ref[:] = bnb
            fop_ref[:] = bop

    def run_impl(valid, ctx, bit):
        code, nbits, opn, fk, fnb, fop = pl.pallas_call(
            kernel,
            grid=(ngrid,),
            out_shape=[jax.ShapeDtypeStruct((L, lanes), jnp.int32)] * 3
            + [jax.ShapeDtypeStruct((17, lanes), jnp.int32)] * 3,
            in_specs=[pl.BlockSpec((chunk, lanes), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec((chunk, lanes), lambda g: (g, 0),
                                    memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec((17, lanes), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)] * 3,
            scratch_shapes=[pltpu.VMEM((17, lanes), jnp.int32)] * 5,
            interpret=interpret,
        )(valid, ctx, bit)
        tcode, tbits = _tail_flush(fk, fnb, jnp, lanes)
        is_open = fop >= 0
        tail_code = jnp.where(is_open, tcode, 0)
        tail_nbits = jnp.where(is_open, tbits, 0)
        tail_open = jnp.where(is_open, fop, BIG)
        return (jnp.concatenate([code, tail_code]),
                jnp.concatenate([nbits, tail_nbits]),
                jnp.concatenate([opn, tail_open]))

    if interpret:
        # Eager execution on the host CPU device: avoids a (remote) device
        # compile entirely; used by the correctness tests.
        def run(valid, ctx, bit):
            with jax.default_device(jax.devices("cpu")[0]):
                return run_impl(valid, ctx, bit)
        return run
    return jax.jit(run_impl)


def make_encode_lanes_pallas_tiled(L: int, chunk: int = 2048, tile: int = 8,
                                   interpret=False):
    """Tile-granular variant of make_encode_lanes_pallas.

    Same contract, but the sequential loop moves (tile, LANES) blocks --
    one native int32 VMEM tile for tile == 8 -- per iteration: a single
    tile read of each input, ``tile`` unrolled coder steps on register
    values (static sublane indexing), and a single tile write of each
    output.  Per-step *dynamic-row* VMEM access was measured at ~1.4 us
    per read / ~1.6 us per write on v5e (PERF_NOTES.md); amortizing it
    over 8 steps removes the dominant cost of the row-at-a-time kernel.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert L % chunk == 0 and chunk % tile == 0
    ngrid = L // chunk

    def kernel(valid_ref, ctx_ref, bit_ref,
               code_ref, nbits_ref, open_ref, fk_ref, fnb_ref, fop_ref,
               zero_s, total_s, bk_s, bnb_s, bop_s):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            zero_s[:] = jnp.full((17, LANES), 2, jnp.int32)
            total_s[:] = jnp.full((17, LANES), 4, jnp.int32)
            bk_s[:] = jnp.zeros((17, LANES), jnp.int32)
            bnb_s[:] = jnp.zeros((17, LANES), jnp.int32)
            bop_s[:] = jnp.full((17, LANES), -1, jnp.int32)

        def body(t, state):
            base = t * tile
            vt = valid_ref[pl.ds(base, tile), :] != 0
            ct = ctx_ref[pl.ds(base, tile), :]
            bt = bit_ref[pl.ds(base, tile), :]
            ocs, onbs, oops = [], [], []
            for j in range(tile):
                emi = g * chunk + base + j
                state, oc, onb, oop = _coder_step(
                    state, vt[j, :], ct[j, :], bt[j, :], emi, jax, jnp)
                ocs.append(oc)
                onbs.append(onb)
                oops.append(oop)
            code_ref[pl.ds(base, tile), :] = jnp.stack(ocs)
            nbits_ref[pl.ds(base, tile), :] = jnp.stack(onbs)
            open_ref[pl.ds(base, tile), :] = jnp.stack(oops)
            return state

        state = (zero_s[:], total_s[:], bk_s[:], bnb_s[:], bop_s[:])
        zero, total, bk, bnb, bop = jax.lax.fori_loop(
            0, chunk // tile, body, state)
        zero_s[:] = zero
        total_s[:] = total
        bk_s[:] = bk
        bnb_s[:] = bnb
        bop_s[:] = bop

        @pl.when(g == ngrid - 1)
        def _():
            fk_ref[:] = bk
            fnb_ref[:] = bnb
            fop_ref[:] = bop

    def run_impl(valid, ctx, bit):
        code, nbits, opn, fk, fnb, fop = pl.pallas_call(
            kernel,
            grid=(ngrid,),
            out_shape=[jax.ShapeDtypeStruct((L, LANES), jnp.int32)] * 3
            + [jax.ShapeDtypeStruct((17, LANES), jnp.int32)] * 3,
            in_specs=[pl.BlockSpec((chunk, LANES), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec((chunk, LANES), lambda g: (g, 0),
                                    memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec((17, LANES), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)] * 3,
            scratch_shapes=[pltpu.VMEM((17, LANES), jnp.int32)] * 5,
            interpret=interpret,
        )(valid, ctx, bit)
        tcode, tbits = _tail_flush(fk, fnb, jnp)
        is_open = fop >= 0
        tail_code = jnp.where(is_open, tcode, 0)
        tail_nbits = jnp.where(is_open, tbits, 0)
        tail_open = jnp.where(is_open, fop, BIG)
        return (jnp.concatenate([code, tail_code]),
                jnp.concatenate([nbits, tail_nbits]),
                jnp.concatenate([opn, tail_open]))

    if interpret:
        def run(valid, ctx, bit):
            with jax.default_device(jax.devices("cpu")[0]):
                return run_impl(valid, ctx, bit)
        return run
    return jax.jit(run_impl)


def _tail_flush(fk, fnb, jnp, lanes=LANES):
    """End-of-plane flush codes for the (17, lanes) final bin state."""
    code = jnp.zeros((17, lanes), jnp.int32)
    bits = jnp.zeros((17, lanes), jnp.int32)
    for b in range(1, 17):
        k = fk[b]
        nb = fnb[b]
        if b >= 8:
            m, l, ii = _GOL[b]
            adj = jnp.where(k < ii, k, k + ii)
            gl = l + (k >= ii).astype(jnp.int32)
            cb = jnp.where(k == m - 1, 1, _bitrev16(adj, gl, jnp))
            bb = jnp.where(k == m - 1, 1, gl)
        else:
            fv = jnp.zeros((lanes,), jnp.int32)
            for (pv, pn), (av, an) in C.CUSTOM_FLUSH_BITS[b].items():
                fv = jnp.where((k == pv) & (nb == pn), av, fv)
            final = (k | (fv << nb)) & 31
            cb = _plookup(_COUT[b], final, jnp)
            bb = _plookup(_COBITS[b], final, jnp)
        code = code.at[b].set(cb)
        bits = bits.at[b].set(bb)
    return code, bits


# --------------------------------------------------------------------------
# Slim kernel: minimal sequential core, codeword construction deferred to XLA
# --------------------------------------------------------------------------
#
# The row-at-a-time kernel above spends most of its per-step vector ops on
# work that does NOT need to be inside the sequential dependency chain:
# golomb/custom *output code* construction (SWAR bit reversal + three
# packed-constant tables) only reads coder state, it never feeds back into
# it.  The slim variant keeps only what the recurrence needs -- counters,
# bin selection, codeword *completion* detection, bin-state update -- and
# emits compact completion records; an elementwise XLA post-pass
# (slim_records) reconstructs (code, nbits) for all records in parallel.
#
# Packing (all int32):
#   input   word: valid | ctx<<1 | bit<<6
#   zt     state: total | zero<<16                  (both <= 500)
#   bs     state: (open_emission+1) | k<<17 | nb<<27   (0 => bin closed;
#            k <= 511 golomb run / custom prefix, nb <= 4 prefix length,
#            so stream length L must stay < 2**17)
#   record out1: complete | bin<<1 | k<<6 | cb<<16 | nb<<17
#   record out2: opening emission index (BIG when no completion)

# eviction side-buffer depth per lane: real content measures <= 6
# mid-plane circular-buffer evictions per (noisy LSB) lane; lanes that
# somehow exceed the depth raise the flush flag and take the exact host
# fallback, so the bound is a fast path, not a correctness limit.
_NEV = 32

# per-(bin, prefix_len) completion masks: bit v of _CMPL[b][n] set iff the
# length-n prefix with value v completes a codeword of custom bin b.
_CMPL = {
    b: [sum((1 << v) for v in range(32)
            if int(C.CUSTOM_IN_BITS[b, v]) == n) for n in range(6)]
    for b in range(1, 8)
}


def _evict_flush_code(bs, amin, jax, jnp, lanes):
    """Flush-complete the open codeword with allocation ordinal ``amin``.

    The reference's circular-buffer eviction (icer_encoding.c:59-64 ->
    icer_flush_encode 141-189) force-completes the OLDEST pending word --
    always the oldest OPEN codeword -- using the same per-bin flush rules
    as the end-of-plane drain (_tail_flush).  Returns (code, nbits) of
    the evicted codeword, valid on lanes where some bin's ordinal
    matches ``amin``."""
    ek = jnp.zeros((lanes,), jnp.int32)
    enb = jnp.zeros((lanes,), jnp.int32)
    ebin = jnp.zeros((lanes,), jnp.int32)
    for q in range(1, 17):
        ise = (bs[q, :] & 0x1FFFF) == amin + 1
        ek = jnp.where(ise, (bs[q, :] >> 17) & 1023, ek)
        enb = jnp.where(ise, bs[q, :] >> 27, enb)
        ebin = jnp.where(ise, q, ebin)
    # golomb bins: k == m-1 flushes to the full-run '1'; else the
    # bit-reversed partial-run code (icer_encoding.c:155-166)
    m_e = jnp.ones((lanes,), jnp.int32)
    l_e = jnp.ones((lanes,), jnp.int32)
    i_e = jnp.zeros((lanes,), jnp.int32)
    for gb in range(8, 17):
        m, l, ii = _GOL[gb]
        s = ebin == gb
        m_e = jnp.where(s, m, m_e)
        l_e = jnp.where(s, l, l_e)
        i_e = jnp.where(s, ii, i_e)
    adj = jnp.where(ek < i_e, ek, ek + i_e)
    gl = l_e + (ek >= i_e).astype(jnp.int32)
    gcode = jnp.where(ek == m_e - 1, 1, _bitrev16(adj, gl, jnp))
    gbits = jnp.where(ek == m_e - 1, 1, gl)
    # custom bins: append the flush bits, then the output LUT
    # (icer_encoding.c:168-181).  NOTE the flush rules live in four
    # packings (here, _tail_flush, the fused do_evict in _slim_step,
    # and slim_sort_operand_packed's tail loop) -- a rule change must
    # touch all four; each is pinned by the eviction/flush tests.
    ccode = jnp.zeros((lanes,), jnp.int32)
    cbits = jnp.zeros((lanes,), jnp.int32)
    for b in range(1, 8):
        s = ebin == b
        fb = jnp.zeros((lanes,), jnp.int32)
        for (pv, pn), (av, an) in C.CUSTOM_FLUSH_BITS[b].items():
            fb = jnp.where((ek == pv) & (enb == pn), av, fb)
        final = (ek | (fb << enb)) & 31
        ccode = jnp.where(s, _plookup(_COUT[b], final, jnp), ccode)
        cbits = jnp.where(s, _plookup(_COBITS[b], final, jnp), cbits)
    code = jnp.where(ebin >= 8, gcode, ccode)
    nbits = jnp.where(ebin >= 8, gbits, cbits)
    return code, nbits, ebin


# fused-key record packing (see _slim_step): one int32 carries both the
# ordering-sort key and the class-packed record, so the ordering sort is
# a single-operand unstable sort and the kernel writes ONE record word
# per step.  Layout (non-negative: key's top bit is int32 bit 30):
#   [30:16] allocation-ordinal key (BIG15 = no record -> sorts last)
#   [15:11] bin
#   golomb bins:  [10:1] k, [0] cb
#   custom bins:  [10:6] k (prefix value), [5:3] nb, [0] cb
#   uncoded bin:  [0] cb
# Flush completions need NO marker: a golomb flush is identical to a
# completion with (k, cb=1) -- or (m-1, cb=0) for the full-run case --
# and a custom flush is a completion whose k is the flush-bit-extended
# final prefix VALUE with nb=cb=0 (the output LUT is value-keyed).
BIG15 = 0x7FFF
BIGPK = BIG15 << 16


def _slim_step(state, w, jax, jnp, lanes, fused_key=False):
    """One emission step of the slim coder.
    state = (zt, bs, alloc, flg, ec).

    ``alloc`` is the per-lane codeword allocation counter; bin state
    carries each open codeword's allocation index (+1), so completion
    records emit their output position directly and the mid-plane
    circular-buffer eviction (icer_encoding.c:59-64 / sequential.py
    ``used >= buffer_length``: allocating while the oldest un-popped
    codeword is CIRC_BUF_SIZE allocations behind) is HANDLED in-kernel --
    the oldest un-popped codeword is always the oldest OPEN one, a
    17-way min over the bin states; its flush-completed record is
    returned for the caller's bounded side buffer (``ec`` counts
    eviction records; past the buffer depth the lane sets ``flg`` and
    falls back to the exact host path).

    With ``fused_key`` (stream length + tail rows < 2**15) the return is
    (state, out, ev, eout) with out/eout single fused-key record words;
    otherwise (state, out1, out2, ev, eo1, eo2) as two-word records.
    """
    zt, bs, alloc, flg, ec = state
    iota17 = jax.lax.broadcasted_iota(jnp.int32, (17, lanes), 0)

    # The kernel runs at 2048-3456 lanes where it is THROUGHPUT-bound
    # (cost/step is affine in width, PERF_NOTES round-4), so state reads
    # use binary where-trees over the 17 rows (~21 (1, lanes) ops) in
    # place of 17-step equality chains (~34), and constant tables ride
    # select trees instead of full scans.  All bit-exact: golden-sha
    # pinned on chip, interpret-mode differential tests off chip.
    def sel17(st, cc):
        b0 = (cc & 1) != 0
        b1 = (cc & 2) != 0
        b2 = (cc & 4) != 0
        b3 = (cc & 8) != 0
        p = [jnp.where(b0, st[2 * k + 1, :], st[2 * k, :])
             for k in range(8)]
        q = [jnp.where(b1, p[2 * k + 1], p[2 * k]) for k in range(4)]
        r = [jnp.where(b2, q[2 * k + 1], q[2 * k]) for k in range(2)]
        s = jnp.where(b3, r[1], r[0])
        # rows past 16 alias to row 16 (the old chain defaulted to 0);
        # every caller masks out-of-range indices either way
        return jnp.where(cc >= 16, st[16, :], s)

    def wr17(st, cc, vals, mask):
        # fold the write mask into the row index (row 31 matches nothing)
        cc2 = jnp.where(mask, cc, 31)
        return jnp.where(iota17 == cc2[None, :], vals[None, :], st)

    v = (w & 1) != 0
    c = (w >> 1) & 31
    b = (w >> 6) & 1

    # ---- counters & bin -------------------------------------------------
    ztc = sel17(zt, c)
    tc = ztc & 0xFFFF
    zc = ztc >> 16
    unc = c >= 17
    zcu = jnp.where(unc, 1, zc)
    tcu = jnp.where(unc, 2, tc)
    inv = zcu < (tcu >> 1)
    zeff = jnp.where(inv, tcu - zcu, zcu)
    cb = (b ^ inv).astype(jnp.int32)

    comp = zeff << 16
    # 4-test binary search over the constant cutoff ladder + a direct
    # bn=16 test (see ops/pallas_decode decode_bit for the derivation)
    t3 = comp >= tcu * _CUT[7]
    c4v = jnp.where(t3, _CUT[11], _CUT[3])
    t2 = comp >= tcu * c4v
    c2v = jnp.where(t3, jnp.where(t2, _CUT[13], _CUT[9]),
                    jnp.where(t2, _CUT[5], _CUT[1]))
    t1 = comp >= tcu * c2v
    c1v = jnp.where(
        t3,
        jnp.where(t2, jnp.where(t1, _CUT[14], _CUT[12]),
                  jnp.where(t1, _CUT[10], _CUT[8])),
        jnp.where(t2, jnp.where(t1, _CUT[6], _CUT[4]),
                  jnp.where(t1, _CUT[2], _CUT[0])))
    t0 = comp >= tcu * c1v
    bn = ((t3.astype(jnp.int32) << 3) | (t2.astype(jnp.int32) << 2)
          | (t1.astype(jnp.int32) << 1) | t0.astype(jnp.int32))
    bn = jnp.where(comp >= tcu * _CUT[15], 16, bn)

    tc2 = tc + 1
    zc2 = zc + (b == 0)
    resc = tc2 >= C.CONTEXT_RESCALING_CAP
    tc2 = jnp.where(resc, tc2 >> 1, tc2)
    zc2 = jnp.where(resc & (zc2 > tc2), zc2 >> 1, zc2)
    zt = wr17(zt, c, tc2 | (zc2 << 16), v & (~unc))

    # ---- bin state ------------------------------------------------------
    bsb = sel17(bs, bn)
    op1 = bsb & 0x1FFFF
    k = (bsb >> 17) & 1023
    nb = bsb >> 27
    newly = op1 == 0
    opening = v & newly
    # eviction check at allocation time: oldest open codeword
    # CIRC_BUF_SIZE allocations behind the new one (used == buffer_length
    # in icer_encoding.c:200-206 alloc_buf)
    amin = jnp.full((lanes,), BIG, jnp.int32)
    for q in range(17):
        opq = bs[q, :] & 0x1FFFF
        amin = jnp.minimum(amin, jnp.where(opq > 0, opq - 1, BIG))
    ev = opening & (amin + C.CIRC_BUF_SIZE <= alloc)

    if fused_key:
        def do_evict(_):
            ek = jnp.zeros((lanes,), jnp.int32)
            enb = jnp.zeros((lanes,), jnp.int32)
            ebin = jnp.zeros((lanes,), jnp.int32)
            for q in range(1, 17):
                ise = (bs[q, :] & 0x1FFFF) == amin + 1
                ek = jnp.where(ise, (bs[q, :] >> 17) & 1023, ek)
                enb = jnp.where(ise, bs[q, :] >> 27, enb)
                ebin = jnp.where(ise, q, ebin)
            # golomb flush == completion with (k, cb=1), or the full run
            # (m-1, cb=0); custom flush == completion whose k is the
            # flush-extended final prefix value with nb = cb = 0
            em = jnp.ones((lanes,), jnp.int32)
            for gb in range(8, 17):
                em = jnp.where(ebin == gb, _GOL[gb][0], em)
            gpl = (ebin << 11) | (ek << 1) | jnp.where(ek == em - 1, 0, 1)
            fvv = jnp.zeros((lanes,), jnp.int32)
            for b_ in range(1, 8):
                fb = jnp.zeros((lanes,), jnp.int32)
                for (pv, pn), (av, an) in C.CUSTOM_FLUSH_BITS[b_].items():
                    fb = jnp.where((ek == pv) & (enb == pn), av, fb)
                fvv = jnp.where(ebin == b_, fb, fvv)
            final = (ek | (fvv << enb)) & 31
            cpl = (ebin << 11) | (final << 6)
            pl = jnp.where(ebin >= 8, gpl, cpl)
            eo = jnp.where(ev, (amin << 16) | pl, BIGPK)
            iota = jax.lax.broadcasted_iota(jnp.int32, (17, lanes), 0)
            bs2 = jnp.where((iota == ebin[None, :]) & ev[None, :], 0, bs)
            return eo, bs2

        # evictions are rare (a handful per noisy lane); the scalar cond
        # skips the flush-pack construction on non-evicting steps
        eout, bs = jax.lax.cond(
            jnp.any(ev), do_evict,
            lambda _: (jnp.full((lanes,), BIGPK, jnp.int32), bs), 0)
    else:
        def do_evict(_):
            ecode, ebits, ebin = _evict_flush_code(bs, amin, jax, jnp,
                                                   lanes)
            # pre-reconstructed (tail-marker) record + evicted-row clear
            eo1 = jnp.where(ev,
                            1 | (ecode << 1) | (ebits << 17) | (1 << 22),
                            0)
            iota = jax.lax.broadcasted_iota(jnp.int32, (17, lanes), 0)
            bs2 = jnp.where((iota == ebin[None, :]) & ev[None, :], 0, bs)
            return eo1, bs2

        # evictions are rare (a handful per noisy lane); the scalar cond
        # skips the ~150-op flush-code construction on non-evicting steps
        eo1, bs = jax.lax.cond(
            jnp.any(ev), do_evict,
            lambda _: (jnp.zeros((lanes,), jnp.int32), bs), 0)
        eo2 = jnp.where(ev, amin, BIG)
    flg = flg | (ev & (ec >= _NEV)).astype(jnp.int32)
    ec = ec + ev.astype(jnp.int32)
    op1 = jnp.where(newly, alloc + 1, op1)
    alloc = alloc + opening.astype(jnp.int32)
    k = jnp.where(newly, 0, k)
    nb = jnp.where(newly, 0, nb)

    isg = bn >= 8
    isc = (bn >= 1) & (bn <= 7)

    # golomb m via a 3-level constant tree over bins 8..15 (+ the bin-16
    # leaf); values for bn < 8 are garbage masked by isg below (the old
    # 9-step scan defaulted them to 1, equally unused)
    g0 = (bn & 1) != 0
    g1 = (bn & 2) != 0
    g2 = (bn & 4) != 0
    m_e = jnp.where(
        g2, jnp.where(g1, jnp.where(g0, _GOL[15][0], _GOL[14][0]),
                      jnp.where(g0, _GOL[13][0], _GOL[12][0])),
        jnp.where(g1, jnp.where(g0, _GOL[11][0], _GOL[10][0]),
                  jnp.where(g0, _GOL[9][0], _GOL[8][0])))
    m_e = jnp.where(bn >= 16, _GOL[16][0], m_e)
    kz = k + (cb == 0)
    g_complete = (cb == 1) | (kz >= m_e)

    val = (k | (cb << nb)) & 31
    nb2 = nb + 1
    # completion-mask table (bn 1..7 x nb2 1..5) via shared-bit constant
    # select trees (~40 ops) instead of the 35-iteration masked scan
    # (~110): custom bins always carry nb <= 4, and non-custom lanes'
    # garbage is masked by isc in `complete`
    n0 = (nb2 & 1) != 0
    n1 = (nb2 & 2) != 0
    n2 = (nb2 & 4) != 0

    def _cm5(bb):
        v1, v2, v3, v4, v5 = (_CMPL[bb][n] for n in range(1, 6))
        return jnp.where(n2, jnp.where(n0, v5, v4),
                         jnp.where(n1, jnp.where(n0, v3, v2), v1))

    cm = [_cm5(bb) for bb in range(1, 8)]
    cmask = jnp.where(
        g2, jnp.where(g1, jnp.where(g0, cm[6], cm[5]),
                      jnp.where(g0, cm[4], cm[3])),
        jnp.where(g1, jnp.where(g0, cm[2], cm[1]), cm[0]))
    c_complete = ((cmask >> val) & 1) != 0

    is0 = (~isg) & (~isc)
    complete = v & ((isg & g_complete) | (isc & c_complete) | is0)
    newk = jnp.where(isg, kz, val)
    bs = wr17(bs, bn,
              jnp.where(complete, 0, op1 | (newk << 17) | (nb2 << 27)), v)

    if fused_key:
        gpl = (bn << 11) | (k << 1) | cb
        cpl = (bn << 11) | (k << 6) | ((nb & 7) << 3) | cb
        pl = jnp.where(isg, gpl, jnp.where(isc, cpl, cb))
        out = jnp.where(complete, ((op1 - 1) << 16) | pl, BIGPK)
        return (zt, bs, alloc, flg, ec), out, ev, eout
    # nb is only meaningful for custom bins (<= 4); golomb bins keep
    # incrementing it through long runs, so mask to the 3-bit field --
    # unmasked it would overflow into the tail-marker bit the ordering
    # sort operand reserves (bit 22, slim_sort_operands)
    out1 = jnp.where(
        complete,
        1 | (bn << 1) | (k << 6) | (cb << 16) | ((nb & 7) << 17),
        0)
    out2 = jnp.where(complete, op1 - 1, BIG)
    return (zt, bs, alloc, flg, ec), out1, out2, ev, eo1, eo2


def make_encode_lanes_slim(L: int, chunk: int = 512, interpret=False,
                           lanes: int = LANES, fused_key=None):
    """Slim-kernel factory.

    packed input: (L, lanes) int32 emission words (valid|ctx<<1|bit<<6).

    Fused-key mode (default whenever L + 17 + _NEV < 2**15, i.e. every
    512-class bucket): fn(packed) -> (rec, fstate, misc, ev) where rec
    (L, lanes) and ev (_NEV, lanes) are single fused-key record words
    (see BIG15 packing table above) -- ONE record write per step and a
    single-operand ordering sort downstream.  Feed rec/fstate/ev to
    slim_sort_operand_packed().

    Legacy mode (fused_key=False, required for lanes longer than 15-bit
    keys): fn(packed) -> (rec1, rec2, fstate, misc, ev1, ev2) with rec2
    the allocation-index key (BIG when no completion); feed to
    slim_sort_operands().

    fstate: (17, lanes) final packed bin state for the end-of-plane
    flush; misc: (8, lanes) with row 0 = fallback flag (eviction
    side-buffer overflow: lane needs the exact host path), row 1 = total
    codewords allocated, row 2 = eviction count.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert L % chunk == 0 and lanes % 128 == 0 and L < (1 << 17)
    if fused_key is None:
        fused_key = L + 17 + _NEV < (1 << 15)
    assert not fused_key or L + 17 + _NEV < (1 << 15)
    ngrid = L // chunk

    def kernel(in_ref, *refs):
        if fused_key:
            (rc_ref, fs_ref, mo_ref, ev_ref,
             zt_s, bs_s, ms_s, e1_s) = refs
        else:
            (r1_ref, r2_ref, fs_ref, mo_ref, ev1_ref, ev2_ref,
             zt_s, bs_s, ms_s, e1_s, e2_s) = refs
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            zt_s[:] = jnp.full((17, lanes), 4 | (2 << 16), jnp.int32)
            bs_s[:] = jnp.zeros((17, lanes), jnp.int32)
            ms_s[:] = jnp.zeros((8, lanes), jnp.int32)
            if fused_key:
                e1_s[:] = jnp.full((_NEV, lanes), BIGPK, jnp.int32)
            else:
                e1_s[:] = jnp.zeros((_NEV, lanes), jnp.int32)
                e2_s[:] = jnp.full((_NEV, lanes), BIG, jnp.int32)

        iota_ev = jax.lax.broadcasted_iota(jnp.int32, (_NEV, lanes), 0)

        def body(i, state):
            w = in_ref[i, :]
            if fused_key:
                state, out, ev, eout = _slim_step(state, w, jax, jnp,
                                                  lanes, fused_key=True)
                rc_ref[i, :] = out
            else:
                state, o1, o2, ev, eout, eo2 = _slim_step(state, w, jax,
                                                          jnp, lanes)
                r1_ref[i, :] = o1
                r2_ref[i, :] = o2

            # bounded eviction side rows (rare: guarded store)
            @pl.when(jnp.any(ev))
            def _():
                idx = state[4] - ev.astype(jnp.int32)  # pre-step count
                wm = (iota_ev == idx[None, :]) & ev[None, :]
                e1_s[:] = jnp.where(wm, eout[None, :], e1_s[:])
                if not fused_key:
                    e2_s[:] = jnp.where(wm, eo2[None, :], e2_s[:])

            return state

        state = (zt_s[:], bs_s[:], ms_s[1, :], ms_s[0, :], ms_s[2, :])
        zt, bs, alloc, flg, ec = jax.lax.fori_loop(0, chunk, body, state)
        zt_s[:] = zt
        bs_s[:] = bs
        ms_s[0, :] = flg
        ms_s[1, :] = alloc
        ms_s[2, :] = ec

        @pl.when(g == ngrid - 1)
        def _():
            fs_ref[:] = bs
            mo_ref[:] = ms_s[:]
            if fused_key:
                ev_ref[:] = e1_s[:]
            else:
                ev1_ref[:] = e1_s[:]
                ev2_ref[:] = e2_s[:]

    n_rec = 1 if fused_key else 2
    n_ev = 1 if fused_key else 2

    def run_impl(packed):
        outs = pl.pallas_call(
            kernel,
            grid=(ngrid,),
            out_shape=[jax.ShapeDtypeStruct((L, lanes), jnp.int32)] * n_rec
            + [jax.ShapeDtypeStruct((17, lanes), jnp.int32),
               jax.ShapeDtypeStruct((8, lanes), jnp.int32)]
            + [jax.ShapeDtypeStruct((_NEV, lanes), jnp.int32)] * n_ev,
            in_specs=[pl.BlockSpec((chunk, lanes), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((chunk, lanes), lambda g: (g, 0),
                                    memory_space=pltpu.VMEM)] * n_rec
            + [pl.BlockSpec((17, lanes), lambda g: (0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((8, lanes), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((_NEV, lanes), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)] * n_ev,
            scratch_shapes=[pltpu.VMEM((17, lanes), jnp.int32)] * 2
            + [pltpu.VMEM((8, lanes), jnp.int32)]
            + [pltpu.VMEM((_NEV, lanes), jnp.int32)] * n_ev,
            interpret=interpret,
        )(packed)
        return tuple(outs)

    if interpret:
        def run(packed):
            with jax.default_device(jax.devices("cpu")[0]):
                return run_impl(packed)
    else:
        jitted = jax.jit(run_impl)

        def run(packed):
            return jitted(packed)
    run.fused_key = fused_key
    return run


def pack_emissions(valid, ctx, bit, xp):
    """(…, L) valid/ctx/bit -> packed int32 emission words."""
    return (valid.astype(xp.int32)
            | (ctx.astype(xp.int32) << 1)
            | (bit.astype(xp.int32) << 6))


def slim_sort_operands(r1, r2, fstate, jnp, ev1=None, ev2=None):
    """Slim kernel outputs -> (ops, keys) for the ordering sort.

    Main rows carry the RAW packed r1 record (codeword reconstruction is
    deferred until after the sort + record-prefix slice, so it runs over
    ~25% fewer rows); the 17 end-of-plane flush rows are pre-reconstructed
    from the final bin state (their codes come from the flush tables) and
    marked with bit 22: 1 | code<<1 | nbits<<17 | 1<<22.  The optional
    (_NEV, lanes) ``ev1``/``ev2`` mid-plane eviction rows arrive already
    in that (op, key) form from the kernel and ride along unchanged.
    Keys are allocation indices, BIG for rows without a completion.
    """
    fop1 = fstate & 0x1FFFF
    fk = (fstate >> 17) & 1023
    fnb = fstate >> 27
    tcode, tbits = _tail_flush(fk, fnb, jnp, fstate.shape[-1])
    is_open = fop1 > 0
    tail_op = jnp.where(is_open,
                        1 | (tcode << 1) | (tbits << 17) | (1 << 22), 0)
    tail_key = jnp.where(is_open, fop1 - 1, BIG)
    ops = [r1, tail_op] + ([ev1] if ev1 is not None else [])
    keys = [r2, tail_key] + ([ev2] if ev2 is not None else [])
    return jnp.concatenate(ops), jnp.concatenate(keys)


def slim_sort_operand_packed(rec, fstate, ev, jnp):
    """Fused-key kernel outputs -> ONE (L+17+_NEV, lanes) sort operand.

    Appends the 17 end-of-plane flush rows in fused-key record form
    (golomb flush == completion with (k, cb=1) / full-run (m-1, cb=0);
    custom flush == completion whose k is the flush-extended final
    prefix value, nb = cb = 0 -- no marker bit needed, the post-sort
    reconstruction treats them as ordinary completions) and the kernel's
    eviction side rows, which are already in that form."""
    lanes = fstate.shape[-1]
    fop1 = fstate & 0x1FFFF
    fk = (fstate >> 17) & 1023
    fnb = fstate >> 27
    tail = jnp.full((17, lanes), BIGPK, jnp.int32)
    for b in range(1, 17):
        k = fk[b]
        nb = fnb[b]
        if b >= 8:
            m = _GOL[b][0]
            pl = (b << 11) | (k << 1) | jnp.where(k == m - 1, 0, 1)
        else:
            fv = jnp.zeros((lanes,), jnp.int32)
            for (pv, pn), (av, an) in C.CUSTOM_FLUSH_BITS[b].items():
                fv = jnp.where((k == pv) & (nb == pn), av, fv)
            final = (k | (fv << nb)) & 31
            pl = (b << 11) | (final << 6)
        row = jnp.where(fop1[b] > 0, ((fop1[b] - 1) << 16) | pl, BIGPK)
        tail = tail.at[b].set(row)
    return jnp.concatenate([rec, tail, ev])


def slim_decode_packed(w, xp):
    """Post-sort reconstruction of fused-key records -> (code, nbits).

    Same math as slim_decode_op over the fused-key field layout; flush
    rows decode as ordinary completions (see slim_sort_operand_packed).
    Rows must be masked by the caller's record-valid flags."""
    bn = (w >> 11) & 31
    isg = bn >= 8
    isc = (bn >= 1) & (bn <= 7)
    k = xp.where(isg, (w >> 1) & 1023, (w >> 6) & 31)
    cb = w & 1
    nb = xp.where(isc, (w >> 3) & 7, 0)

    m_e = xp.ones(bn.shape, xp.int32)
    l_e = xp.ones(bn.shape, xp.int32)
    i_e = xp.zeros(bn.shape, xp.int32)
    for gb in range(8, 17):
        m, l, ii = _GOL[gb]
        m_e = xp.where(bn == gb, m, m_e)
        l_e = xp.where(bn == gb, l, l_e)
        i_e = xp.where(bn == gb, ii, i_e)
    kz = k + (cb == 0)
    g_run_done = (cb == 0) & (kz >= m_e)
    adj = xp.where(k < i_e, k, k + i_e)
    gl = l_e + (k >= i_e)
    g_code = xp.where(g_run_done, 1, _bitrev16(adj, gl, xp))
    g_bits = xp.where(g_run_done, 1, gl)

    val = (k | (cb << nb)) & 31
    ccode = xp.zeros(bn.shape, xp.int32)
    cbits = xp.zeros(bn.shape, xp.int32)
    for bb in range(1, 8):
        s = bn == bb
        ccode = xp.where(s, _plookup(_COUT[bb], val, xp), ccode)
        cbits = xp.where(s, _plookup(_COBITS[bb], val, xp), cbits)

    code = xp.where(isg, g_code, xp.where(isc, ccode, cb))
    nbits = xp.where(isg, g_bits, xp.where(isc, cbits, 1))
    return code, nbits


def order_and_pack_lane_packed(ops, xp, max_bits=None, slice_to=None,
                               return_words=False):
    """One fused-key record lane -> (payload, total bits, overflow flag).

    The ordering sort is a SINGLE-operand unstable sort (the key rides
    bits 30:16 of the record word; BIG15 rows sort last in some order,
    which is immaterial -- they're masked).  Codeword reconstruction
    runs on the sliced sorted prefix, like order_and_pack_lane_slim."""
    from . import entropy_jax2 as E2

    if xp is np:
        s = np.sort(ops, axis=-1)
    else:
        s = xp.sort(ops, axis=-1, stable=False)
    skey = xp.right_shift(s, 16) & BIG15 if xp is np else (s >> 16)
    over = xp.zeros((), dtype=bool)
    if slice_to is not None and slice_to < s.shape[-1]:
        over = skey[slice_to] != BIG15
        skey = skey[:slice_to]
        s = s[:slice_to]
    rv = skey != BIG15
    c2, n2 = slim_decode_packed(s, xp)
    payload, total, over2 = E2.pack_records_tree(c2, n2, rv, xp,
                                                 max_bits=max_bits,
                                                 with_overflow=True,
                                                 return_words=return_words)
    return payload, total, over | over2


def slim_decode_op(p2, xp):
    """Post-sort reconstruction: packed record operand -> (code, nbits).

    Regular records rebuild their golomb/custom output bits from
    (bin, k, cb, nb); bit-22-marked tail rows carry their code/nbits
    inline (see slim_sort_operands).  Rows must be masked by the caller's
    record-valid flags (invalid rows decode to garbage).
    """
    bn = (p2 >> 1) & 31
    k = (p2 >> 6) & 1023
    cb = (p2 >> 16) & 1
    nb = (p2 >> 17) & 7

    isg = bn >= 8
    isc = (bn >= 1) & (bn <= 7)
    m_e = xp.ones(bn.shape, xp.int32)
    l_e = xp.ones(bn.shape, xp.int32)
    i_e = xp.zeros(bn.shape, xp.int32)
    for gb in range(8, 17):
        m, l, ii = _GOL[gb]
        m_e = xp.where(bn == gb, m, m_e)
        l_e = xp.where(bn == gb, l, l_e)
        i_e = xp.where(bn == gb, ii, i_e)
    kz = k + (cb == 0)
    g_run_done = (cb == 0) & (kz >= m_e)
    adj = xp.where(k < i_e, k, k + i_e)
    gl = l_e + (k >= i_e)
    g_code = xp.where(g_run_done, 1, _bitrev16(adj, gl, xp))
    g_bits = xp.where(g_run_done, 1, gl)

    val = (k | (cb << nb)) & 31
    ccode = xp.zeros(bn.shape, xp.int32)
    cbits = xp.zeros(bn.shape, xp.int32)
    for bb in range(1, 8):
        s = bn == bb
        ccode = xp.where(s, _plookup(_COUT[bb], val, xp), ccode)
        cbits = xp.where(s, _plookup(_COBITS[bb], val, xp), cbits)

    code = xp.where(isg, g_code, xp.where(isc, ccode, cb))
    nbits = xp.where(isg, g_bits, xp.where(isc, cbits, 1))
    istail = ((p2 >> 22) & 1) != 0
    code = xp.where(istail, (p2 >> 1) & 0xFFFF, code)
    nbits = xp.where(istail, (p2 >> 17) & 31, nbits)
    return code, nbits


def order_and_pack_lane_slim(ops, keys, xp, max_bits=None,
                             slice_to=None, return_words=False):
    """One slim-record lane -> (payload, total bits, overflow flag).

    ``ops``/``keys`` from slim_sort_operands: records carry their
    allocation index (tracked in-kernel), so ordering is ONE unstable
    sort with a single packed operand (keys are unique; tied BIG rows
    are masked out); codeword reconstruction runs on the sliced sorted
    prefix.  The mid-plane buffer-flush condition is detected in-kernel
    and is NOT part of the returned flag (callers OR in the kernel's
    misc row).  ``slice_to`` bounds the record count fed to the packer:
    the sort compacts valid records to a prefix, so lanes with more
    records (records <= valid emissions, so this is never more
    restrictive than the former compaction margin) just raise the
    overflow flag and re-encode on host.
    """
    from . import entropy_jax2 as E2

    skey, (p2,) = E2._sort_by(keys, (ops,), xp, stable=False)
    over = xp.zeros((), dtype=bool)
    if slice_to is not None and slice_to < skey.shape[-1]:
        over = skey[slice_to] != BIG
        skey = skey[:slice_to]
        p2 = p2[:slice_to]
    rv = skey != BIG
    c2, n2 = slim_decode_op(p2, xp)
    payload, total, over2 = E2.pack_records_tree(c2, n2, rv, xp,
                                                 max_bits=max_bits,
                                                 with_overflow=True,
                                                 return_words=return_words)
    return payload, total, over | over2


def order_and_pack_lane(code, nbits, opn, done, xp, max_bits=None,
                        return_words=False):
    """One lane's record stream -> (payload bytes, total bits, flush flag).

    The sort-centric ordering/packing stages of ops/entropy_jax2 applied
    to a kernel record stream: order by opening emission (output order ==
    codeword allocation order, icer_encoding.c:114-139), detect the
    CIRC_BUF flush condition, pack.  ``done`` is each record row's
    completion index (row index for in-stream rows, BIG for flush rows).
    ``max_bits`` caps the packed payload; payload-cap overflow folds into
    the flush flag (both mean "host re-encodes this lane").
    """
    from . import entropy_jax2 as E2

    rec_valid = nbits > 0
    rkey = xp.where(rec_valid, opn, BIG)
    # one packed operand (code 16b | nbits 5b); validity from the key
    packed = (code & 0xFFFF) | (nbits << 16)
    skey, (p2, d2) = E2._sort_by(rkey, (packed, done), xp)
    rv = skey != BIG
    c2 = p2 & 0xFFFF
    n2 = (p2 >> 16) & 31
    flush = E2.detect_flush_records(skey, d2, rv, xp)
    payload, total, over = E2.pack_records_tree(c2, n2, rv, xp,
                                                max_bits=max_bits,
                                                with_overflow=True,
                                                return_words=return_words)
    return payload, total, flush | over


def encode_lanes_pallas_full(valid, ctx, bit, run=None, host_post=False):
    """Full encode of (L, LANES) emission streams via the kernel + the
    sort-centric ordering/packing stages.  Returns per-lane
    (payloads uint8 (LANES, max_bytes), totals, flush_flags).

    host_post=True runs the record ordering/packing in numpy (useful in
    tests: avoids a device compile for the post stages).
    """
    import jax
    import jax.numpy as jnp
    from . import entropy_jax2 as E2

    L = valid.shape[0]
    if run is None:
        run = make_encode_lanes_pallas(L)
    code, nbits, opn = run(valid, ctx, bit)

    per_lane = order_and_pack_lane

    if host_post:
        code, nbits, opn = (np.asarray(code), np.asarray(nbits),
                            np.asarray(opn))
        rowidx = np.arange(code.shape[0])
        done = np.where(rowidx < L, rowidx, BIG)
        payloads, totals, flushes = [], [], []
        for lane in range(code.shape[1]):
            p, t, f = per_lane(code[:, lane], nbits[:, lane], opn[:, lane],
                               done, np)
            payloads.append(p)
            totals.append(int(t))
            flushes.append(bool(f))
        return np.stack(payloads), np.array(totals), np.array(flushes)

    rowidx = jnp.arange(code.shape[0])
    doneT = jnp.broadcast_to(jnp.where(rowidx < L, rowidx, BIG)[None, :],
                             code.T.shape)
    f = jax.jit(jax.vmap(lambda c, n, o, d: per_lane(c, n, o, d, jnp)))
    return f(code.T, nbits.T, opn.T, doneT)
