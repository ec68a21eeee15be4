"""Lane-batched (TPU-architecture) grayscale decode orchestration.

Mirrors models/grayscale.decompress but runs the bitplane decoding as
lock-step lane rounds over all segments (the batched-decoder execution
model: round t decodes every segment's t-th-from-MSB plane), instead of
the per-segment thread pool.  Backends:

  * "model": the validated numpy lane machine (ops/decode_lanes) -- used
    for end-to-end differential testing of the orchestration;
  * "pallas": the TPU kernel (ops/pallas_decode), ONE call per bucket
    (the multi-round gridded kernel decodes all plane rounds on-chip,
    with lane retirement carried across rounds).

Segments are bucketed by subband geometry so lanes in a bucket share
(Hmax, Wmax) padding; each bucket independently walks its plane rounds.
A lane leaves the active set at its first missing plane or stream error,
exactly like the reference's per-segment loop (icer_partition.c:206-221).

Entry points: decompress_lanes (grayscale), decompress_yuv_lanes (color),
decompress_lanes_batch (multi-image serving mode: lanes from B
same-geometry streams share the 128-lane kernel blocks in one fused
device program).
"""

from __future__ import annotations

import os

import numpy as np

from ..core.header import scan_bytestream
from ..core.partition import partition_segments
from ..core.status import IcerError, IcerStatus
from ..core.subbands import decode_subband_order, dim_low, subband_view
from ..ops import decode_lanes as DL
from ..ops import wavelet
from .grayscale import (CodecConfig, _bitplanes, _mag_bits,
                        inverse_transform)


def _plan_lanes(w, h, config):
    """Per-segment lane records grouped into equal-geometry buckets."""
    buckets = {}
    for (stage, subband) in decode_subband_order(config.stages):
        view = subband_view(w, h, stage, subband)
        rects = partition_segments(view.w, view.h, config.segments)
        key = (view.w, view.h)
        b = buckets.setdefault(key, [])
        for rect in rects:
            b.append({
                "stage": stage, "subband": subband, "seg": rect.index,
                "row": view.row + rect.row, "col": view.col + rect.col,
                "h": rect.h, "w": rect.w,
            })
    return list(buckets.values())


def reconstruct_channel_lanes(img: np.ndarray, table: dict, chan: int,
                              config: CodecConfig, mag_bits: int,
                              bitplanes: int, stream: bytes,
                              backend: str = "model") -> None:
    """Decode all subbands of one channel via lane rounds, in place."""
    h, w = img.shape
    sdata = np.frombuffer(stream, np.uint8)
    pending = []  # (seg, lanes, prepared) for the fused pallas path
    for lanes in _plan_lanes(w, h, config):
        n = len(lanes)
        Hmax = max(t["h"] for t in lanes)
        Wmax = max(t["w"] for t in lanes)
        seg = np.zeros((Hmax, Wmax, n), np.int32)
        hh = np.array([t["h"] for t in lanes], np.int32)
        ww = np.array([t["w"] for t in lanes], np.int32)
        sb = np.array([t["subband"] for t in lanes], np.int32)
        alive = np.ones(n, bool)
        # Per-round payload-window sizes (the fused gather fetches only
        # each round's worst-case window; see _prep_bucket).
        per_round = []
        round_maxb = []
        for rnd in range(bitplanes):
            lsb = bitplanes - 1 - rnd
            offs = np.full(n, -1, np.int64)
            ebits = np.zeros(n, np.int64)
            for i, t in enumerate(lanes):
                ent = table.get((chan, t["stage"], t["subband"], t["seg"],
                                 lsb))
                if ent is not None:
                    offs[i], ebits[i] = ent
            per_round.append((lsb, offs, ebits))
            have = offs >= 0
            mb = 8
            if have.any():
                mb = _round_need(len(stream), offs, ebits, have)
            round_maxb.append(mb)
        if backend == "pallas-interpret":
            if _pallas_bucket(seg, hh, ww, sb, per_round, mag_bits,
                              sdata, max(round_maxb), interpret=True):
                # window-clip hazard: redo with full-remainder windows
                _pallas_bucket(seg, hh, ww, sb, per_round, mag_bits,
                               sdata, len(stream), interpret=True)
            for i, t in enumerate(lanes):
                img[t["row"]:t["row"] + t["h"],
                    t["col"]:t["col"] + t["w"]] = seg[:t["h"], :t["w"], i]
            continue
        if backend == "pallas":
            pending.append((seg, lanes, _prep_bucket(
                seg.shape, hh, ww, sb, per_round, mag_bits, sdata,
                round_maxb)))
            continue

        def run_bucket(maxb, seg=seg, hh=hh, ww=ww, sb=sb,
                       per_round=per_round, n=n):
            """One bucket's plane rounds at window size ``maxb``;
            returns True on a window-clip hazard: a lane's consumption
            (+parse lookahead) reached a window end that was clipped
            below the stream remainder, so it may have read zeros where
            the reference's frozen-bounds over-read (incomplete-flush
            cascades, icer_decoding.c) reads the FOLLOWING packets'
            real bytes.  The caller re-runs with full-remainder
            windows (exact, rare)."""
            seg[:] = 0
            alive = np.ones(n, bool)
            for (lsb, offs, ebits) in per_round:
                alive = alive & (offs >= 0)
                if not alive.any():
                    break
                # per-lane plane payload views; readable extent runs to
                # the stream end (zero-copy over-read semantics)
                data = np.zeros((n, max(maxb, 8)), np.uint8)
                readable = np.zeros(n, np.int64)
                for i in range(n):
                    if not alive[i]:
                        continue
                    end = min(len(stream), offs[i] + data.shape[1])
                    chunkb = sdata[offs[i]:end]
                    data[i, :len(chunkb)] = chunkb
                    readable[i] = len(chunkb)
                dec = DL.LaneDecoders(data, readable, ebits)
                ok = DL.decode_plane_lanes(
                    seg, hh, ww, sb, np.full(n, lsb, np.int32),
                    np.full(n, mag_bits, np.int32), dec, alive)
                clipped = (offs + readable) < len(stream)
                if (alive & clipped
                        & (dec.pos + 16 > readable * 8)).any():
                    return True
                alive = alive & ok
            return False

        if run_bucket(max(round_maxb)):
            run_bucket(len(stream))
        for i, t in enumerate(lanes):
            img[t["row"]:t["row"] + t["h"],
                t["col"]:t["col"] + t["w"]] = seg[:t["h"], :t["w"], i]

    if pending:
        # ONE device round trip for every bucket of the channel
        _none, haz = _run_fused(
            [u for (_, _, units) in pending for u in units], sdata)
        if len(haz) and haz.any():
            # frozen-bounds over-read hazard (rare): redo the channel on
            # the exact model path, which re-runs hazarded buckets with
            # full-remainder windows
            img[:] = 0
            return reconstruct_channel_lanes(img, table, chan, config,
                                             mag_bits, bitplanes,
                                             stream, backend="model")
        for (seg, lanes, units) in pending:
            for u in units:
                out = u["out"].reshape(u["Hmax"], u["Wpad"], u["m"])
                seg[:, :u["Wmax"], u["idx"]] = out[:, :u["Wmax"], :]
            for i, t in enumerate(lanes):
                img[t["row"]:t["row"] + t["h"],
                    t["col"]:t["col"] + t["w"]] = seg[:t["h"], :t["w"], i]


_PALLAS_RUNS: dict = {}
# lane-block width CAP for the fused decode paths (multiple of 128).
# Wider blocks amortize the kernel's per-step stall cost -- the decode
# kernel is latency-bound, not issue-bound: per-lane step cost measured
# 2.09 / 1.72 / 1.41 / 1.24 ns at 384 / 512 / 768 / 1024 lanes on the
# 512^2 stage-1 block (scripts/bench_decode_kernel.py, round-4 tight
# windows; marginal cost ~0.19 us per +256 lanes on a ~0.52 us base), so
# per-lane throughput keeps improving through 1024.  The actual width per
# bucket adapts down to the lane count and to the scoped-VMEM budget
# (_block_width).
_BLK = int(os.environ.get("ICER_DECODE_LANES", "1024"))


def _block_width(n: int, NW: int, Wpad: int) -> int:
    """Lane-block width for a bucket: the largest multiple of 128 up to
    _BLK that fits the kernel's scoped-VMEM budget (double-buffered
    words block + row buffers + canvas window + LUTs), never more than
    the bucket's padded lane count."""
    NBUF = Wpad + 16
    per_lane = (2 * NW + 8 * NBUF + 4 * Wpad + 152 + 64) * 4
    budget = 14 * 1024 * 1024
    cap = _BLK
    while cap > 128 and cap * per_lane > budget:
        cap -= 128
    return min(cap, -(-n // 128) * 128)


# Window slack past a lane's frozen data_length (bytes): each codeword
# parse looks ahead <= 16 bits past its position (ring_look11 / golomb
# klong), and the reference's zero-copy over-read serves those bits from
# the bytes that follow the packet (icer_decoding.c:108-194 reads through
# the flattened stream) -- so the window must extend a few bytes past the
# payload to reproduce them.  The 31-byte tile-alignment residual is
# added separately in _round_nw.  (Was a blanket +4096, which forced
# every round's window to the worst-case power of two: 8 KB/lane/round
# gathered on device for 14-byte MSB rounds, and a 4x VMEM tax on the
# kernel's words block.)
_WIN_SLACK = 8


def _round_need(stream_end, offs, ebits, have) -> int:
    """Tight shared window bound for one plane round: each lane needs
    min(its readable stream remainder, its frozen payload bytes + parse
    lookahead); the round's window covers the worst lane."""
    need = np.minimum(stream_end - offs, ebits // 8 + 1 + _WIN_SLACK)
    return max(8, int(need[have].max()))


def _round_nw(mb: int) -> int:
    """Power-of-two word-window size covering an mb-byte round payload
    (+31 bytes of tile-alignment slack: windows start at the enclosing
    8-word tile and the kernel skips the residual via its start-bit).
    Power-of-two sizes bound the number of distinct compiled programs;
    payload sizes vary per stream and exact-fit windows would recompile
    for nearly every input."""
    nbytes = max(mb + 31, 32)
    return max(16, 1 << (-(-nbytes // 4) - 1).bit_length())


def _prep_bucket(shape, hh, ww, sb, per_round, mag_bits, sdata, round_maxb,
                 lane_end=None):
    """Host-side assembly of one bucket's kernel inputs (see
    _pallas_bucket); returns unit dicts for the fused runner.

    ``round_maxb`` gives each plane round's worst-case payload bytes: the
    fused window gather fetches only that round's (power-of-two) window
    rows -- MSB rounds carry ~1% of an LSB round's bytes, so per-round
    windows cut the serializing gather volume ~4x vs one uniform
    worst-round size.  ``lane_end`` gives each lane's readable stream end
    (defaults to the whole blob) -- in batched decode the blob
    concatenates several images' streams and a lane's zero-copy over-read
    must stop at ITS image's end, exactly where the per-image decode
    reads zeros."""
    Hmax, Wmax, n = shape
    Wpad = -(-Wmax // 8) * 8
    PX = Hmax * Wpad
    R = len(per_round)
    NWr = tuple(_round_nw(mb) for mb in round_maxb)
    NW = max(NWr)
    stream_len = len(sdata)
    if lane_end is None:
        lane_end = np.full(n, stream_len, np.int64)
    offs_r = np.zeros((R, n), np.int32)
    geom_r = np.zeros((R, 8, n), np.int32)
    present = np.ones(n, bool)
    for r, (lsb, offs, ebits) in enumerate(per_round):
        present = present & (offs >= 0)
        offs_ok = np.where(present, offs, 0)
        # tile-aligned windows: the kernel starts at bit (offs & 31) * 8
        # (packed into geom row 5), so the gather fetches whole 8-word
        # tiles -- XLA lowers a row gather of a (S/8, 8) operand as one
        # contiguous copy per index (~28x cheaper than the former
        # per-word scalar gather, measured in scripts/probe_gather.py)
        mis = (offs_ok & 31).astype(np.int64)
        remainder_bits = (lane_end - (offs_ok - mis)) * 8
        readable_bits = np.where(
            present, np.minimum(remainder_bits, NWr[r] * 32), 0)
        # clip threshold (geom row 5 bits 6+): lanes whose window was
        # clipped below the stream remainder carry NWr words so the
        # kernel can flag consumption that reached the clipped end (the
        # frozen-bounds over-read hazard); unclipped lanes carry 0x3FFF
        # (never flags)
        thrw = np.where(remainder_bits > NWr[r] * 32, NWr[r], 0x3FFF)
        offs_r[r] = offs_ok
        geom_r[r, 0] = hh
        geom_r[r, 1] = ww
        geom_r[r, 2] = sb
        geom_r[r, 3] = lsb
        geom_r[r, 4] = mag_bits
        geom_r[r, 5] = (present.astype(np.int32) | (mis << 1)
                        | (thrw.astype(np.int64) << 6))
        geom_r[r, 6] = np.minimum(ebits, 2**31 - 1)
        geom_r[r, 7] = readable_bits

    units = []
    blk = _block_width(n, NW, Wpad)
    for b0 in range(0, n, blk):
        idx = np.arange(b0, min(b0 + blk, n))
        m = len(idx)
        # no coefficient canvas here: every decode starts from zeros and
        # the multi-round kernel zeroes its canvas window at round 0
        units.append({
            "key": (PX, Wpad, NW, R, m),
            # a runt tail block shrinks to its own padded width
            "blk": min(blk, -(-m // 128) * 128),
            "NWr": NWr,
            "offs": np.ascontiguousarray(offs_r[:, idx]),
            "geom": np.ascontiguousarray(
                geom_r[:, :, idx].reshape(R * 8, m)),
            "Hmax": Hmax, "Wpad": Wpad, "Wmax": Wmax, "m": m, "idx": idx,
        })
    return units


_STREAM_PAD = 262144   # stream-word buffer padding granularity (bytes):
#                        bounds the number of distinct compiled programs
#                        while keeping upload waste under one granule


def _run_fused(units, sdata, final=None, defer=False):
    """Run every unit's multi-round kernel inside ONE jit program (one
    dispatch, one concatenated fetch); fills unit["out"].

    The byte stream is uploaded ONCE as padded int32 words; each unit's
    per-(round, lane) payload windows are assembled on device from ONE
    clamped aligned word gather per round (the sub-word byte offset rides
    into the kernel as its starting bit position, and the kernel masks
    past-readable bits itself), sized to that ROUND's worst payload --
    the former uniform worst-round windows with a two-gather byte-shift
    combine were the single largest cost of the decode program (~3.6 ns
    per serially gathered word x R*NW*lanes).  This also replaces the
    original host-side window materialization, which uploaded NW*4 bytes
    per lane per round (~18x the stream size for a 512x512 decode, and B
    times that for batched decode).

    With ``final`` the whole decode FINISHES on device: lanes assemble
    into the (B, h, w) coefficient canvas (static slice updates),
    sign-magnitude conversion, ll_mean restoration, the inverse DWT and
    the negative clamp all run in the same program, and the fetch is the
    final packed pixel blob (the smallest possible transfer).  final =
    {B, h, w, stages, filt, mag_bits, ll_means, placements:[(unit_idx,
    lane_in_unit, img_idx, row, col, hgt, wid)]}; returns (B, h, w)
    int32 pixel arrays instead of filling unit["out"].  With ``defer``
    the call returns immediately after the async dispatch with a
    zero-arg collector (pipelined serving: overlap the next batch's
    prep + dispatch with this batch's device time + fetch)."""
    import jax
    import jax.numpy as jnp
    from ..ops import pallas_decode as PD
    from ..ops import wavelet as W
    from ..ops.encode_jax import _ensure_cache

    # decode-only processes must also land programs in the persistent
    # compile cache (it was encode-construction-only before: a
    # decode-first process recompiled every fused program per run)
    _ensure_cache()

    nb = len(sdata)
    padb = -(-(nb + 8) // _STREAM_PAD) * _STREAM_PAD
    sw = np.zeros(padb // 4, np.int32)
    raw = sdata.tobytes() + b"\0" * ((-nb) % 4)
    sw[: len(raw) // 4] = np.frombuffer(raw, np.int32)

    # CPU backends run the kernels in interpret mode (slow but correct:
    # pallas TPU kernels don't compile on CPU) -- the batched serving
    # API works on CPU-only hosts and the default test tier can cover
    # the fused path without a chip
    interp = jax.default_backend() == "cpu"
    fkey = ("fused", padb, interp) + tuple(u["key"] + (u["blk"],)
                                           + u["NWr"] for u in units)
    if final is not None:
        fkey += ("final", final["B"], final["h"], final["w"],
                 final["stages"], final["filt"], final["mag_bits"],
                 bool(final.get("pack8")), bool(final.get("assembly")))
    fn = _PALLAS_RUNS.get(fkey)
    if fn is None:
        for u in units:
            kkey = u["key"][:4] + (u["blk"], interp)
            if kkey not in _PALLAS_RUNS:
                PX, Wpad, NW, R = u["key"][:4]
                _PALLAS_RUNS[kkey] = PD.make_decode_plane_pallas(
                    PX, Wpad, NW, nrounds=R, lanes=u["blk"],
                    interpret=interp)
        runs = [(_PALLAS_RUNS[u["key"][:4] + (u["blk"], interp)],)
                + u["key"][2:] + (u["NWr"], u["blk"]) for u in units]
        shapes = [(u["Hmax"], u["Wpad"]) for u in units]

        def fused(swords, llv, *arrays):
            # 8-word tile rows: a row gather of (S/8, 8) lowers to one
            # contiguous copy per index instead of one per WORD (~28x,
            # scripts/probe_gather.py); the kernel skips each lane's
            # <=31-byte in-tile residual via its start-bit (geom row 5)
            swt = swords.reshape(-1, 8)
            limit_t = swt.shape[0] - 1
            outs = []
            hazs = []
            for i, (run, NW, R, m, NWr, blk) in enumerate(runs):
                offs, ge = arrays[2 * i:2 * i + 2]
                # one tile-aligned row gather per round, sized to the
                # round's worst payload; rows beyond NWr pad to the
                # kernel's uniform NW block with zeros (never read: lanes
                # consume at most their readable bits).
                parts = []
                for r in range(R):
                    nt = NWr[r] // 8
                    j = jnp.arange(nt, dtype=jnp.int32)[:, None]
                    idx = (offs[r] >> 5)[None, :] + j       # (nt, m)
                    rows = swt[jnp.clip(idx, 0, limit_t)]   # (nt, m, 8)
                    wr = rows.transpose(0, 2, 1).reshape(NWr[r], m)
                    if NWr[r] < NW:
                        wr = jnp.pad(wr, ((0, NW - NWr[r]), (0, 0)))
                    parts.append(wr)
                wds = jnp.concatenate(parts)                # (R*NW, m)
                pad = ((0, 0), (0, blk - m))
                out, err, pos = run(jnp.pad(wds, pad), jnp.pad(ge, pad))
                outs.append(out[:, :m])
                # pos carries the accumulated window-clip hazard flags
                # (see pallas_decode): flagged lanes' images re-decode
                # on the exact host path
                hazs.append(pos[:m])
            hazv = jnp.concatenate(hazs)

            if final is None:
                packed = []
                for o in outs:
                    # coefficients are sign-magnitude in <=16 bits: pack
                    # two pixels per fetched word (the output blob is the
                    # decode path's largest transfer)
                    if o.shape[0] % 2:
                        o = jnp.pad(o, ((0, 1), (0, 0)))
                    packed.append(((o[0::2] & 0xFFFF)
                                   | (o[1::2] << 16)).reshape(-1))
                return jnp.concatenate(packed + [hazv])

            B, h, w = final["B"], final["h"], final["w"]
            stages, filt = final["stages"], final["filt"]
            mag_bits = final["mag_bits"]
            canvas = jnp.zeros((B, h, w), jnp.int32)
            # one transpose per unit: per-lane extraction then slices
            # contiguous rows (column slices of (PX, m) serialized at
            # ~10 ns/elem -- they were the top op of the decode program)
            outsT = [o.T for o in outs]

            def lane_rect(ui, lane, hgt, wid):
                Hm, Wp = shapes[ui]
                return outsT[ui][lane].reshape(Hm, Wp)[:hgt, :wid]

            if final.get("assembly"):
                # per-(image, subband) assembly: segment rects vconcat/
                # hconcat into the whole subband block, ONE canvas
                # update per subband instead of one per segment lane
                # (cuts the DUS chain ~6x at the serving batch)
                for (b, r0, c0, bands) in final["assembly"]:
                    rows_blocks = []
                    for band in bands:
                        parts = [lane_rect(ui, lane, hgt, wid)
                                 for (ui, lane, hgt, wid) in band]
                        rows_blocks.append(
                            parts[0] if len(parts) == 1
                            else jnp.concatenate(parts, axis=1))
                    block = (rows_blocks[0] if len(rows_blocks) == 1
                             else jnp.concatenate(rows_blocks, axis=0))
                    canvas = canvas.at[
                        b, r0:r0 + block.shape[0],
                        c0:c0 + block.shape[1]].set(block)
            else:
                for (ui, lane, b, row, col, hgt,
                     wid) in final["placements"]:
                    canvas = canvas.at[b, row:row + hgt,
                                       col:col + wid].set(
                        lane_rect(ui, lane, hgt, wid))
            img = W.from_sign_magnitude(canvas, mag_bits, jnp)
            ll_w = dim_low(w, stages)
            ll_h = dim_low(h, stages)
            img = img.at[:, :ll_h, :ll_w].set(
                W._wrap(img[:, :ll_h, :ll_w] + llv[:, None, None],
                        mag_bits, jnp))
            img = jax.vmap(
                lambda x: W.inverse_stages(x, stages, filt, mag_bits,
                                           jnp)[0])(img)
            img = jnp.maximum(img, 0)
            flat = img.reshape(B, -1)
            if final.get("pack8"):
                # 8-bit serving fetch: 4 px/word + per-image max values
                # so the caller can detect >8-bit pixels and refetch wide
                # (exactness is never at risk; the pixel fetch is the
                # decode path's largest transfer at 2 B/px)
                maxv = flat.max(axis=1)
                if flat.shape[1] % 4:
                    flat = jnp.pad(flat, ((0, 0),
                                          (0, (-flat.shape[1]) % 4)))
                b4 = ((flat[:, 0::4] & 0xFF)
                      | ((flat[:, 1::4] & 0xFF) << 8)
                      | ((flat[:, 2::4] & 0xFF) << 16)
                      | ((flat[:, 3::4] & 0xFF) << 24))
                return jnp.concatenate([maxv, b4.reshape(-1), hazv])
            if flat.shape[1] % 2:
                flat = jnp.pad(flat, ((0, 0), (0, 1)))
            return jnp.concatenate([
                ((flat[:, 0::2] & 0xFFFF)
                 | (flat[:, 1::2] << 16)).reshape(-1), hazv])

        from ..backend import aot_cache
        fn = aot_cache.wrap_jit(jax.jit(fused), f"fuseddec-{fkey}")
        _PALLAS_RUNS[fkey] = fn

    flat = []
    for u in units:
        flat += [jnp.asarray(u["offs"]), jnp.asarray(u["geom"])]
    llv = np.asarray(final["ll_means"] if final is not None else [0],
                     np.int32)
    dump = os.environ.get("ICER_DUMP_HLO")
    if dump:
        # fn may be the aot_cache wrapper; lower through the wrapped jit
        with open(dump, "w") as f:
            f.write(getattr(fn, "_jitted", fn).lower(
                jnp.asarray(sw), jnp.asarray(llv),
                *flat).compile().as_text())
    dev = fn(jnp.asarray(sw), jnp.asarray(llv), *flat)
    if defer:
        # dispatch is async on remotely-attached devices: return a
        # collector so callers can pipeline the next batch's upload +
        # compute against this batch's fetch
        return lambda: _unpack_fused(np.asarray(dev), units, final)
    return _unpack_fused(np.asarray(dev), units, final)


def _unpack_fused(blob, units, final):
    """-> (pixels-or-None, per-lane hazard flags).

    pixels is None when the pack8 max check demands the wide refetch;
    hazard flags (one int per unit lane, concatenated in unit order)
    mark lanes whose decode may have read a clipped window's zeros
    where the reference reads real stream bytes -- the caller
    re-decodes those lanes' images on the exact host path."""
    hlen = sum(u["m"] for u in units)
    if final is not None:
        B, h, w = final["B"], final["h"], final["w"]
        npx = h * w
        if final.get("pack8"):
            npxq = (npx + 3) // 4
            haz = blob[B + B * npxq:B + B * npxq + hlen]
            if (blob[:B] > 255).any():
                return None, haz   # >8-bit pixels: refetch wide
            packed = blob[B:B + B * npxq].reshape(B, npxq)
            # uint8 view straight through -- the caller's single
            # astype(dtype) is the only widening copy (was uint8 ->
            # int32 -> dtype, two full-size passes)
            return packed.view(np.uint8)[:, :npx].reshape(B, h, w), haz
        npxh = (npx + 1) // 2
        haz = blob[B * npxh:B * npxh + hlen]
        packed = blob[:B * npxh].reshape(B, npxh)
        px = np.empty((B, 2 * npxh), np.int32)
        px[:, 0::2] = packed & 0xFFFF
        px[:, 1::2] = (packed >> 16) & 0xFFFF
        return px[:, :npx].reshape(B, h, w), haz

    off = 0
    for u in units:
        PX, m = u["key"][0], u["m"]
        PXh = (PX + 1) // 2
        packed = blob[off:off + PXh * m].reshape(PXh, m)
        px = np.empty((2 * PXh, m), np.int32)
        px[0::2] = packed & 0xFFFF
        px[1::2] = (packed >> 16) & 0xFFFF
        u["out"] = px[:PX]
        off += PXh * m
    return None, blob[off:off + hlen]


def _words_from_bytes(db: np.ndarray) -> np.ndarray:
    """(n, 4*NW) little-endian bytes -> (n, NW) int32 words, LSB-first."""
    w = (db[:, 0::4].astype(np.int64)
         | (db[:, 1::4].astype(np.int64) << 8)
         | (db[:, 2::4].astype(np.int64) << 16)
         | (db[:, 3::4].astype(np.int64) << 24))
    return (w & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def _pallas_bucket(seg, hh, ww, sb, per_round, mag_bits, sdata, maxb,
                   interpret=False):
    """All plane rounds of one bucket in ONE kernel call per 128-lane
    block (the multi-round gridded kernel; retirement carried on-chip).
    Returns True when any lane flags the window-clip hazard (the caller
    re-runs with full-remainder windows)."""
    import jax.numpy as jnp
    from ..ops import pallas_decode as PD

    Hmax, Wmax, n = seg.shape
    Wpad = -(-Wmax // 8) * 8
    PX = Hmax * Wpad
    nbytes = max(maxb, 8)
    # power-of-two window sizes: NW is part of the kernel's compile key
    # and payload sizes vary per stream -- exact-fit windows would
    # recompile for nearly every input; the device-side window gather
    # makes the padding cheap (~10 ns/word)
    NW = max(16, 1 << (-(-nbytes // 4) - 1).bit_length())
    R = len(per_round)
    key = (PX, Wpad, NW, R, interpret)
    run = _PALLAS_RUNS.get(key)
    if run is None:
        run = PD.make_decode_plane_pallas(PX, Wpad, NW,
                                          interpret=interpret, nrounds=R)
        _PALLAS_RUNS[key] = run

    # per-round stacked words + geometry (vectorized window gather: one
    # fancy index per round instead of per-lane python copies)
    stream_len = len(sdata)
    words_r = np.zeros((R, NW, n), np.int32)
    geom_r = np.zeros((R, 8, n), np.int32)
    present = np.ones(n, bool)
    span = np.arange(NW * 4, dtype=np.int64)
    for r, (lsb, offs, ebits) in enumerate(per_round):
        present = present & (offs >= 0)
        offs_ok = np.where(present, offs, 0)
        idx = offs_ok[:, None] + span[None, :]
        db = np.where(idx < stream_len,
                      sdata[np.minimum(idx, stream_len - 1)], 0)
        db = np.where(present[:, None], db, 0).astype(np.uint8)
        readable = np.where(present,
                            np.minimum(stream_len - offs_ok, NW * 4), 0)
        thrw = np.where(stream_len - offs_ok > NW * 4, NW, 0x3FFF)
        words_r[r] = _words_from_bytes(db).T
        geom_r[r, 0] = hh
        geom_r[r, 1] = ww
        geom_r[r, 2] = sb
        geom_r[r, 3] = lsb
        geom_r[r, 4] = mag_bits
        geom_r[r, 5] = present + (thrw.astype(np.int64) << 6)
        geom_r[r, 6] = np.minimum(ebits, 2**31 - 1)
        geom_r[r, 7] = readable * 8

    hazard = False
    for blk in range(0, n, PD.LANES):
        idx = np.arange(blk, min(blk + PD.LANES, n))
        m = len(idx)
        # Transfer only the real lanes (device-side pad to LANES, trim
        # on the way back): buckets often fill a small fraction of the
        # 128 lanes and the tunnel transfers dominate decode wall time.
        if interpret:
            def prun(words_m, geom_m, run=run, m=m):
                pad = ((0, 0), (0, PD.LANES - m))
                out, err, pos = run(np.pad(words_m, pad),
                                    np.pad(geom_m, pad))
                return (np.asarray(out)[:, :m], np.asarray(err)[:m],
                        np.asarray(pos)[:m])
        else:
            pkey = key + (m,)
            prun = _PALLAS_RUNS.get(pkey)
            if prun is None:
                import jax

                def make(run=run, m=m):
                    def padded(words_m, geom_m):
                        pad = PD.LANES - m
                        w = jnp.pad(words_m, ((0, 0), (0, pad)))
                        ge = jnp.pad(geom_m, ((0, 0), (0, pad)))
                        out, err, pos = run(w, ge)
                        return out[:, :m], err[:m], pos[:m]
                    return jax.jit(padded)
                prun = make()
                _PALLAS_RUNS[pkey] = prun
        words = np.ascontiguousarray(
            words_r[:, :, idx].reshape(R * NW, m))
        geom = np.ascontiguousarray(geom_r[:, :, idx].reshape(R * 8, m))
        out, _err, pos = prun(jnp.asarray(words), jnp.asarray(geom))
        hazard = hazard or bool(np.asarray(pos).any())
        out = np.asarray(out).reshape(Hmax, Wpad, m)
        seg[:, :, idx] = out[:, :Wmax, :]
    return hazard


def _decode_batch(streams, config: CodecConfig, dtype, nchan: int,
                  defer: bool, max_pixels: int | None = None,
                  pack8: bool | None = None):
    """Shared batched TPU decode over B streams x nchan channels.

    Canvas c = b * nchan + chan; lanes from every (image, channel) share
    the 128-lane kernel blocks and the whole batch decodes (and
    finalizes: assembly + inverse DWT + clamp) in ONE fused device
    program.  Per-image zero-copy over-read semantics are preserved by
    per-lane readable limits into the concatenated blob."""
    mag_bits = _mag_bits(dtype)
    bitplanes = _bitplanes(mag_bits)
    B = len(streams)
    if B == 0:
        raise IcerError(IcerStatus.INVALID_INPUT, "no streams")
    NC = B * nchan
    tables = []
    ll_means = [0] * NC
    w = h = 0
    founds = [scan_bytestream(d, with_offsets=True, with_payload=False)
              for d in streams]
    for b, found in enumerate(founds):
        if not found:
            raise IcerError(IcerStatus.DECODER_OUT_OF_DATA,
                            "no valid segments")
        t: dict = {}
        for hdr, _p, off in found:
            # grayscale ignores the channel nibble (reference last-wins
            # semantics); color keys by it
            chan = hdr.channel if nchan > 1 else 0
            t[(chan, hdr.decomp_level, hdr.subband_type,
               hdr.segment_number, hdr.lsb)] = (off, hdr.data_length)
            wi, hi = hdr.image_w, hdr.image_h
            if chan < nchan:
                ll_means[b * nchan + chan] = hdr.ll_mean_val
        if w == 0:
            w, h = wi, hi
        elif (w, h) != (wi, hi):
            raise IcerError(IcerStatus.INVALID_INPUT,
                            "batched streams must share geometry")
        tables.append(t)
    from .grayscale import DEFAULT_MAX_PIXELS, _check_decode_dims
    _check_decode_dims(w, h, DEFAULT_MAX_PIXELS
                       if max_pixels is None else max_pixels)

    blob = np.frombuffer(b"".join(streams), np.uint8)
    bases = np.cumsum([0] + [len(s) for s in streams])

    pending = []
    for lanes in _plan_lanes(w, h, config):
        n1 = len(lanes)
        n = n1 * NC
        Hmax = max(t["h"] for t in lanes)
        Wmax = max(t["w"] for t in lanes)
        hh = np.tile([t["h"] for t in lanes], NC).astype(np.int32)
        ww = np.tile([t["w"] for t in lanes], NC).astype(np.int32)
        sb = np.tile([t["subband"] for t in lanes], NC).astype(np.int32)
        lane_end = np.repeat(np.repeat(bases[1:], nchan), n1).astype(
            np.int64)
        per_round = []
        round_maxb = []
        for rnd in range(bitplanes):
            lsb = bitplanes - 1 - rnd
            offs = np.full(n, -1, np.int64)
            ebits = np.zeros(n, np.int64)
            for b in range(B):
                for chan in range(nchan):
                    c0 = (b * nchan + chan) * n1
                    for i, t in enumerate(lanes):
                        ent = tables[b].get((chan, t["stage"],
                                             t["subband"], t["seg"], lsb))
                        if ent is not None:
                            offs[c0 + i] = bases[b] + ent[0]
                            ebits[c0 + i] = ent[1]
            per_round.append((lsb, offs, ebits))
            have = offs >= 0
            if not have.any():
                # every lane retires at its first missing plane, so a
                # round absent for ALL lanes ends the bucket's decode
                # (quota-truncated streams drop the low planes first)
                per_round.pop()
                break
            round_maxb.append(_round_need(lane_end, offs, ebits, have))
        if not per_round:
            continue
        units = _prep_bucket((Hmax, Wmax, n), hh, ww, sb, per_round,
                             mag_bits, blob, round_maxb,
                             lane_end=lane_end)
        pending.append((lanes, units))

    # device-side finalization: lane placements into the (NC, h, w)
    # canvas; assembly + inverse DWT + clamp run inside the fused program
    all_units = []
    placements = []
    sub_rects: dict = {}    # (c, stage, subband) -> [(ui,k,row,col,h,w)]
    for (lanes, units) in pending:
        n1 = len(lanes)
        for u in units:
            ui = len(all_units)
            all_units.append(u)
            for k, bucket_lane in enumerate(u["idx"]):
                c, i = divmod(int(bucket_lane), n1)
                t = lanes[i]
                placements.append((ui, k, c, t["row"], t["col"],
                                   t["h"], t["w"]))
                sub_rects.setdefault(
                    (c, t["stage"], t["subband"]), []).append(
                    (ui, k, t["row"], t["col"], t["h"], t["w"]))
    # per-(image, subband) concat assembly (see _run_fused): segment
    # rects form exact row bands (icer_partition.c top/bottom regions),
    # so the subband block builds from static concats and lands with
    # one canvas update.  MEASURED SLOWER than the DUS chain on chip
    # (B=56 512^2 device decode 17.8 vs 14.4 ms/img, probe_device_b
    # round-5: the mixed-width small-block concats relayout more than
    # the ~4.4k static DUS cost), so the DUS chain stays the default --
    # BUT very long DUS chains (~8.7k at B=112) SIGSEGV the TPU
    # compiler (tpu_compile_helper), so past a placement-count threshold
    # the concat assembly takes over.  ICER_DECODE_ASSEMBLE=1/0 forces.
    assembly = []
    _asm_env = os.environ.get("ICER_DECODE_ASSEMBLE", "")
    ok_asm = (_asm_env == "1"
              or (_asm_env != "0" and len(placements) > 6000))
    for key, rects in sub_rects.items():
        if not ok_asm:
            break
        c = key[0]
        rects = sorted(rects, key=lambda r: (r[2], r[3]))
        r0, c0 = rects[0][2], rects[0][3]
        bands = []
        cur_row = None
        for (ui, k, row, col, hgt, wid) in rects:
            if row != cur_row:
                bands.append({"row": row, "h": hgt, "parts": []})
                cur_row = row
                expect_col = c0
            band = bands[-1]
            if (col != expect_col or hgt != band["h"]):
                ok_asm = False
                break
            band["parts"].append((ui, k, hgt, wid))
            expect_col = col + wid
        if not ok_asm:
            break
        expect_row = r0
        wtot = None
        for band in bands:
            if band["row"] != expect_row:
                ok_asm = False
                break
            expect_row = band["row"] + band["h"]
            bw = sum(wid for (_ui, _k, _h, wid) in band["parts"])
            if wtot is None:
                wtot = bw
            elif bw != wtot:
                ok_asm = False
                break
        if not ok_asm:
            break
        assembly.append((c, r0, c0, [b["parts"] for b in bands]))
    if pack8 is None:
        # uint8-path pixels always fit a byte after the clamp; the
        # uint16 path stays wide unless the caller opts in
        pack8 = np.dtype(dtype) == np.uint8
    final = {"B": NC, "h": h, "w": w, "stages": config.stages,
             "filt": config.filt, "mag_bits": mag_bits,
             "ll_means": ll_means, "placements": placements,
             "assembly": assembly if ok_asm else None,
             "pack8": bool(pack8)}

    unit_off = {}
    _o = 0
    for _ui, _u in enumerate(all_units):
        unit_off[_ui] = _o
        _o += _u["m"]

    def _finish(res):
        pix, haz = res
        if pix is None:
            # a pixel exceeded 8 bits under pack8: refetch wide (exact)
            wide = dict(final, pack8=False)
            pix, haz = _run_fused(all_units, blob, final=wide)
        out = [pix[c].astype(dtype) for c in range(NC)]
        if len(haz) and haz.any():
            # frozen-bounds over-read hazard (rare; quota-truncated
            # content): the flagged lanes may have read a clipped
            # window's zeros where the reference reads the following
            # packets' real bytes -- re-decode those lanes' images on
            # the exact host path
            affected = set()
            for (ui, k, c, _row, _col, _h, _w) in placements:
                if haz[unit_off[ui] + k]:
                    affected.add(c)
            done: dict = {}
            mp = (DEFAULT_MAX_PIXELS if max_pixels is None
                  else max_pixels)
            for c in sorted(affected):
                b, chan = divmod(c, nchan)
                if nchan == 1:
                    from .grayscale import decompress as _gdec
                    out[c] = np.asarray(_gdec(
                        streams[b], config, dtype=dtype, max_pixels=mp))
                else:
                    if b not in done:
                        from .color import decompress_yuv as _cdec
                        done[b] = _cdec(streams[b], config, dtype=dtype,
                                        max_pixels=mp)
                    out[c] = np.asarray(done[b][chan])
        return out

    if defer:
        collect = _run_fused(all_units, blob, final=final, defer=True)
        return lambda: _finish(collect())
    return _finish(_run_fused(all_units, blob, final=final))


def decompress_lanes_batch(streams, config: CodecConfig, dtype=np.uint16,
                           defer: bool = False,
                           max_pixels: int | None = None,
                           pack8: bool | None = None):
    """Batched TPU decode of same-geometry grayscale streams (serving
    mode); returns a list of decoded images, each pixel-identical to
    decompress() of its stream.  ``defer`` returns a zero-arg collector
    right after the async dispatch (pipelining).  ``pack8`` fetches
    pixels 4/word (the decode path's largest transfer) with an on-device
    max check and an exact wide refetch when any pixel exceeds 8 bits;
    default: on for dtype=uint8, off for uint16.  The refetch is a full
    second device pass over the BATCH (the check is batch-global), so
    leave pack8 off for mixed-depth uint16 content -- it pays off only
    when >8-bit pixels are rare or absent."""
    return _decode_batch(streams, config, dtype, 1, defer, max_pixels,
                         pack8=pack8)


def decompress_yuv_lanes_batch(streams, config: CodecConfig,
                               dtype=np.uint16, defer: bool = False,
                               max_pixels: int | None = None,
                               pack8: bool | None = None):
    """Batched TPU decode of same-geometry color (YUV) streams.

    All B x 3 channel canvases decode and finalize in one fused device
    program; returns a list of (y, u, v) tuples, each pixel-identical
    to decompress_yuv() of its stream.  ``pack8`` as in
    decompress_lanes_batch (8-bit YUV planes fit a byte)."""
    if defer:
        collect = _decode_batch(streams, config, dtype, 3, True,
                                max_pixels, pack8=pack8)
        return lambda: [tuple(c[i:i + 3]) for c in [collect()]
                        for i in range(0, len(c), 3)]
    flat = _decode_batch(streams, config, dtype, 3, False, max_pixels,
                         pack8=pack8)
    return [tuple(flat[i:i + 3]) for i in range(0, len(flat), 3)]


def decompress_lanes(data: bytes, config: CodecConfig, dtype=np.uint16,
                     backend: str = "model",
                     max_pixels: int | None = None) -> np.ndarray:
    """Grayscale decompression via the lane-batched decode path.

    Bit-identical to models/grayscale.decompress (differentially tested);
    the execution model is the TPU one: lock-step plane rounds across
    segments.
    """
    from .grayscale import DEFAULT_MAX_PIXELS, _check_decode_dims
    if max_pixels is None:
        max_pixels = DEFAULT_MAX_PIXELS
    if backend == "pallas":
        # the batch path finalizes fully on device (assembly + inverse
        # DWT + clamp inside the fused program); B=1 is a special case
        return decompress_lanes_batch([data], config, dtype=dtype,
                                      max_pixels=max_pixels)[0]
    mag_bits = _mag_bits(dtype)
    bitplanes = _bitplanes(mag_bits)
    found = scan_bytestream(data, with_offsets=True, with_payload=False)
    if not found:
        raise IcerError(IcerStatus.DECODER_OUT_OF_DATA, "no valid segments")
    table: dict = {}
    w = h = 0
    ll_mean = 0
    for hdr, _p, off in found:
        # channel nibble ignored, like the reference grayscale decoder
        # (icer_compress.c:449-467): last-in-stream wins on duplicates.
        table[(0, hdr.decomp_level, hdr.subband_type,
               hdr.segment_number, hdr.lsb)] = (off, hdr.data_length)
        w, h = hdr.image_w, hdr.image_h
        ll_mean = hdr.ll_mean_val

    _check_decode_dims(w, h, max_pixels)
    img = np.zeros((h, w), np.int32)
    reconstruct_channel_lanes(img, table, 0, config, mag_bits, bitplanes,
                              data, backend)
    img = np.asarray(wavelet.from_sign_magnitude(img, mag_bits))
    ll_w = dim_low(w, config.stages)
    ll_h = dim_low(h, config.stages)
    img[:ll_h, :ll_w] = wavelet._wrap(img[:ll_h, :ll_w] + ll_mean,
                                      mag_bits, np)
    img = inverse_transform(img, config.stages, config.filt, mag_bits)
    img[img < 0] = 0
    return img.astype(dtype)


def decompress_yuv_lanes(data: bytes, config: CodecConfig,
                         dtype=np.uint16, backend: str = "model",
                         max_pixels: int | None = None):
    """Color (YUV) decompression via the lane-batched decode path.

    Three channel passes of reconstruct_channel_lanes (each fusing its
    buckets into one device program on the pallas backend); bit-identical
    to models/color.decompress_yuv.
    """
    from .grayscale import DEFAULT_MAX_PIXELS, _check_decode_dims
    if max_pixels is None:
        max_pixels = DEFAULT_MAX_PIXELS
    mag_bits = _mag_bits(dtype)
    bitplanes = _bitplanes(mag_bits)
    found = scan_bytestream(data, with_offsets=True, with_payload=False)
    if not found:
        raise IcerError(IcerStatus.DECODER_OUT_OF_DATA, "no valid segments")
    table: dict = {}
    w = h = 0
    ll_means = [0, 0, 0]
    for hdr, _p, off in found:
        table[(hdr.channel, hdr.decomp_level, hdr.subband_type,
               hdr.segment_number, hdr.lsb)] = (off, hdr.data_length)
        w, h = hdr.image_w, hdr.image_h
        ll_means[hdr.channel] = hdr.ll_mean_val

    _check_decode_dims(w, h, max_pixels)
    if backend == "pallas":
        # one fused device program for all three channels: the channels
        # ARE the batch axis of the finalized batched decode (shared
        # 128-lane kernel blocks, on-device assembly + inverse DWT)
        return decompress_yuv_lanes_batch([data], config, dtype=dtype,
                                          max_pixels=max_pixels)[0]

    ll_w = dim_low(w, config.stages)
    ll_h = dim_low(h, config.stages)
    out = []
    for chan in range(3):
        img = np.zeros((h, w), np.int32)
        reconstruct_channel_lanes(img, table, chan, config, mag_bits,
                                  bitplanes, data, backend)
        img = np.asarray(wavelet.from_sign_magnitude(img, mag_bits))
        img[:ll_h, :ll_w] = wavelet._wrap(
            img[:ll_h, :ll_w] + ll_means[chan], mag_bits, np)
        img = inverse_transform(img, config.stages, config.filt, mag_bits)
        img[img < 0] = 0
        out.append(img.astype(dtype))
    return tuple(out)
