"""Pallas batched decoder kernel vs the validated numpy lane model.

Interpret-mode (eager) execution on the default CPU-pinned suite backend;
~60 s total, so it rides the default tier (semantic regressions in the
kernel are caught without a chip).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from icer_compression_tpu.backend import sequential as S  # noqa: E402
from icer_compression_tpu.ops import decode_lanes as DL  # noqa: E402
from icer_compression_tpu.ops import pallas_decode as PD  # noqa: E402
from icer_compression_tpu.ops.context_model import plane_emissions  # noqa: E402


def _encode_plane(seg, subband, lsb, mag_bits):
    valid, ctx, bit = plane_emissions(seg, subband, lsb, mag_bits)
    payload, nbits, _ = S.encode_emissions(valid, ctx, bit)
    return payload, nbits


def test_pallas_decode_plane_matches_model(rng):
    n = PD.LANES
    Hmax, Wpad = 4, 8
    mag_bits = 7
    lsb_v = 2
    h = rng.integers(1, Hmax + 1, n).astype(np.int32)
    w = rng.integers(1, Wpad + 1, n).astype(np.int32)
    subband = rng.integers(0, 4, n).astype(np.int32)

    full = np.zeros((Hmax, Wpad, n), np.int32)
    for lane in range(n):
        mag = rng.integers(0, 1 << mag_bits, (h[lane], w[lane]))
        if lane % 3 == 1:
            mag = (mag > 64) * mag
        if lane % 3 == 2:
            mag = np.zeros_like(mag)
        sign = rng.integers(0, 2, (h[lane], w[lane]))
        full[:h[lane], :w[lane], lane] = mag | (sign << mag_bits)

    # encode plane lsb_v of each lane
    payloads = []
    for lane in range(n):
        payloads.append(_encode_plane(full[:h[lane], :w[lane], lane],
                                      int(subband[lane]), lsb_v, mag_bits))
    # lane 9: truncate (error containment check)
    payloads[9] = (payloads[9][0][:1], payloads[9][1])

    # seg state with planes above lsb_v already decoded
    magmask = (1 << mag_bits) - 1
    seg0 = (full & magmask & ~((1 << (lsb_v + 1)) - 1)).astype(np.int32)
    sig_above = (seg0 & magmask) != 0
    seg0 |= np.where(sig_above, full & (1 << mag_bits), 0)

    # numpy model decode
    maxb = max(len(p) for p, _ in payloads) + 8
    data = np.zeros((n, maxb), np.uint8)
    readable = np.zeros(n, np.int64)
    ebits = np.zeros(n, np.int64)
    for lane, (p, nb) in enumerate(payloads):
        data[lane, :len(p)] = np.frombuffer(bytes(p), np.uint8)
        readable[lane] = len(p)
        ebits[lane] = nb
    ref = seg0.copy()
    dec = DL.LaneDecoders(data, readable, ebits)
    ok_ref = DL.decode_plane_lanes(ref, h, w, subband,
                                   np.full(n, lsb_v, np.int32),
                                   np.full(n, mag_bits, np.int32), dec,
                                   np.ones(n, bool))

    # pallas kernel decode
    # little-endian bytes -> int32 words, LSB-first bit order
    NW = max(16, ((maxb + 3) // 4 + 7) // 8 * 8)
    wbytes = np.zeros((NW * 4, n), np.uint8)
    for lane in range(n):
        wbytes[:readable[lane], lane] = data[lane, :readable[lane]]
    words = (wbytes[0::4].astype(np.int64)
             | (wbytes[1::4].astype(np.int64) << 8)
             | (wbytes[2::4].astype(np.int64) << 16)
             | (wbytes[3::4].astype(np.int64) << 24))
    words = (words & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    geom = np.zeros((8, n), np.int32)
    geom[0] = h
    geom[1] = w
    geom[2] = subband
    geom[3] = lsb_v
    geom[4] = mag_bits
    geom[5] = 1
    geom[6] = ebits
    geom[7] = readable * 8

    seg_rows = seg0.reshape(Hmax * Wpad, n)
    run = PD.make_decode_plane_pallas(Hmax * Wpad, Wpad, NW,
                                      interpret=True)
    out, err, pos = run(jnp.asarray(words), jnp.asarray(geom),
                        jnp.asarray(seg_rows))
    out = np.asarray(out).reshape(Hmax, Wpad, n)
    err = np.asarray(err)

    assert np.array_equal(err != 0, ~ok_ref), "error flags differ"
    good = np.nonzero(ok_ref)[0]
    assert np.array_equal(out[..., good], ref[..., good]), "pixels differ"
    # errored lane's partial state must match the model's too
    bad = np.nonzero(~ok_ref)[0]
    assert np.array_equal(out[..., bad], ref[..., bad])


def test_pallas_decode_multitile(rng):
    """Wpad=16 (two column tiles): exercises the strip-boundary carry."""
    n = PD.LANES
    Hmax, Wpad = 3, 16
    mag_bits = 7
    lsb_v = 1
    h = np.full(n, Hmax, np.int32)
    w = rng.integers(9, Wpad + 1, n).astype(np.int32)  # always > 1 tile
    subband = rng.integers(0, 4, n).astype(np.int32)

    full = np.zeros((Hmax, Wpad, n), np.int32)
    for lane in range(n):
        mag = rng.integers(0, 1 << mag_bits, (Hmax, w[lane]))
        if lane % 2:
            mag = (mag > 80) * mag
        sign = rng.integers(0, 2, (Hmax, w[lane]))
        full[:, :w[lane], lane] = mag | (sign << mag_bits)

    payloads = []
    for lane in range(n):
        payloads.append(_encode_plane(full[:, :w[lane], lane],
                                      int(subband[lane]), lsb_v, mag_bits))

    magmask = (1 << mag_bits) - 1
    seg0 = (full & magmask & ~((1 << (lsb_v + 1)) - 1)).astype(np.int32)
    sig_above = (seg0 & magmask) != 0
    seg0 |= np.where(sig_above, full & (1 << mag_bits), 0)

    maxb = max(len(p) for p, _ in payloads) + 8
    data = np.zeros((n, maxb), np.uint8)
    readable = np.zeros(n, np.int64)
    ebits = np.zeros(n, np.int64)
    for lane, (p, nb) in enumerate(payloads):
        data[lane, :len(p)] = np.frombuffer(bytes(p), np.uint8)
        readable[lane] = len(p)
        ebits[lane] = nb
    ref = seg0.copy()
    dec = DL.LaneDecoders(data, readable, ebits)
    ok_ref = DL.decode_plane_lanes(ref, h, w, subband,
                                   np.full(n, lsb_v, np.int32),
                                   np.full(n, mag_bits, np.int32), dec,
                                   np.ones(n, bool))
    assert ok_ref.all()

    NW = max(16, ((maxb + 3) // 4 + 7) // 8 * 8)
    wbytes = np.zeros((NW * 4, n), np.uint8)
    for lane in range(n):
        wbytes[:readable[lane], lane] = data[lane, :readable[lane]]
    words = (wbytes[0::4].astype(np.int64)
             | (wbytes[1::4].astype(np.int64) << 8)
             | (wbytes[2::4].astype(np.int64) << 16)
             | (wbytes[3::4].astype(np.int64) << 24))
    words = (words & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    geom = np.zeros((8, n), np.int32)
    geom[0] = h
    geom[1] = w
    geom[2] = subband
    geom[3] = lsb_v
    geom[4] = mag_bits
    geom[5] = 1
    geom[6] = ebits
    geom[7] = readable * 8

    run = PD.make_decode_plane_pallas(Hmax * Wpad, Wpad, NW,
                                      interpret=True)
    out, err, _ = run(jnp.asarray(words), jnp.asarray(geom),
                      jnp.asarray(seg0.reshape(Hmax * Wpad, n)))
    out = np.asarray(out).reshape(Hmax, Wpad, n)
    assert not np.asarray(err).any()
    assert np.array_equal(out, ref)


def test_pallas_decode_skewed_bin16(rng):
    """A long all-zero plane adapts a context's counters to the maximum
    skew, reaching entropy bin 16 -- a regression pin for the binary
    -search bin selection (its 4 levels cover counts 0..15; the 16th
    cutoff needs the final bn==15 test)."""
    n = PD.LANES
    Hmax, Wpad = 32, 32        # 1024 px: bin 16 needs ~750+ same-ctx zeros
    mag_bits = 7
    lsb_v = 1
    h = np.full(n, Hmax, np.int32)
    w = np.full(n, Wpad, np.int32)
    subband = np.tile(np.arange(4, dtype=np.int32), n // 4)

    full = np.zeros((Hmax, Wpad, n), np.int32)   # all-insignificant
    # a couple of mixed lanes so not every lane is the skewed case
    for lane in (5, 77):
        mg = rng.integers(0, 1 << mag_bits, (Hmax, Wpad))
        sg = rng.integers(0, 2, (Hmax, Wpad))
        full[:, :, lane] = mg | (sg << mag_bits)

    payloads = [_encode_plane(full[:, :, lane], int(subband[lane]),
                              lsb_v, mag_bits) for lane in range(n)]

    magmask = (1 << mag_bits) - 1
    seg0 = (full & magmask & ~((1 << (lsb_v + 1)) - 1)).astype(np.int32)
    sig_above = (seg0 & magmask) != 0
    seg0 |= np.where(sig_above, full & (1 << mag_bits), 0)

    maxb = max(len(p) for p, _ in payloads) + 8
    data = np.zeros((n, maxb), np.uint8)
    readable = np.zeros(n, np.int64)
    ebits = np.zeros(n, np.int64)
    for lane, (p, nb) in enumerate(payloads):
        data[lane, :len(p)] = np.frombuffer(bytes(p), np.uint8)
        readable[lane] = len(p)
        ebits[lane] = nb
    ref = seg0.copy()
    dec = DL.LaneDecoders(data, readable, ebits)
    ok_ref = DL.decode_plane_lanes(ref, h, w, subband,
                                   np.full(n, lsb_v, np.int32),
                                   np.full(n, mag_bits, np.int32), dec,
                                   np.ones(n, bool))
    assert ok_ref.all()

    NW = max(16, ((maxb + 3) // 4 + 7) // 8 * 8)
    wbytes = np.zeros((NW * 4, n), np.uint8)
    for lane in range(n):
        wbytes[:readable[lane], lane] = data[lane, :readable[lane]]
    words = (wbytes[0::4].astype(np.int64)
             | (wbytes[1::4].astype(np.int64) << 8)
             | (wbytes[2::4].astype(np.int64) << 16)
             | (wbytes[3::4].astype(np.int64) << 24))
    words = (words & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    geom = np.zeros((8, n), np.int32)
    geom[0] = h
    geom[1] = w
    geom[2] = subband
    geom[3] = lsb_v
    geom[4] = mag_bits
    geom[5] = 1
    geom[6] = ebits
    geom[7] = readable * 8

    run = PD.make_decode_plane_pallas(Hmax * Wpad, Wpad, NW,
                                      interpret=True)
    out, err, _pos = run(jnp.asarray(words), jnp.asarray(geom),
                         jnp.asarray(seg0.reshape(Hmax * Wpad, n)))
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out).reshape(Hmax, Wpad, n), ref)


def _drive_kernel(full, h, w, subband, lsb_v, mag_bits):
    """Encode plane lsb_v of every lane, decode via the numpy lane model
    and the (interpret-mode) pallas kernel, return (ref, out, ok_ref,
    err)."""
    n = full.shape[-1]
    Hmax, Wpad = full.shape[0], full.shape[1]
    payloads = [_encode_plane(full[:h[lane], :w[lane], lane],
                              int(subband[lane]), lsb_v, mag_bits)
                for lane in range(n)]
    magmask = (1 << mag_bits) - 1
    seg0 = (full & magmask & ~((1 << (lsb_v + 1)) - 1)).astype(np.int32)
    sig_above = (seg0 & magmask) != 0
    seg0 |= np.where(sig_above, full & (1 << mag_bits), 0)

    maxb = max(len(p) for p, _ in payloads) + 8
    data = np.zeros((n, maxb), np.uint8)
    readable = np.zeros(n, np.int64)
    ebits = np.zeros(n, np.int64)
    for lane, (p, nb) in enumerate(payloads):
        data[lane, :len(p)] = np.frombuffer(bytes(p), np.uint8)
        readable[lane] = len(p)
        ebits[lane] = nb
    ref = seg0.copy()
    dec = DL.LaneDecoders(data, readable, ebits)
    ok_ref = DL.decode_plane_lanes(ref, h, w, subband,
                                   np.full(n, lsb_v, np.int32),
                                   np.full(n, mag_bits, np.int32), dec,
                                   np.ones(n, bool))
    NW = max(16, ((maxb + 3) // 4 + 7) // 8 * 8)
    wbytes = np.zeros((NW * 4, n), np.uint8)
    for lane in range(n):
        wbytes[:readable[lane], lane] = data[lane, :readable[lane]]
    words = (wbytes[0::4].astype(np.int64)
             | (wbytes[1::4].astype(np.int64) << 8)
             | (wbytes[2::4].astype(np.int64) << 16)
             | (wbytes[3::4].astype(np.int64) << 24))
    words = (words & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    geom = np.zeros((8, n), np.int32)
    geom[0] = h
    geom[1] = w
    geom[2] = subband
    geom[3] = lsb_v
    geom[4] = mag_bits
    geom[5] = 1
    geom[6] = ebits
    geom[7] = readable * 8
    run = PD.make_decode_plane_pallas(Hmax * Wpad, Wpad, NW,
                                      interpret=True)
    out, err, _pos = run(jnp.asarray(words), jnp.asarray(geom),
                         jnp.asarray(seg0.reshape(Hmax * Wpad, n)))
    return ref, np.asarray(out).reshape(full.shape), ok_ref, np.asarray(err)


def test_pallas_decode_zero_tile_fast_path(rng):
    """EVERY lane all-zero at the tested plane: every tile qualifies for
    the zero-tile fast path, whose single-refill branch (golomb runs
    refilling mid-tile, bin adaptation from fresh counters) must be
    bit-identical to the sequential walk.  32x32 planes drive every
    context's counters through multiple rescale cycles (cap 500), so the
    fast path's closed-form one-rescale counter evolution is pinned."""
    n = PD.LANES
    Hmax, Wpad = 32, 32
    mag_bits = 7
    lsb_v = 3
    h = np.full(n, Hmax, np.int32)
    w = np.full(n, Wpad, np.int32)
    subband = np.tile(np.arange(4, dtype=np.int32), n // 4)
    # sub-plane noise only: mag >> lsb_v == 0 everywhere
    full = (rng.integers(0, 1 << lsb_v, (Hmax, Wpad, n))
            | (rng.integers(0, 2, (Hmax, Wpad, n)) << mag_bits)
            ).astype(np.int32)
    ref, out, ok_ref, err = _drive_kernel(full, h, w, subband, lsb_v,
                                          mag_bits)
    assert ok_ref.all() and not err.any()
    assert np.array_equal(out, ref)


def test_pallas_decode_fast_path_mixed_tiles(rng):
    """Significance confined to each row's first tile: the second tile
    of every row is all-lane zeroish with contexts and counters shaped
    by the first tile's coding (mid-adaptation custom-bin refills, sign
    neighborhood effects at the tile boundary)."""
    n = PD.LANES
    Hmax, Wpad = 16, 16
    mag_bits = 7
    lsb_v = 2
    h = np.full(n, Hmax, np.int32)
    w = np.full(n, Wpad, np.int32)
    # uneven widths on some lanes: partial-activity tiles
    w[::7] = 13
    subband = np.tile(np.arange(4, dtype=np.int32), n // 4)
    full = (rng.integers(0, 1 << lsb_v, (Hmax, Wpad, n))
            | (rng.integers(0, 2, (Hmax, Wpad, n)) << mag_bits)
            ).astype(np.int32)
    sig = rng.integers(0, 1 << mag_bits, (Hmax, 8, n))
    sig = np.where(rng.random((Hmax, 8, n)) < 0.4, sig, 0)
    full[:, :8, :] = (sig | (rng.integers(0, 2, (Hmax, 8, n)) << mag_bits)
                      ).astype(np.int32)
    ref, out, ok_ref, err = _drive_kernel(full, h, w, subband, lsb_v,
                                          mag_bits)
    assert ok_ref.all() and not err.any()
    assert np.array_equal(out, ref)
