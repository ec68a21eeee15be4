"""Native C++ runtime vs the sequential Python reference."""

import numpy as np
import pytest

from icer_compression_tpu.backend import native_backend as NB
from icer_compression_tpu.backend import sequential as S
from icer_compression_tpu.models import grayscale as G
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.core.header import scan_bytestream

from conftest import make_test_image

pytestmark = pytest.mark.skipif(not NB.available(),
                                reason="native runtime unavailable")


def test_native_encode_matches_sequential(rng):
    for _ in range(40):
        L = int(rng.integers(1, 4000))
        ctx = rng.integers(0, 18, L).astype(np.int32)
        p = rng.random(18)
        bit = (rng.random(L) < p[ctx]).astype(np.int32)
        valid = (rng.random(L) < 0.9).astype(np.int32)
        pl, nb, _ = S.encode_emissions(valid, ctx, bit)
        assert NB.encode_emissions_native(valid, ctx, bit) == (pl, nb)


def test_native_encode_flush_case():
    blk_ctx = np.tile(np.array([0] + [17] * 8), 1200)
    blk_bit = np.tile(np.array([0, 1, 0, 1, 1, 0, 1, 0, 1]), 1200)
    ctx = np.concatenate([np.zeros(600, np.int64), blk_ctx])
    bit = np.concatenate([np.zeros(600, np.int64), blk_bit])
    valid = np.ones(len(ctx))
    pl, nb, fl = S.encode_emissions(valid, ctx, bit)
    assert fl > 0
    assert NB.encode_emissions_native(valid, ctx, bit) == (pl, nb)


def test_native_decode_matches_python(rng):
    img = make_test_image(48, 40, rng)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=None)
    stream = G.compress(img, cfg)
    table = {}
    for hdr, payload in scan_bytestream(stream):
        table[(hdr.channel, hdr.decomp_level, hdr.subband_type,
               hdr.segment_number, hdr.lsb)] = (payload, hdr.data_length)
    a = np.zeros((48, 40), np.int32)
    b = np.zeros((48, 40), np.int32)
    G.reconstruct_channel(a, table, 0, cfg, 15, 9, backend="python")
    G.reconstruct_channel(b, table, 0, cfg, 15, 9, backend="native")
    assert np.array_equal(a, b)


def test_native_batch_encode(rng):
    streams = []
    for _ in range(8):
        L = int(rng.integers(50, 1500))
        ctx = rng.integers(0, 18, L).astype(np.int32)
        bit = (rng.random(L) < 0.7).astype(np.int32)
        streams.append((ctx, bit))
    flat_ctx = np.concatenate([c for c, _ in streams])
    flat_bit = np.concatenate([b for _, b in streams])
    flat_valid = np.ones(len(flat_ctx), np.int32)
    lens = np.array([len(c) for c, _ in streams])
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out, bits = NB.encode_batch_native(flat_valid, flat_ctx, flat_bit,
                                       offs, lens, nthreads=3)
    for i, (c, b) in enumerate(streams):
        pl, nb, _ = S.encode_emissions(np.ones(len(c)), c, b)
        assert int(bits[i]) == nb
        assert out[i, : (nb + 7) // 8].tobytes() == pl
