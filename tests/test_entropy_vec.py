"""Vectorized entropy encoder vs the sequential reference coder."""

import numpy as np

from icer_compression_tpu.backend import sequential as S
from icer_compression_tpu.ops import entropy_vec as V


def _roundtrip_case(rng, L):
    ctx = rng.integers(0, 18, L)
    p = rng.random(18)
    bit = (rng.random(L) < p[ctx]).astype(np.int32)
    valid = np.ones(L, np.int32)
    return valid, ctx, bit


def test_vec_matches_sequential_random(rng):
    for _ in range(60):
        L = int(rng.integers(1, 4000))
        valid, ctx, bit = _roundtrip_case(rng, L)
        pl_s, nb_s, fl = S.encode_emissions(valid, ctx, bit)
        out = V.encode_emissions_vec(valid, ctx, bit)
        if out is None:
            assert fl > 0  # fallback only when a flush really occurs
            continue
        assert fl == 0
        assert out == (pl_s, nb_s)


def test_vec_detects_buffer_flush(rng):
    """A long golomb run interleaved with uncoded churn fills the 2048-word
    buffer; the vectorized path must detect it and decline (the sequential
    path then reproduces the reference's mid-plane flush)."""
    parts_ctx = [np.zeros(600, np.int64)]
    parts_bit = [np.zeros(600, np.int64)]
    blk_ctx = np.tile(np.array([0] + [17] * 8), 1200)
    blk_bit = np.tile(np.array([0, 1, 0, 1, 1, 0, 1, 0, 1]), 1200)
    ctx = np.concatenate(parts_ctx + [blk_ctx])
    bit = np.concatenate(parts_bit + [blk_bit])
    valid = np.ones(len(ctx), np.int64)
    _, _, fl = S.encode_emissions(valid, ctx, bit)
    assert fl > 0
    assert V.encode_emissions_vec(valid, ctx, bit) is None


def test_vec_empty_and_tiny():
    assert V.encode_emissions_vec(np.zeros(4), np.zeros(4), np.zeros(4)) == (b"", 0)
    out = V.encode_emissions_vec(np.ones(1), np.array([17]), np.array([1]))
    pl, nb, _ = S.encode_emissions(np.ones(1), np.array([17]), np.array([1]))
    assert out == (pl, nb)


def test_vec_single_context_golomb(rng):
    # All-zero bits in one context drive it deep into the golomb bins,
    # exercising run splitting at m and tail flushes.
    for L in (5, 100, 511, 512, 513, 1200, 2600):
        ctx = np.zeros(L, np.int64)
        bit = np.zeros(L, np.int64)
        valid = np.ones(L, np.int64)
        pl_s, nb_s, fl = S.encode_emissions(valid, ctx, bit)
        out = V.encode_emissions_vec(valid, ctx, bit)
        assert fl == 0 and out == (pl_s, nb_s), L
