"""Sort-centric entropy encoder (v2, the TPU formulation) vs the
sequential reference coder."""

import numpy as np

from icer_compression_tpu.backend import sequential as S
from icer_compression_tpu.ops import entropy_jax2 as E2


def _check(valid, ctx, bit):
    pl_s, nb_s, fl = S.encode_emissions(valid, ctx, bit)
    payload, total, flush = E2.encode_emissions_sorted(
        np.asarray(valid, np.int32), np.asarray(ctx, np.int32),
        np.asarray(bit, np.int32), np)
    assert bool(flush) == (fl > 0)
    if fl:
        return
    assert (bytes(np.asarray(payload)[: (int(total) + 7) // 8]),
            int(total)) == (pl_s, nb_s)


def test_v2_random_streams(rng):
    for _ in range(60):
        L = int(rng.integers(2, 3000))
        ctx = rng.integers(0, 18, L).astype(np.int32)
        p = rng.random(18)
        bit = (rng.random(L) < p[ctx]).astype(np.int32)
        valid = (rng.random(L) < 0.85).astype(np.int32)
        _check(valid, ctx, bit)


def test_v2_golomb_runs(rng):
    # all-zero single context crosses golomb m boundaries and tails
    for L in (5, 100, 511, 512, 513, 1200, 2600):
        _check(np.ones(L), np.zeros(L, np.int32), np.zeros(L, np.int32))
    # long biased runs with occasional ones
    for L in (700, 1500):
        bit = (rng.random(L) < 0.02).astype(np.int32)
        _check(np.ones(L), np.zeros(L, np.int32), bit)


def test_v2_flush_detection():
    blk_ctx = np.tile(np.array([0] + [17] * 8), 1200)
    blk_bit = np.tile(np.array([0, 1, 0, 1, 1, 0, 1, 0, 1]), 1200)
    ctx = np.concatenate([np.zeros(600, np.int64), blk_ctx])
    bit = np.concatenate([np.zeros(600, np.int64), blk_bit])
    valid = np.ones(len(ctx))
    _, _, fl = S.encode_emissions(valid, ctx, bit)
    assert fl > 0
    _, _, flush = E2.encode_emissions_sorted(
        valid.astype(np.int32), ctx.astype(np.int32), bit.astype(np.int32),
        np)
    assert bool(flush)


def test_v2_uncoded_only(rng):
    L = 500
    ctx = np.full(L, 17, np.int32)
    bit = rng.integers(0, 2, L).astype(np.int32)
    _check(np.ones(L), ctx, bit)


def _random_records(rng, L):
    nbits = rng.integers(0, 17, L).astype(np.int32)
    code = rng.integers(0, 1 << 16, L).astype(np.int32)
    code = code & ((1 << np.maximum(nbits, 1)) - 1)
    rec_valid = (rng.random(L) < 0.8) & (nbits > 0)
    return code, nbits, rec_valid


def test_pack_tree_matches_pack_records(rng):
    for _ in range(40):
        L = int(rng.integers(1, 2000))
        code, nbits, rec_valid = _random_records(rng, L)
        max_bits = ((int((nbits * rec_valid).sum())
                     + int(rng.integers(0, 512)) + 255) // 256) * 256
        max_bits = max(max_bits, 256)
        a = E2.pack_records(code, nbits, rec_valid, np, max_bits=max_bits,
                            with_overflow=True, return_words=True)
        b = E2.pack_records_tree(code, nbits, rec_valid, np,
                                 max_bits=max_bits, with_overflow=True,
                                 return_words=True)
        assert int(a[1]) == int(b[1]) and bool(a[2]) == bool(b[2])
        if not a[2]:
            assert np.array_equal(a[0], b[0])
        # byte path
        ab = E2.pack_records(code, nbits, rec_valid, np, max_bits=max_bits)
        bb = E2.pack_records_tree(code, nbits, rec_valid, np,
                                  max_bits=max_bits)
        if int(ab[1]) <= max_bits:
            assert np.array_equal(ab[0], bb[0])


def test_pack_tree_jax_cpu(rng):
    import pytest
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    with jax.default_device(jax.devices("cpu")[0]):
        for L in (1, 7, 64, 1023, 4096):
            code, nbits, rec_valid = _random_records(rng, L)
            max_bits = ((int((nbits * rec_valid).sum()) + 511)
                        // 256) * 256
            a = E2.pack_records(code, nbits, rec_valid, np,
                                max_bits=max_bits, return_words=True)
            b = E2.pack_records_tree(jnp.asarray(code), jnp.asarray(nbits),
                                     jnp.asarray(rec_valid), jnp,
                                     max_bits=max_bits, return_words=True)
            assert int(a[1]) == int(b[1])
            assert np.array_equal(a[0], np.asarray(b[0]))


def test_compaction_equivalence(rng):
    """Dropping invalid emission slots (stable) never changes the coder
    output -- the contract behind the fused encoder's compaction."""
    from icer_compression_tpu.ops.entropy_jax2 import encode_emissions_sorted
    for _ in range(20):
        L = int(rng.integers(40, 400))
        valid = (rng.random(L) < 0.55).astype(np.int32)
        ctx = rng.integers(0, 18, L).astype(np.int32)
        bit = rng.integers(0, 2, L).astype(np.int32)
        a = encode_emissions_sorted(valid, ctx, bit, np)
        keep = valid != 0
        Lc = int(keep.sum())
        v2 = np.ones(Lc, np.int32)
        c2 = ctx[keep]
        b2 = bit[keep]
        b_res = encode_emissions_sorted(v2, c2, b2, np)
        assert bytes(a[0][: (int(a[1]) + 7) // 8]) == \
            bytes(b_res[0][: (int(b_res[1]) + 7) // 8])
        assert int(a[1]) == int(b_res[1]) and bool(a[2]) == bool(b_res[2])
