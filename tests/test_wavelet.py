"""Wavelet layer vs the C oracle and self-consistency."""

import numpy as np
import pytest

from icer_compression_tpu.ops import wavelet as W

SIZES = [(8, 8), (16, 16), (9, 9), (33, 47), (5, 5), (7, 11), (13, 21),
         (6, 10), (64, 64)]


def _stages_ok(h, w, st):
    return min(-(-w // (1 << st)), -(-h // (1 << st))) >= 3


@pytest.mark.parametrize("filt", range(7))
def test_forward_inverse_vs_oracle_u16(oracle, rng, filt):
    for (h, w) in SIZES:
        for st in (1, 2):
            if not _stages_ok(h, w, st):
                continue
            img = rng.integers(0, 256, (h, w)).astype(np.uint16)
            _, cf = oracle.wavelet_fwd_u16(img, st, filt)
            ours, _ = W.forward_stages(img.astype(np.int32), st, filt, 15)
            assert np.array_equal(
                (np.asarray(ours) & 0xFFFF).astype(np.uint16), cf), (h, w, st)
            _, ci = oracle.wavelet_inv_u16(cf, st, filt)
            oi, _ = W.inverse_stages(np.asarray(ours), st, filt, 15)
            assert np.array_equal(
                (np.asarray(oi) & 0xFFFF).astype(np.uint16), ci), (h, w, st)


@pytest.mark.parametrize("filt", range(7))
def test_forward_inverse_vs_oracle_u8(oracle, rng, filt):
    for (h, w) in SIZES:
        if not _stages_ok(h, w, 1):
            continue
        img = rng.integers(0, 128, (h, w)).astype(np.uint8)
        _, cf = oracle.wavelet_fwd_u8(img, 1, filt)
        ours, _ = W.forward_stages(img.astype(np.int32), 1, filt, 7)
        assert np.array_equal(
            (np.asarray(ours) & 0xFF).astype(np.uint8), cf), (h, w)
        _, ci = oracle.wavelet_inv_u8(cf, 1, filt)
        oi, _ = W.inverse_stages(np.asarray(ours), 1, filt, 7)
        assert np.array_equal(
            (np.asarray(oi) & 0xFF).astype(np.uint8), ci), (h, w)


@pytest.mark.parametrize("filt", [0, 1, 3, 4, 5, 6])
def test_lossless_roundtrip_uint16(rng, filt):
    # All filters except C (whose reference implementation is not
    # invertible -- see ops/wavelet.py) round-trip exactly.
    for (h, w) in SIZES:
        for st in (1, 2, 3):
            if not _stages_ok(h, w, st):
                continue
            img = rng.integers(0, 1024, (h, w)).astype(np.int32)
            f, ov = W.forward_stages(img, st, filt, 15)
            assert not ov
            b, _ = W.inverse_stages(np.asarray(f), st, filt, 15)
            assert np.array_equal(np.asarray(b), img), (h, w, st)


def test_sign_magnitude_roundtrip(rng):
    v = rng.integers(-32768, 32768, 4096).astype(np.int32)
    sm = W.to_sign_magnitude(v, 15)
    back = np.asarray(W.from_sign_magnitude(sm, 15))
    # -32768 wraps to magnitude 0 (sign-only), everything else exact.
    wrap = v == -32768
    assert np.array_equal(back[~wrap], v[~wrap])
    assert (back[wrap] == 0).all()


def test_too_many_stages_rejected():
    from icer_compression_tpu.core.status import IcerError
    with pytest.raises(IcerError):
        W.forward_stages(np.zeros((8, 8), np.int32), 3, 0, 15)
