"""Color (YUV) codec vs the C oracle."""

import numpy as np
import pytest

from icer_compression_tpu.models import color as CL
from icer_compression_tpu.models.grayscale import CodecConfig
from icer_compression_tpu.utils.colorspace import rgb_to_ycbcr, ycbcr_to_rgb


def _planes(rng, h=40, w=48):
    rgb = (np.add.outer(np.arange(h) * 2, np.arange(w))[..., None] % 160
           + rng.integers(0, 60, (h, w, 3))).astype(np.uint8)
    return rgb, rgb_to_ycbcr(rgb)


@pytest.mark.parametrize("filt,stages,segs,qf", [
    (0, 2, 3, 1.0), (0, 2, 3, 0.3), (1, 3, 2, 1.0), (2, 2, 5, 1.0),
])
def test_color_u16_parity(oracle, rng, filt, stages, segs, qf):
    rgb, (y, u, v) = _planes(rng)
    h, w = y.shape
    quota = int(h * w * 3 * qf)
    _, cstream = oracle.compress_yuv_u16(y, u, v, stages, filt, segs, quota)
    cfg = CodecConfig(stages=stages, filt=filt, segments=segs,
                      byte_quota=quota)
    ours = CL.compress_yuv(y.astype(np.uint16), u.astype(np.uint16),
                           v.astype(np.uint16), cfg)
    assert ours == cstream
    _, cdec = oracle.decompress_yuv_u16(cstream, stages, filt, segs, h * w * 4)
    mydec = CL.decompress_yuv(cstream, cfg, dtype=np.uint16)
    for m, c in zip(mydec, cdec):
        assert np.array_equal(np.asarray(m), c)


def test_color_u8_parity(oracle, rng):
    # uint8 color needs small amplitudes (int8 samples; the reference
    # errors with INTEGER_OVERFLOW otherwise) and uses the ascending
    # rearrangement order quirk.
    _, (y, u, v) = _planes(rng)
    y8, u8, v8 = [(np.asarray(c) // 3).astype(np.uint8) for c in (y, u, v)]
    h, w = y8.shape
    _, cstream = oracle.compress_yuv_u8(y8, u8, v8, 2, 0, 3, h * w * 3)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=h * w * 3)
    ours = CL.compress_yuv(y8, u8, v8, cfg)
    assert ours == cstream
    _, cdec = oracle.decompress_yuv_u8(cstream, 2, 0, 3, h * w * 2)
    mydec = CL.decompress_yuv(cstream, cfg, dtype=np.uint8)
    for m, c in zip(mydec, cdec):
        assert np.array_equal(np.asarray(m), c)


def test_color_overflow_matches_reference(rng):
    # Full-range uint8 YCbCr overflows int8 samples; the reference aborts
    # with INTEGER_OVERFLOW and so do we.
    from icer_compression_tpu.core.status import IcerError, IcerStatus
    _, (y, u, v) = _planes(rng)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=10000)
    with pytest.raises(IcerError) as ei:
        CL.compress_yuv(y.astype(np.uint8), u.astype(np.uint8),
                        v.astype(np.uint8), cfg)
    assert ei.value.status == IcerStatus.INTEGER_OVERFLOW


def test_color_rgb_roundtrip_quality(rng):
    """RGB->YCbCr->codec->RGB at full quota: near-lossless (the integer
    colorspace conversion itself is lossy, matching color_util.h)."""
    rgb, (y, u, v) = _planes(rng)
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=None)
    stream = CL.compress_yuv(y.astype(np.uint16), u.astype(np.uint16),
                             v.astype(np.uint16), cfg)
    dy, du, dv = CL.decompress_yuv(stream, cfg, dtype=np.uint16)
    # Codec itself is lossless on the YUV planes.
    assert np.array_equal(np.asarray(dy), y)
    assert np.array_equal(np.asarray(du), u)
    assert np.array_equal(np.asarray(dv), v)
    back = ycbcr_to_rgb(np.asarray(dy), np.asarray(du), np.asarray(dv))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 8


def test_compress_yuv_batch_matches_single(rng):
    """Batched color serving encode (3B channel canvases in one fused
    program) is bit-identical to compress_yuv per image, lossless and
    quota-truncated."""
    jax = pytest.importorskip("jax")
    from conftest import make_test_image
    from icer_compression_tpu.models.color import compress_yuv_batch

    h, w = 40, 32
    B = 2
    ys = [make_test_image(h, w, rng) for _ in range(B)]
    us = [make_test_image(h, w, rng, amplitude=120) for _ in range(B)]
    vs = [make_test_image(h, w, rng, amplitude=90) for _ in range(B)]
    cpu = jax.devices("cpu")[0]
    for quota in (h * w * 6, 900):
        cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=quota)
        with jax.default_device(cpu):
            streams = compress_yuv_batch(ys, us, vs, cfg)
        for i in range(B):
            assert streams[i] == CL.compress_yuv(ys[i], us[i], vs[i],
                                                 cfg), (quota, i)
