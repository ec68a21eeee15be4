"""On-hardware validation of the TPU paths (real chip required).

Opt in with ICER_RUN_ONCHIP=1.  These are the drives used to validate
round-1 bring-up; each asserts bit/pixel-exactness against the host
paths (which are themselves oracle-verified).  First runs pay remote
Mosaic/XLA compiles (minutes per geometry).
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.skipif(
    os.environ.get("ICER_RUN_ONCHIP") != "1",
    reason="needs a real TPU chip + remote compiles; set ICER_RUN_ONCHIP=1")

sys.path.insert(0, os.path.dirname(__file__))

from conftest import make_test_image  # noqa: E402

from icer_compression_tpu.models import grayscale as G  # noqa: E402
from icer_compression_tpu.models.grayscale import CodecConfig  # noqa: E402


def test_jax_encode_sorted_vs_native(rng):
    img = make_test_image(128, 128, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=3, filt=0, segments=4, byte_quota=128 * 128 * 2)
    assert G.compress_jax(img, cfg) == G.compress(img, cfg)


def test_jax_encode_pallas_entropy(rng):
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    from icer_compression_tpu.models.grayscale import _JAX_ENCODERS
    img = make_test_image(128, 128, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=3, filt=0, segments=4, byte_quota=128 * 128 * 2)
    key = (128, 128, 3, 0, 4, 15)
    _JAX_ENCODERS[key] = JaxGrayscaleEncoder(128, 128, 3, 0, 4, 15,
                                             entropy="pallas")
    try:
        assert G.compress_jax(img, cfg) == G.compress(img, cfg)
    finally:
        del _JAX_ENCODERS[key]


def test_jax_encode_uint8(rng):
    img = make_test_image(96, 96, rng, dtype=np.uint8, amplitude=100,
                          noise=25)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=96 * 96 * 2)
    assert G.compress_jax(img, cfg) == G.compress(img, cfg)


def test_jax_encode_color(rng):
    from icer_compression_tpu.models.color import (compress_yuv,
                                                   compress_yuv_jax)
    y = make_test_image(96, 96, rng, dtype=np.uint16)
    u = make_test_image(96, 96, rng, dtype=np.uint16)
    v = make_test_image(96, 96, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=2, filt=1, segments=3, byte_quota=96 * 96 * 6)
    assert compress_yuv_jax(y, u, v, cfg) == compress_yuv(y, u, v, cfg)


def test_batch_encode_matches_single(rng):
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    imgs = np.stack([make_test_image(96, 96, rng, dtype=np.uint16)
                     for _ in range(3)])
    enc = JaxGrayscaleEncoder(96, 96, 2, 0, 3, 15)
    batched = enc.encode_batch(imgs)
    for i in range(3):
        tb, lb = batched[i]
        ts, ls = enc.encode(imgs[i])
        assert lb == ls and tb == ts


def test_pallas_decode_identity_and_faults(rng):
    from icer_compression_tpu.models.decode_jax import decompress_lanes
    from icer_compression_tpu.utils.faults import truncate
    img = make_test_image(64, 64, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=64 * 64 * 4)
    s = G.compress(img, cfg)
    for stream in (s, truncate(s, 0.35)):
        ref = G.decompress(stream, cfg, dtype=np.uint16)
        out = decompress_lanes(stream, cfg, dtype=np.uint16,
                               backend="pallas")
        assert np.array_equal(out, ref)


def test_batched_decode_matches_single(rng):
    from icer_compression_tpu.models.decode_jax import decompress_lanes_batch
    from icer_compression_tpu.utils.faults import truncate
    img = make_test_image(96, 96, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=96 * 96 * 4)
    streams = [G.compress(np.roll(img, i * 5, axis=1), cfg)
               for i in range(4)]
    streams[2] = truncate(streams[2], 0.5)
    refs = [G.decompress(s, cfg, dtype=np.uint16) for s in streams]
    outs = decompress_lanes_batch(streams, cfg, dtype=np.uint16)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)


def test_quota_aware_jax_encode(rng):
    """Plane-cut class encoders (delta escalation) on chip, byte-exact."""
    img = make_test_image(128, 128, rng, dtype=np.uint16)
    for quota in (1500, 4000, 128 * 128):
        cfg = CodecConfig(stages=3, filt=0, segments=4, byte_quota=quota)
        assert G.compress_jax(img, cfg) == G.compress(img, cfg), quota


def test_decode_backend_jax_api(rng):
    """decompress(backend='jax'): on-device finalization end to end."""
    img = make_test_image(96, 96, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=96 * 96 * 4)
    s = G.compress(img, cfg)
    out = np.asarray(G.decompress(s, cfg, dtype=np.uint16, backend="jax"))
    assert np.array_equal(out, img)


def test_batched_color_decode(rng):
    from icer_compression_tpu.models.color import compress_yuv, decompress_yuv
    from icer_compression_tpu.models.decode_jax import (
        decompress_yuv_lanes_batch)
    chans = [make_test_image(64, 64, rng, dtype=np.uint16)
             for _ in range(3)]
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=64 * 64 * 8)
    streams = [compress_yuv(*[np.roll(c, i * 3, axis=0) for c in chans],
                            cfg) for i in range(2)]
    refs = [decompress_yuv(s, cfg, dtype=np.uint16) for s in streams]
    outs = decompress_yuv_lanes_batch(streams, cfg, dtype=np.uint16)
    for o3, r3 in zip(outs, refs):
        for o, r in zip(o3, r3):
            assert np.array_equal(np.asarray(o), np.asarray(r))


def test_pipelined_defer_collect(rng):
    from icer_compression_tpu.models.decode_jax import decompress_lanes_batch
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    imgs = np.stack([make_test_image(96, 96, rng, dtype=np.uint16)
                     for _ in range(2)])
    cfg = CodecConfig(stages=2, filt=0, segments=3, byte_quota=96 * 96 * 4)
    enc = JaxGrayscaleEncoder(96, 96, 2, 0, 3, 15, batch=2)
    h1 = enc.encode_batch(imgs, defer=True)
    h2 = enc.encode_batch(imgs, defer=True)   # second batch in flight
    r1, r2 = h1(), h2()
    streams = [G.compress(imgs[i], cfg) for i in range(2)]
    d1 = decompress_lanes_batch(streams, cfg, dtype=np.uint16, defer=True)
    d2 = decompress_lanes_batch(streams, cfg, dtype=np.uint16, defer=True)
    for outs in (d1(), d2()):
        for o, im in zip(outs, imgs):
            assert np.array_equal(o, im)
    assert r1[0][1] == r2[0][1] and r1[0][0] == r2[0][0]


def test_batched_decode_pack8(rng):
    """pack8 serving fetch: packed path on 8-bit data, exact wide
    fallback when a pixel exceeds a byte."""
    from icer_compression_tpu.models.decode_jax import decompress_lanes_batch
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=64 * 64 * 4)
    lo = [make_test_image(64, 64, rng, dtype=np.uint8).astype(np.uint16)
          for _ in range(2)]
    hi = [(make_test_image(64, 64, rng, dtype=np.uint16) | 256)
          for _ in range(2)]   # guaranteed >8-bit pixels
    for imgs in (lo, hi):
        streams = [G.compress(i, cfg) for i in imgs]
        refs = [G.decompress(s, cfg, dtype=np.uint16) for s in streams]
        outs = decompress_lanes_batch(streams, cfg, dtype=np.uint16,
                                      pack8=True)
        for o, r in zip(outs, refs):
            assert np.array_equal(o, r)


def test_encode_batch_uint8_upload(rng):
    """8-bit-valued images upload as uint8 and encode identically to the
    same values as uint16 (the transform widens on device)."""
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder
    imgs8 = np.stack([make_test_image(96, 96, rng, dtype=np.uint8)
                      for _ in range(2)])
    enc = JaxGrayscaleEncoder(96, 96, 2, 0, 3, 15, batch=2)
    a = enc.encode_batch(imgs8)
    b = enc.encode_batch(imgs8.astype(np.uint16))
    for (ta, la), (tb, lb) in zip(a, b):
        assert la == lb and ta == tb


def test_batched_decode_uint8(rng):
    from icer_compression_tpu.models.decode_jax import decompress_lanes_batch
    imgs = [make_test_image(64, 64, rng, dtype=np.uint8, amplitude=100,
                            noise=25) for _ in range(3)]
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=64 * 64 * 2)
    streams = [G.compress(i, cfg) for i in imgs]
    refs = [G.decompress(s, cfg, dtype=np.uint8) for s in streams]
    outs = decompress_lanes_batch(streams, cfg, dtype=np.uint8)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)
