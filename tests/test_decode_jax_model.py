"""Lane-batched decompress orchestration (models/decode_jax) vs the
production decoder -- the TPU decode execution model, end to end."""

import numpy as np
import pytest

from icer_compression_tpu.models.decode_jax import decompress_lanes
from icer_compression_tpu.models.grayscale import (CodecConfig, compress,
                                                   decompress)
from icer_compression_tpu.utils.faults import corrupt_random, truncate


@pytest.mark.parametrize("h,w,stages,filt,segs,dtype", [
    (64, 64, 3, 0, 3, np.uint16),
    (61, 97, 2, 1, 4, np.uint16),
    (48, 48, 2, 0, 2, np.uint8),
    (96, 64, 4, 3, 6, np.uint16),
])
def test_decompress_lanes_matches(rng, h, w, stages, filt, segs, dtype):
    from conftest import make_test_image
    amp, noise = (100, 25) if dtype == np.uint8 else (200, 40)
    img = make_test_image(h, w, rng, dtype=dtype, amplitude=amp,
                          noise=noise)
    cfg = CodecConfig(stages=stages, filt=filt, segments=segs,
                      byte_quota=h * w * 4)
    s = compress(img, cfg)
    assert np.array_equal(decompress(s, cfg, dtype=dtype),
                          decompress_lanes(s, cfg, dtype=dtype))
    for mod in (truncate(s, 0.4), corrupt_random(s, 6, seed=1)):
        assert np.array_equal(decompress(mod, cfg, dtype=dtype),
                              decompress_lanes(mod, cfg, dtype=dtype))


def test_decompress_yuv_lanes_matches(rng):
    from conftest import make_test_image
    from icer_compression_tpu.models.color import (compress_yuv,
                                                   decompress_yuv)
    from icer_compression_tpu.models.decode_jax import decompress_yuv_lanes
    y = make_test_image(61, 45, rng, dtype=np.uint16)
    u = make_test_image(61, 45, rng, dtype=np.uint16)
    v = make_test_image(61, 45, rng, dtype=np.uint16)
    cfg = CodecConfig(stages=2, filt=1, segments=3, byte_quota=61 * 45 * 8)
    s = compress_yuv(y, u, v, cfg)
    for stream in (s, truncate(s, 0.5)):
        a = decompress_yuv(stream, cfg, dtype=np.uint16)
        b = decompress_yuv_lanes(stream, cfg, dtype=np.uint16)
        assert all(np.array_equal(x, z) for x, z in zip(a, b))


def test_unpack_fused_pack8_roundtrip():
    """Host-side pack8 blob unpack: byte order, tail padding, and the
    overflow (wide-refetch) signal."""
    from icer_compression_tpu.models.decode_jax import _unpack_fused
    B, h, w = 2, 3, 5
    npx, npxq = h * w, (h * w + 3) // 4
    px = np.arange(B * npx, dtype=np.int32).reshape(B, npx) % 251
    flat = np.zeros((B, npxq * 4), np.int32)
    flat[:, :npx] = px
    b4 = (flat[:, 0::4] | (flat[:, 1::4] << 8) | (flat[:, 2::4] << 16)
          | (flat[:, 3::4] << 24))
    maxv = px.max(axis=1)
    blob = np.concatenate([maxv, b4.reshape(-1)]).astype(np.int32)
    final = {"B": B, "h": h, "w": w, "pack8": True}
    out, haz = _unpack_fused(blob, [], final)
    assert np.array_equal(out, px.reshape(B, h, w))
    assert len(haz) == 0
    blob[0] = 300   # a >8-bit pixel: unpack must signal the wide refetch
    assert _unpack_fused(blob, [], final)[0] is None


def test_fused_batched_decode_cpu_interpret(rng):
    """decompress_lanes_batch runs on CPU-only hosts via interpret-mode
    kernels (auto-selected by backend) and matches the host decoder
    pixel-exactly, including a quota-truncated stream."""
    from conftest import make_test_image
    from icer_compression_tpu.models.decode_jax import (
        decompress_lanes_batch)
    from icer_compression_tpu.models import grayscale as G

    img = make_test_image(32, 24, rng)
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=32 * 24 * 4)
    s = G.compress(img, cfg)
    cfg_t = CodecConfig(stages=2, filt=0, segments=2, byte_quota=400)
    st = G.compress(img, cfg_t)
    host = [np.asarray(G.decompress(x, c, dtype=np.uint16))
            for x, c in ((s, cfg), (st, cfg_t))]
    fused = decompress_lanes_batch([s, s], cfg, dtype=np.uint16)
    assert all(np.array_equal(np.asarray(f), host[0]) for f in fused)
    ft = decompress_lanes_batch([st], cfg_t, dtype=np.uint16)
    assert np.array_equal(np.asarray(ft[0]), host[1])


def test_overread_hazard_color_regression():
    """Round-5 fuzz finding: the reference decoder's frozen-bounds
    quirk lets a plane's decode consume stream bytes PAST its payload
    (incomplete-flush cascades read the FOLLOWING packets' real bytes),
    which the round-4 tight windows cut off -- four color configs
    diverged between the lane decoders and the host decoder.  The fix
    flags window-clip hazards and re-runs affected lanes with
    full-remainder windows (model path) or the host decoder (fused
    paths).  Pins the four found configs, seeded."""
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.models.color import (compress_yuv,
                                                   decompress_yuv)
    from icer_compression_tpu.models.decode_jax import decompress_yuv_lanes

    for (h, w, st, g, f, seed) in [(56, 88, 3, 2, 2, 0),
                                   (94, 93, 3, 2, 5, 2),
                                   (69, 63, 3, 2, 4, 0),
                                   (94, 82, 4, 3, 5, 0)]:
        rng = np.random.default_rng(seed)
        # keep the rng draw order of the original fuzz repro
        _ = [(rng.integers(0, 100, (h, w))
              + rng.integers(0, 26, (h, w))).astype(np.uint8)
             for _ in range(3)]
        planes = [rng.integers(0, 256, (h, w)).astype(np.uint16)
                  for _ in range(3)]
        quota = max(256, int(h * w * 6 * 0.15))
        cfg = CodecConfig(stages=st, filt=f, segments=g,
                          byte_quota=quota)
        cs = compress_yuv(*planes, cfg)
        my = decompress_yuv(cs, cfg, dtype=np.uint16)
        ml = decompress_yuv_lanes(cs, cfg, dtype=np.uint16)
        assert all(np.array_equal(a, b) for a, b in zip(ml, my)), \
            (h, w, st, g, f)
        if (h, w) == (56, 88):
            # fused kernel path (interpret on CPU): the in-kernel
            # hazard flag must fire and route the affected images
            # through the exact host re-decode
            from icer_compression_tpu.models.decode_jax import (
                decompress_yuv_lanes_batch)
            mb = decompress_yuv_lanes_batch([cs], cfg,
                                            dtype=np.uint16)[0]
            assert all(np.array_equal(a, b) for a, b in zip(mb, my))
