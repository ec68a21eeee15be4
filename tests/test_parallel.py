"""Sharded multi-device encoding on a virtual CPU mesh.

Validates the shard_map program end to end: the sharded batch encoder's
streams must be byte-identical to the single-image host path.  Runs on
8 virtual CPU devices (conftest sets xla_force_host_platform_device_count).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _cpu_devices():
    try:
        return jax.devices("cpu")
    except Exception:
        return []


# The conftest pins the CPU backend for the default tier and these tests
# build their mesh with platform="cpu" explicitly, so the whole tier
# compiles and runs locally (~40 s) -- it is part of the default suite.
pytestmark = [
    pytest.mark.skipif(len(_cpu_devices()) < 2,
                       reason="needs >=2 virtual cpu devices"),
]


def test_sharded_color_and_uint8(rng):
    from icer_compression_tpu.parallel.sharded import (
        ShardedColorEncoder, ShardedGrayscaleEncoder, make_mesh)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.color import compress_yuv
    from icer_compression_tpu.models.grayscale import (
        CodecConfig, allocate_from_table, assemble_stream)
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)

    mesh = make_mesh(2, platform="cpu")
    H = W = 24
    cfg = CodecConfig(stages=1, filt=0, segments=2, byte_quota=H * W * 2)

    # color: channels fold into the data axis
    enc = ShardedColorEncoder(mesh, W, H, 1, 0, 2, mag_bits=15)
    planes = [((np.add.outer(np.arange(H) * k, np.arange(W))[None] % 90)
               + rng.integers(0, 30, (2, H, W))).astype(np.uint16)
              for k in (3, 5, 7)]
    streams = enc.compress_batch(planes[0], planes[1], planes[2], cfg)
    for bi in range(2):
        ref = compress_yuv(planes[0][bi], planes[1][bi], planes[2][bi], cfg)
        assert streams[bi] == ref

    # uint8 path (7 magnitude bits): amplitudes must keep the DWT inside
    # int8 -- the reference flags ICER_INTEGER_OVERFLOW otherwise
    # (icer_wavelet.c:243), and so do we (tested separately below).
    enc8 = ShardedGrayscaleEncoder(mesh, W, H, 1, 0, 2, mag_bits=7)
    imgs8 = ((np.add.outer(np.arange(H), np.arange(W))[None] % 60)
             + rng.integers(0, 20, (2, H, W))).astype(np.uint8)
    ll_means, tables = enc8.encode_batch(imgs8)
    for bi in range(2):
        ref = G.compress(imgs8[bi], cfg)
        table = {(0,) + k: v for k, v in tables[bi].items()}
        packets = sort_packets(build_packets_grayscale(
            W, H, 1, int(ll_means[bi]), 7))
        nsegs = {(p.decomp_level, p.subband_type): 2 for p in packets}
        encoded = allocate_from_table(packets, table, H * W * 2, nsegs, W, H)
        assert assemble_stream(encoded, rearrange_order_grayscale(7)) == ref


def test_make_mesh_shapes():
    """Pin the default (data, seg) split: both axes carry when n > 1
    (VERDICT r4 item 10 -- the old heuristic always chose seg=1, so the
    helper used by dryrun_multichip never exercised the lane axis)."""
    from icer_compression_tpu.parallel.sharded import make_mesh

    navail = len(_cpu_devices())
    for n, want in {1: (1, 1), 2: (1, 2), 4: (2, 2), 8: (4, 2)}.items():
        if n > navail:
            continue
        mesh = make_mesh(n, platform="cpu")
        assert (mesh.shape["data"], mesh.shape["seg"]) == want
    if navail >= 4:   # explicit data override is still honored
        mesh = make_mesh(4, data=4, platform="cpu")
        assert (mesh.shape["data"], mesh.shape["seg"]) == (4, 1)


def test_sharded_encode_matches_reference_path(rng):
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import (
        CodecConfig, allocate_from_table, assemble_stream)
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)

    mesh = make_mesh(2, platform="cpu")
    H = W = 24
    stages, segments = 1, 2
    enc = ShardedGrayscaleEncoder(mesh, W, H, stages, 0, segments,
                                  mag_bits=15)
    B = max(mesh.shape["data"], 1) * 2
    imgs = ((np.add.outer(np.arange(H) * 3, np.arange(W))[None] % 150)
            + rng.integers(0, 40, (B, H, W))).astype(np.uint16)
    ll_means, tables = enc.encode_batch(imgs)
    cfg = CodecConfig(stages=stages, filt=0, segments=segments,
                      byte_quota=H * W * 2)
    for bi in range(B):
        ref = G.compress(imgs[bi], cfg)
        table = {(0,) + k: v for k, v in tables[bi].items()}
        packets = sort_packets(build_packets_grayscale(
            W, H, stages, int(ll_means[bi]), 9))
        nsegs = {(p.decomp_level, p.subband_type): segments
                 for p in packets}
        encoded = allocate_from_table(packets, table, H * W * 2, nsegs, W, H)
        assert assemble_stream(encoded, rearrange_order_grayscale(9)) == ref


def test_sharded_compact_budget_overflow(rng, monkeypatch):
    """A tiny fetch budget forces every shard past its tile budget: the
    encoder must detect the overflow and rerun the exact full-table
    path, with streams still byte-identical to the reference path."""
    monkeypatch.setenv("ICER_FETCH_BUDGET", "0.02")
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import (
        CodecConfig, allocate_from_table, assemble_stream)
    from icer_compression_tpu.core.packets import (
        build_packets_grayscale, rearrange_order_grayscale, sort_packets)

    mesh = make_mesh(2, platform="cpu")
    H = W = 24
    enc = ShardedGrayscaleEncoder(mesh, W, H, 1, 0, 2, mag_bits=15)
    assert enc._compact
    imgs = ((np.add.outer(np.arange(H) * 3, np.arange(W))[None] % 150)
            + rng.integers(0, 40, (2, H, W))).astype(np.uint16)
    ll_means, tables = enc.encode_batch(imgs)
    cfg = CodecConfig(stages=1, filt=0, segments=2, byte_quota=H * W * 2)
    for bi in range(2):
        ref = G.compress(imgs[bi], cfg)
        table = {(0,) + k: v for k, v in tables[bi].items()}
        packets = sort_packets(build_packets_grayscale(
            W, H, 1, int(ll_means[bi]), 9))
        nsegs = {(p.decomp_level, p.subband_type): 2 for p in packets}
        encoded = allocate_from_table(packets, table, H * W * 2, nsegs,
                                      W, H)
        assert assemble_stream(encoded, rearrange_order_grayscale(9)) == ref


def test_sharded_overflow_raises(rng):
    """A DWT sample wrap must surface as ICER_INTEGER_OVERFLOW from the
    sharded batch encoder, exactly like the single-image paths
    (icer_wavelet.c:243,460)."""
    from icer_compression_tpu.core.status import IcerError, IcerStatus
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleEncoder, make_mesh)

    mesh = make_mesh(2, platform="cpu")
    H = W = 24
    enc8 = ShardedGrayscaleEncoder(mesh, W, H, 1, 0, 2, mag_bits=7)
    # full-range uint8 noise guarantees an int8 wrap in the 7-bit DWT
    imgs8 = rng.integers(0, 250, (2, H, W)).astype(np.uint8)
    with pytest.raises(IcerError) as exc:
        enc8.encode_batch(imgs8)
    assert exc.value.status == IcerStatus.INTEGER_OVERFLOW


def test_sharded_mesh_decoder_matches_host(rng):
    """The shard_map mesh decoder (streams on 'data', lanes on 'seg')
    must be pixel-identical to the host decoder per stream, including
    under a truncating quota (lane retirement at missing planes)."""
    from icer_compression_tpu.parallel.sharded import (
        ShardedGrayscaleDecoder, make_mesh)
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    mesh = make_mesh(2, platform="cpu")
    H = W = 24
    B = 2 * max(mesh.shape["data"], 1)
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=None)
    imgs = [((np.add.outer(np.arange(H) * 3, np.arange(W)) % 150)
             + rng.integers(0, 40, (H, W))).astype(np.uint16)
            for _ in range(B)]
    streams = [G.compress(im, cfg) for im in imgs]
    dec = ShardedGrayscaleDecoder(mesh, W, H, cfg)
    out = dec.decode_batch(streams)
    for im, d in zip(imgs, out):
        assert np.array_equal(im, d)

    # truncating quota: low planes drop, lanes retire mid-walk
    qcfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=300)
    qstreams = [G.compress(im, qcfg) for im in imgs]
    qdec = ShardedGrayscaleDecoder(mesh, W, H, qcfg)
    qout = qdec.decode_batch(qstreams)
    for s, d in zip(qstreams, qout):
        ref = G.decompress(s, qcfg, dtype=np.uint16)
        assert np.array_equal(ref, d)


def test_decode_batch_sharded_devices(rng):
    """Data-parallel sharded decode (no collectives): round-robin over
    devices, pixel-identical to the host decoder.  Lossless round-trip
    needs amplitudes representable in the 9 coded uint16 bitplanes and an
    unconstrained quota (values above ~512 lose MSBs by design -- see
    test_extremes.py)."""
    from icer_compression_tpu.parallel.sharded import decode_batch_sharded
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    H = W = 24
    cfg = CodecConfig(stages=1, filt=0, segments=2, byte_quota=None)
    imgs = [((np.add.outer(np.arange(H) * 3, np.arange(W)) % 150)
             + rng.integers(0, 40, (H, W))).astype(np.uint16)
            for _ in range(4)]
    streams = [G.compress(im, cfg) for im in imgs]
    out = decode_batch_sharded(streams, cfg, devices=_cpu_devices()[:4])
    for im, dec in zip(imgs, out):
        assert np.array_equal(im, dec)
