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


import os

# The shard_map compile goes through this environment's remote TPU compile
# service and takes minutes (cold cache); the driver exercises the same
# program via __graft_entry__.dryrun_multichip with its own time budget.
# Opt in with ICER_RUN_SHARDED_TESTS=1.
pytestmark = [
    pytest.mark.skipif(len(_cpu_devices()) < 2,
                       reason="needs >=2 virtual cpu devices"),
    pytest.mark.skipif(os.environ.get("ICER_RUN_SHARDED_TESTS") != "1",
                       reason="slow remote compile; set "
                              "ICER_RUN_SHARDED_TESTS=1"),
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

    # uint8 path (7 magnitude bits)
    enc8 = ShardedGrayscaleEncoder(mesh, W, H, 1, 0, 2, mag_bits=7)
    imgs8 = (rng.integers(0, 200, (2, H, W))).astype(np.uint8)
    ll_means, tables = enc8.encode_batch(imgs8)
    for bi in range(2):
        ref = G.compress(imgs8[bi], cfg)
        table = {(0,) + k: v for k, v in tables[bi].items()}
        packets = sort_packets(build_packets_grayscale(
            W, H, 1, int(ll_means[bi]), 7))
        nsegs = {(p.decomp_level, p.subband_type): 2 for p in packets}
        encoded = allocate_from_table(packets, table, H * W * 2, nsegs, W, H)
        assert assemble_stream(encoded, rearrange_order_grayscale(7)) == ref


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


def test_decode_batch_sharded_devices(rng):
    """Data-parallel sharded decode (no collectives): round-robin over
    devices, pixel-identical to the host decoder."""
    from icer_compression_tpu.parallel.sharded import decode_batch_sharded
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    H = W = 24
    cfg = CodecConfig(stages=1, filt=0, segments=2, byte_quota=H * W * 2)
    imgs = [(rng.integers(0, 3000, (H, W))).astype(np.uint16)
            for _ in range(4)]
    streams = [G.compress(im, cfg) for im in imgs]
    out = decode_batch_sharded(streams, cfg, devices=_cpu_devices()[:4])
    for im, dec in zip(imgs, out):
        assert np.array_equal(im, dec)
