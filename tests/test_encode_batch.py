"""Batched fused-encoder correctness (CPU device, sorted entropy backend).

The batched encoder concatenates all images' lanes into shared entropy
kernel blocks (ops/encode_jax.encode_batch); these tests pin its
bit-exactness against the host encoder per image, including the
single-image wrapper path and fallback bookkeeping.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, os.path.dirname(__file__))

from conftest import make_test_image  # noqa: E402

from icer_compression_tpu.core.packets import (  # noqa: E402
    build_packets_grayscale, rearrange_order_grayscale, sort_packets)
from icer_compression_tpu.models import grayscale as G  # noqa: E402
from icer_compression_tpu.models.grayscale import CodecConfig  # noqa: E402


def _stream_from_table(table, ll, w, h, cfg, bitplanes=9):
    packets = sort_packets(
        build_packets_grayscale(w, h, cfg.stages, ll, bitplanes))
    nsegs = {(p.decomp_level, p.subband_type): cfg.segments for p in packets}
    t = {(0,) + k: v for k, v in table.items()}
    enc = G.allocate_from_table(packets, t, cfg.byte_quota, nsegs, w, h)
    return G.assemble_stream(enc, rearrange_order_grayscale(bitplanes))


def test_encode_batch_bit_exact(rng):
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        imgs = np.stack([
            make_test_image(40, 40, rng, dtype=np.uint16),
            make_test_image(40, 40, rng, dtype=np.uint16, amplitude=97),
            make_test_image(40, 40, rng, dtype=np.uint16, noise=200),
        ])
        cfg = CodecConfig(stages=2, filt=0, segments=3,
                          byte_quota=40 * 40 * 2)
        enc = JaxGrayscaleEncoder(40, 40, 2, 0, 3, 15, entropy="sorted",
                                  batch=3)
        res = enc.encode_batch(imgs)
        for i in range(3):
            table, ll = res[i]
            stream = _stream_from_table(table, ll, 40, 40, cfg)
            assert stream == G.compress(imgs[i], cfg), f"image {i}"


def test_encode_batch_sibling_and_single(rng):
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        imgs = np.stack([
            make_test_image(33, 47, rng, dtype=np.uint16),
            make_test_image(33, 47, rng, dtype=np.uint16, amplitude=55),
        ])
        cfg = CodecConfig(stages=2, filt=2, segments=2,
                          byte_quota=33 * 47 * 2)
        enc = JaxGrayscaleEncoder(47, 33, 2, 2, 2, 15, entropy="sorted")
        # batch B != encoder batch -> sibling delegation
        res = enc.encode_batch(imgs)
        for i in range(2):
            table, ll = res[i]
            stream = _stream_from_table(table, ll, 47, 33, cfg)
            assert stream == G.compress(imgs[i], cfg), f"image {i}"
        # single-image wrapper stays bit-exact
        table, ll = enc.encode(imgs[0])
        stream = _stream_from_table(table, ll, 47, 33, cfg)
        assert stream == G.compress(imgs[0], cfg)


def test_compress_jax_quota_classes(rng):
    """Quota-aware plane-cut encoding: byte-exact at every quota class.

    Small quotas route compress_jax through priority-prefix (plane-cut)
    encoder variants (icer_compress.c:404 stop-at-quota semantics); the
    stream must equal the host encoder's at every quota, including ones
    that force prefix-escalation re-encodes.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        img = make_test_image(48, 48, rng, dtype=np.uint16)
        for quota in (200, 600, 1200, 2500, 48 * 48):
            cfg = CodecConfig(stages=2, filt=0, segments=3,
                              byte_quota=quota)
            assert G.compress_jax(img, cfg) == G.compress(img, cfg), quota


def test_compress_jax_quota_uses_cut_encoder(rng):
    """A constraining quota must actually select a plane-cut variant."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        img = make_test_image(64, 64, rng, dtype=np.uint16)
        cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=500)
        before = set(G._JAX_ENCODERS)
        assert G.compress_jax(img, cfg) == G.compress(img, cfg)
        added = set(G._JAX_ENCODERS) - before
        assert any(len(k) == 7 for k in added), \
            "expected a plane-cut encoder variant to be instantiated"


def test_compress_yuv_jax_quota_classes(rng):
    """Color quota classes (shared-cut delta escalation): byte-exact."""
    from icer_compression_tpu.models.color import (compress_yuv,
                                                   compress_yuv_jax)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        chans = [make_test_image(48, 48, rng, dtype=np.uint16)
                 for _ in range(3)]
        for quota in (600, 2500, 3 * 48 * 48):
            cfg = CodecConfig(stages=2, filt=0, segments=2,
                              byte_quota=quota)
            assert (compress_yuv_jax(*chans, cfg)
                    == compress_yuv(*chans, cfg)), quota


def test_encode_batch_compact_fetch_and_refetch(rng, monkeypatch):
    """Compacted payload fetch (device tile gather sized by a static
    budget) and its overflow refetch through the full-layout program are
    both byte-exact.  The floor override lets the path run on a small
    geometry; a 5% budget forces the overflow on the second encoder."""
    from icer_compression_tpu.ops.encode_jax import JaxGrayscaleEncoder

    monkeypatch.setenv("ICER_COMPACT_FLOOR", "0")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        imgs = np.stack([
            make_test_image(40, 40, rng, dtype=np.uint16),
            make_test_image(40, 40, rng, dtype=np.uint16, noise=200),
        ])
        cfg = CodecConfig(stages=2, filt=0, segments=3,
                          byte_quota=40 * 40 * 2)
        refs = [G.compress(imgs[i], cfg) for i in range(2)]

        enc = JaxGrayscaleEncoder(40, 40, 2, 0, 3, 15, entropy="sorted",
                                  batch=2)
        assert enc._compact
        for i, (table, ll) in enumerate(enc.encode_batch(imgs)):
            assert _stream_from_table(table, ll, 40, 40, cfg) == refs[i]

        monkeypatch.setenv("ICER_FETCH_BUDGET", "0.05")
        enc2 = JaxGrayscaleEncoder(40, 40, 2, 0, 3, 15, entropy="sorted",
                                   batch=2)
        for i, (table, ll) in enumerate(enc2.encode_batch(imgs)):
            assert _stream_from_table(table, ll, 40, 40, cfg) == refs[i]
        assert enc2._fused_full is not None  # the refetch actually ran
