"""CLI end-to-end coverage (host backends; flags mirror icer_util.c).

The CLI's byte-parity against the reference binary is verified manually
per round (the binary lives outside the repo); these tests pin the CLI's
own contract: compress/decompress round trips, quota behavior, the
grayscale/color mode flags, and the --prefix progressive preview.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))

from conftest import make_test_image  # noqa: E402

from icer_compression_tpu.cli import main  # noqa: E402


@pytest.fixture()
def gray_png(tmp_path, rng):
    img = make_test_image(96, 80, rng, dtype=np.uint8, amplitude=180,
                          noise=30)
    p = tmp_path / "in.png"
    Image.fromarray(img, mode="L").save(p)
    return p, img


def test_cli_gray_roundtrip(tmp_path, gray_png):
    src, img = gray_png
    comp = tmp_path / "out.icer"
    back = tmp_path / "back.png"
    # -t 0 means quota = raw byte count (reference semantics), which can
    # truncate noisy images; pass a generous quota for a true lossless
    # round trip
    assert main(["compress", str(src), str(comp),
                 "-s", "3", "-f", "A", "-g", "4", "-G",
                 "-t", "40000"]) == 0
    assert comp.stat().st_size > 0
    assert main(["decompress", str(comp), str(back),
                 "-s", "3", "-f", "A", "-g", "4", "-G"]) == 0
    out = np.asarray(Image.open(back).convert("L"))
    assert np.array_equal(out, img)


def test_cli_quota_and_prefix(tmp_path, gray_png):
    src, img = gray_png
    comp = tmp_path / "out.icer"
    assert main(["compress", str(src), str(comp),
                 "-s", "3", "-f", "A", "-g", "4", "-G", "-t", "2000"]) == 0
    size = comp.stat().st_size
    assert size <= 2000
    back = tmp_path / "back.png"
    assert main(["decompress", str(comp), str(back),
                 "-s", "3", "-f", "A", "-g", "4", "-G"]) == 0
    # --prefix decodes a coarser image from a stream prefix
    pref = tmp_path / "pref.png"
    assert main(["decompress", str(comp), str(pref),
                 "-s", "3", "-f", "A", "-g", "4", "-G",
                 "--prefix", str(size // 2)]) == 0
    full = np.asarray(Image.open(back).convert("L")).astype(float)
    part = np.asarray(Image.open(pref).convert("L")).astype(float)
    ref = np.asarray(img, dtype=float)
    # the prefix reconstruction must be a strictly worse (or equal)
    # approximation than the full quota decode
    assert ((part - ref) ** 2).mean() >= ((full - ref) ** 2).mean()


def test_cli_color_roundtrip(tmp_path, rng):
    rgbs = np.stack([make_test_image(64, 72, rng, dtype=np.uint8,
                                     amplitude=200, noise=20)
                     for _ in range(3)], axis=-1)
    src = tmp_path / "in.png"
    Image.fromarray(rgbs, mode="RGB").save(src)
    comp = tmp_path / "out.icer"
    back = tmp_path / "back.png"
    assert main(["compress", str(src), str(comp),
                 "-s", "2", "-f", "A", "-g", "3", "-c",
                 "-t", "80000"]) == 0
    assert main(["decompress", str(comp), str(back),
                 "-s", "2", "-f", "A", "-g", "3", "-c"]) == 0
    out = np.asarray(Image.open(back).convert("RGB")).astype(int)
    # RGB<->YCbCr integer macros are lossy (color_util.h); bound the error
    assert np.abs(out - rgbs.astype(int)).max() <= 4


def test_cli_decompress_requires_mode(tmp_path, gray_png, capsys):
    src, _ = gray_png
    comp = tmp_path / "out.icer"
    assert main(["compress", str(src), str(comp), "-G"]) == 0
    assert main(["decompress", str(comp), str(tmp_path / "x.png")]) == 1


def test_cli_batch_serving_roundtrip(tmp_path, rng):
    """batch-compress / batch-decompress: the pipelined serving front-end
    produces streams byte-exact vs the single-path encoder and decodes
    pixel-exact vs the host decoder."""
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    ind = tmp_path / "in"
    outd = tmp_path / "enc"
    decd = tmp_path / "dec"
    ind.mkdir()
    imgs = {}
    for i in range(2):
        a = make_test_image(40, 48, rng, dtype=np.uint8,
                            amplitude=180, noise=30)
        imgs[f"img{i}"] = a
        Image.fromarray(a, "L").save(ind / f"img{i}.png")
    # no --batch-size: exercises the default (56, the tuned serving batch;
    # the encoder clamps to min(B, n_images))
    from icer_compression_tpu.cli import build_parser
    assert build_parser().get_default("batch_size") == 56
    assert main(["batch-compress", str(ind), str(outd),
                 "-s", "2", "-g", "2"]) == 0
    cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=40 * 48)
    for k, a in imgs.items():
        want = G.compress(a.astype(np.uint16), cfg)
        assert (outd / f"{k}.icer").read_bytes() == want, k
    assert main(["batch-decompress", str(outd), str(decd),
                 "-s", "2", "-g", "2", "--batch-size", "2"]) == 0
    for k in imgs:
        d = np.asarray(Image.open(decd / f"{k}.png"))
        want = np.clip(np.asarray(G.decompress(
            (outd / f"{k}.icer").read_bytes(), cfg, dtype=np.uint16)),
            0, 255).astype(np.uint8)
        assert np.array_equal(d, want), k


def test_cli_batch_serving_mixed_geometry(tmp_path, rng):
    """Mixed-size inputs bucket by geometry (VERDICT r4 item 8): each
    bucket reuses a shape-specialized program, streams stay byte-exact
    vs the per-image encoder and the decode side round-trips -- the
    reference CLI's any-file behavior (example/src/icer_util.c:123-246)
    at serving throughput."""
    from icer_compression_tpu.models import grayscale as G
    from icer_compression_tpu.models.grayscale import CodecConfig

    ind = tmp_path / "in"
    outd = tmp_path / "enc"
    decd = tmp_path / "dec"
    ind.mkdir()
    shapes = [(40, 48), (40, 48), (32, 32), (24, 40), (32, 32)]
    imgs = {}
    for i, (h, w) in enumerate(shapes):
        a = make_test_image(h, w, rng, dtype=np.uint8,
                            amplitude=180, noise=30)
        imgs[f"m{i}"] = a
        Image.fromarray(a, "L").save(ind / f"m{i}.png")
    assert main(["batch-compress", str(ind), str(outd),
                 "-s", "2", "-g", "2", "--batch-size", "2"]) == 0
    for k, a in imgs.items():
        h, w = a.shape
        cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=h * w)
        want = G.compress(a.astype(np.uint16), cfg)
        assert (outd / f"{k}.icer").read_bytes() == want, k
    assert main(["batch-decompress", str(outd), str(decd),
                 "-s", "2", "-g", "2", "--batch-size", "2"]) == 0
    for k, a in imgs.items():
        h, w = a.shape
        cfg = CodecConfig(stages=2, filt=0, segments=2, byte_quota=h * w)
        d = np.asarray(Image.open(decd / f"{k}.png"))
        want = np.clip(np.asarray(G.decompress(
            (outd / f"{k}.icer").read_bytes(), cfg, dtype=np.uint16)),
            0, 255).astype(np.uint8)
        assert np.array_equal(d, want), k


def test_cli_batch_serving_color(tmp_path, rng):
    """Color batch serving: streams byte-exact vs compress_yuv, decodes
    match the single-path color decoder within the RGB<->YCbCr macro
    loss bound."""
    from icer_compression_tpu.models import color as CL
    from icer_compression_tpu.models.grayscale import CodecConfig
    from icer_compression_tpu.utils.colorspace import rgb_to_ycbcr

    ind = tmp_path / "in"
    outd = tmp_path / "enc"
    decd = tmp_path / "dec"
    ind.mkdir()
    rgbs = {}
    for i in range(2):
        a = np.stack([make_test_image(32, 40, rng, dtype=np.uint8,
                                      amplitude=150, noise=40)
                      for _ in range(3)], axis=-1)
        rgbs[f"c{i}"] = a
        Image.fromarray(a, "RGB").save(ind / f"c{i}.png")
    assert main(["batch-compress", str(ind), str(outd), "-c",
                 "-s", "2", "-g", "2", "--batch-size", "2"]) == 0
    cfg = CodecConfig(stages=2, filt=0, segments=2,
                      byte_quota=32 * 40 * 3)
    for k, a in rgbs.items():
        y, u, v = (c.astype(np.uint16) for c in rgb_to_ycbcr(a))
        assert (outd / f"{k}.icer").read_bytes() == CL.compress_yuv(
            y, u, v, cfg), k
    assert main(["batch-decompress", str(outd), str(decd), "-c",
                 "-s", "2", "-g", "2", "--batch-size", "2"]) == 0
    from icer_compression_tpu.utils.colorspace import ycbcr_to_rgb
    for k in rgbs:
        d = np.asarray(Image.open(decd / f"{k}.png").convert("RGB"))
        # the quota truncates (lossy); exactness target is the
        # single-path color decoder, not the original pixels
        y, u, v = CL.decompress_yuv((outd / f"{k}.icer").read_bytes(),
                                    cfg, dtype=np.uint16)
        want = ycbcr_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
        assert np.array_equal(d, want), k
