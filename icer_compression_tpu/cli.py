"""Command-line interface, mirroring the reference CLI
(example/src/icer_util.c): compress / decompress with --stages, --filter,
--segments, --size, --color/--grayscale; bitstreams interoperate with the
reference binaries at matching parameters.

Extra over the reference: --backend {auto,native,jax,numpy} to select the encode
compute path (native host runtime, TPU XLA pipeline, or numpy), and --time to print phase timings.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .core.constants import FILTER_NAMES
from .core.header import get_image_dimensions
from .models import color as color_model
from .models import grayscale as gray_model
from .models.grayscale import CodecConfig
from .utils.colorspace import rgb_to_ycbcr, ycbcr_to_rgb
from .utils.image_io import load_image, save_image


def _parse_filter(s: str) -> int:
    s = s.upper()
    if s in FILTER_NAMES:
        return FILTER_NAMES.index(s)
    print(f"Invalid filter type: {s}. Using default filter A.",
          file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="icer-tpu",
        description="TPU-native ICER progressive wavelet image codec")
    p.add_argument("operation", choices=["compress", "decompress"])
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-s", "--stages", type=int, default=4)
    p.add_argument("-f", "--filter", default="A")
    p.add_argument("-g", "--segments", type=int, default=6)
    p.add_argument("-t", "--size", type=int, default=0,
                   help="target compressed size in bytes (0 = lossless "
                        "quota = raw byte count, like the reference CLI)")
    p.add_argument("-c", "--color", action="store_true")
    p.add_argument("-G", "--grayscale", action="store_true")
    p.add_argument("--backend", choices=["auto", "native", "jax", "numpy"],
                   default="auto")
    p.add_argument("--time", action="store_true", help="print phase timings")
    p.add_argument("--prefix", type=int, default=0, metavar="BYTES",
                   help="decompress only the first BYTES of the stream "
                        "(progressive preview: the ICER stream is "
                        "priority-ordered, so any prefix decodes to a "
                        "coarser image; 0 = whole stream)")
    return p


def _pick_backend(name: str) -> str:
    # auto = the native host runtime (fastest single-image path; compress()
    # itself falls back to the vectorized numpy coder if the C++ build is
    # unavailable).  The XLA/TPU pipeline is opt-in: it pays device
    # transfer + compile latency, which only amortizes over batches.
    if name == "auto":
        return "native"
    return name


def cmd_compress(args) -> int:
    force = True if args.color else (False if args.grayscale else None)
    arr, is_color = load_image(args.input, force)
    h, w = arr.shape[:2]
    raw = h * w * (3 if is_color else 1)
    quota = args.size if args.size > 0 else raw
    cfg = CodecConfig(stages=args.stages, filt=_parse_filter(args.filter),
                      segments=args.segments, byte_quota=quota)
    backend = _pick_backend(args.backend)
    t0 = time.time()
    if is_color:
        y, u, v = (c.astype(np.uint16) for c in rgb_to_ycbcr(arr))
        if backend == "jax":
            try:
                stream = color_model.compress_yuv_jax(y, u, v, cfg)
            except Exception as e:
                print(f"jax backend unavailable ({type(e).__name__}); "
                      "using native host runtime", file=sys.stderr)
                stream = color_model.compress_yuv(y, u, v, cfg)
        else:
            stream = color_model.compress_yuv(y, u, v, cfg)
    else:
        img = arr.astype(np.uint16)
        if backend == "jax":
            try:
                stream = gray_model.compress_jax(img, cfg)
            except Exception as e:
                print(f"jax backend unavailable ({type(e).__name__}); "
                      "using native host runtime", file=sys.stderr)
                stream = gray_model.compress(img, cfg)
        else:
            stream = gray_model.compress(img, cfg)
    dt = time.time() - t0
    with open(args.output, "wb") as f:
        f.write(stream)
    mode = "color (YUV)" if is_color else "grayscale"
    print(f"compressed {args.input} ({w}x{h}, {mode}) -> "
          f"{len(stream)} bytes ({100.0 * len(stream) / raw:.1f}% of raw)")
    if args.time:
        print(f"encode time: {dt:.3f}s ({w * h / dt / 1e6:.2f} MP/s)")
    return 0


def cmd_decompress(args) -> int:
    if not args.color and not args.grayscale:
        print("error: decompression requires --color or --grayscale",
              file=sys.stderr)
        return 1
    data = open(args.input, "rb").read()
    if args.prefix > 0:
        # progressive preview: the rearranged stream is quality-ordered,
        # so truncation degrades exactly like the reference's quota drop
        # (a partial trailing segment is skipped by the CRC scan)
        data = data[:args.prefix]
    dims = get_image_dimensions(data)
    if dims is None:
        print("error: no valid segments in stream", file=sys.stderr)
        return 1
    cfg = CodecConfig(stages=args.stages, filt=_parse_filter(args.filter),
                      segments=args.segments)
    backend = "python" if args.backend == "numpy" else args.backend
    t0 = time.time()
    if args.color:
        try:
            y, u, v = color_model.decompress_yuv(data, cfg,
                                                 dtype=np.uint16,
                                                 backend=backend)
        except Exception as e:
            if backend != "jax":
                raise
            print(f"jax backend unavailable ({type(e).__name__}); "
                  "using native host runtime", file=sys.stderr)
            y, u, v = color_model.decompress_yuv(data, cfg, dtype=np.uint16)
        arr = ycbcr_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
    else:
        try:
            arr = gray_model.decompress(data, cfg, dtype=np.uint16,
                                        backend=backend)
        except Exception as e:
            if backend != "jax":
                raise
            print(f"jax backend unavailable ({type(e).__name__}); "
                  "using native host runtime", file=sys.stderr)
            arr = gray_model.decompress(data, cfg, dtype=np.uint16)
        arr = np.clip(np.asarray(arr), 0, 255).astype(np.uint8)
    dt = time.time() - t0
    save_image(args.output, arr)
    h, w = arr.shape[:2]
    print(f"decompressed {args.input} -> {args.output} ({w}x{h})")
    if args.time:
        print(f"decode time: {dt:.3f}s ({w * h / dt / 1e6:.2f} MP/s)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.operation == "compress":
        return cmd_compress(args)
    return cmd_decompress(args)


if __name__ == "__main__":
    sys.exit(main())
