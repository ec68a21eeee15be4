"""Command-line interface, mirroring the reference CLI
(example/src/icer_util.c): compress / decompress with --stages, --filter,
--segments, --size, --color/--grayscale; bitstreams interoperate with the
reference binaries at matching parameters.

Extra over the reference: --backend {auto,native,jax,numpy} to select the
encode compute path (native host runtime, TPU XLA pipeline, or numpy),
--time for phase timings, and the serving-mode batch operations
(batch-compress / batch-decompress: B same-geometry images per fused
device program, K batches in flight -- the pipelined throughput mode as
a CLI front-end; on CPU-only hosts the decode kernels run in interpret
mode, slow but exact).
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
    p.add_argument("operation",
                   choices=["compress", "decompress",
                            "batch-compress", "batch-decompress"])
    p.add_argument("input",
                   help="input file; for batch operations a glob pattern "
                        "or directory of same-geometry images/streams")
    p.add_argument("output",
                   help="output file; for batch operations an output "
                        "directory")
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
    p.add_argument("--batch-size", type=int, default=56, metavar="B",
                   help="batch operations: images per device program "
                        "(default 56: at 6 segments the decode kernel's "
                        "1024-lane stage-1 block fills 1008/1024 with no "
                        "runt block, the best measured serving batch)")
    p.add_argument("--pipeline", type=int, default=4, metavar="K",
                   help="batch operations: device batches kept in "
                        "flight (default 4; 1 disables pipelining)")
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


def _expand_inputs(spec: str, default_glob: str) -> list[str]:
    import glob as globmod
    import os
    if os.path.isdir(spec):
        return sorted(globmod.glob(os.path.join(spec, default_glob)))
    return sorted(globmod.glob(spec))


def cmd_batch_compress(args) -> int:
    """Serving-mode encode of a set of same-geometry images: B images
    per fused device program with K batches in flight (the bench.py
    tpu_pipelined mode as a CLI front-end).  Mixed geometries group by
    shape; each group gets its own encoder.  With --color, the 3B YUV
    channel canvases of each batch fold into one device program
    (models.color.compress_yuv_batch)."""
    import os

    from .core.packets import (build_packets_grayscale,
                               rearrange_order_grayscale, sort_packets)
    from .models.grayscale import (allocate_from_table, assemble_stream,
                                   _bitplanes, _mag_bits)
    from .ops.encode_jax import JaxGrayscaleEncoder

    paths = _expand_inputs(args.input, "*.png")
    if not paths:
        print(f"error: no inputs match {args.input}", file=sys.stderr)
        return 1
    os.makedirs(args.output, exist_ok=True)
    B = max(1, args.batch_size)
    K = max(1, args.pipeline)
    filt = _parse_filter(args.filter)
    t0 = time.time()
    if args.color:
        return _batch_compress_color(args, paths, B, K, filt, t0)
    groups: dict[tuple, list[tuple[str, np.ndarray]]] = {}
    for path in paths:
        arr, _ = load_image(path, force_color=False)
        img = arr.astype(np.uint16)
        groups.setdefault(img.shape, []).append((path, img))

    total_px = total_bytes = nimg = 0
    for (h, w), items in groups.items():
        quota = args.size if args.size > 0 else h * w
        cfg = CodecConfig(stages=args.stages, filt=filt,
                          segments=args.segments, byte_quota=quota)
        mag_bits = _mag_bits(np.uint16)
        bitplanes = _bitplanes(mag_bits)
        enc = JaxGrayscaleEncoder(w, h, cfg.stages, cfg.filt,
                                  cfg.segments, mag_bits,
                                  batch=min(B, len(items)))
        order = rearrange_order_grayscale(bitplanes)

        def finish(res, chunk):
            for (table, ll), (path, _img) in zip(res, chunk):
                packets = sort_packets(build_packets_grayscale(
                    w, h, cfg.stages, ll, bitplanes))
                nsegs = {(p.decomp_level, p.subband_type): cfg.segments
                         for p in packets}
                t = {(0,) + k: v for k, v in table.items()}
                e = allocate_from_table(packets, t, cfg.byte_quota,
                                        nsegs, w, h)
                stream = assemble_stream(e, order)
                stem = os.path.splitext(os.path.basename(path))[0]
                out = os.path.join(args.output, stem + ".icer")
                with open(out, "wb") as f:
                    f.write(stream)
                nonlocal_totals[0] += len(stream)

        nonlocal_totals = [0]
        chunks = [items[i:i + B] for i in range(0, len(items), B)]
        pending: list[tuple] = []   # (collector, chunk)
        for chunk in chunks:
            imgs = np.stack([im for _, im in chunk])
            hold = enc.encode_batch(imgs, defer=True)
            pending.append((hold, chunk))
            if len(pending) >= K:
                hd, ch = pending.pop(0)
                finish(hd(), ch)
        for hd, ch in pending:
            finish(hd(), ch)
        total_px += h * w * len(items)
        total_bytes += nonlocal_totals[0]
        nimg += len(items)
    dt = time.time() - t0
    print(f"batch-compressed {nimg} images -> {args.output} "
          f"({total_bytes} bytes, {100.0 * total_bytes / (2 * total_px):.1f}"
          "% of raw)")
    if args.time:
        print(f"encode time: {dt:.3f}s ({total_px / dt / 1e6:.2f} MP/s)")
    return 0


def _batch_compress_color(args, paths, B, K, filt, t0) -> int:
    import os

    from .models.color import compress_yuv_batch

    groups: dict[tuple, list[tuple[str, tuple]]] = {}
    for path in paths:
        arr, _ = load_image(path, force_color=True)
        yuv = tuple(c.astype(np.uint16) for c in rgb_to_ycbcr(arr))
        groups.setdefault(yuv[0].shape, []).append((path, yuv))

    total_px = total_bytes = nimg = 0
    for (h, w), items in groups.items():
        quota = args.size if args.size > 0 else h * w * 3
        cfg = CodecConfig(stages=args.stages, filt=filt,
                          segments=args.segments, byte_quota=quota)

        def save(streams, chunk):
            nonlocal total_bytes
            for stream, (path, _yuv) in zip(streams, chunk):
                stem = os.path.splitext(os.path.basename(path))[0]
                with open(os.path.join(args.output, stem + ".icer"),
                          "wb") as f:
                    f.write(stream)
                total_bytes += len(stream)

        chunks = [items[i:i + B] for i in range(0, len(items), B)]
        pending = []
        for chunk in chunks:
            hold = compress_yuv_batch([c[1][0] for c in chunk],
                                      [c[1][1] for c in chunk],
                                      [c[1][2] for c in chunk],
                                      cfg, defer=True)
            pending.append((hold, chunk))
            if len(pending) >= K:
                hd, ch = pending.pop(0)
                save(hd(), ch)
        for hd, ch in pending:
            save(hd(), ch)
        total_px += h * w * len(items)
        nimg += len(items)
    dt = time.time() - t0
    print(f"batch-compressed {nimg} color images -> {args.output} "
          f"({total_bytes} bytes, "
          f"{100.0 * total_bytes / (6 * total_px):.1f}% of raw)")
    if args.time:
        print(f"encode time: {dt:.3f}s ({total_px / dt / 1e6:.2f} MP/s)")
    return 0


def cmd_batch_decompress(args) -> int:
    """Serving-mode decode of a set of .icer streams: the lane-batched
    fused decoder with K batches in flight; outputs PNGs.  With --color
    all 3B channel canvases of a batch decode in one device program."""
    import os

    from .models.decode_jax import (decompress_lanes_batch,
                                    decompress_yuv_lanes_batch)

    paths = _expand_inputs(args.input, "*.icer")
    if not paths:
        print(f"error: no inputs match {args.input}", file=sys.stderr)
        return 1
    os.makedirs(args.output, exist_ok=True)
    B = max(1, args.batch_size)
    K = max(1, args.pipeline)
    cfg = CodecConfig(stages=args.stages, filt=_parse_filter(args.filter),
                      segments=args.segments)
    t0 = time.time()
    groups: dict[tuple, list[tuple[str, bytes]]] = {}
    for path in paths:
        data = open(path, "rb").read()
        if args.prefix > 0:
            data = data[:args.prefix]
        dims = get_image_dimensions(data)
        if dims is None:
            print(f"warning: no valid segments in {path}; skipped",
                  file=sys.stderr)
            continue
        groups.setdefault(dims, []).append((path, data))

    def save(imgs, chunk):
        for img, (path, _d) in zip(imgs, chunk):
            if args.color:
                y, u, v = img
                arr = ycbcr_to_rgb(np.asarray(y), np.asarray(u),
                                   np.asarray(v))
            else:
                arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
            stem = os.path.splitext(os.path.basename(path))[0]
            save_image(os.path.join(args.output, stem + ".png"), arr)

    decode = (decompress_yuv_lanes_batch if args.color
              else decompress_lanes_batch)
    nimg = total_px = 0
    for (w, h), items in groups.items():
        chunks = [items[i:i + B] for i in range(0, len(items), B)]
        pending = []
        for chunk in chunks:
            hold = decode([d for _, d in chunk], cfg,
                          dtype=np.uint16, defer=True, pack8=True)
            pending.append((hold, chunk))
            if len(pending) >= K:
                hd, ch = pending.pop(0)
                save(hd(), ch)
        for hd, ch in pending:
            save(hd(), ch)
        nimg += len(items)
        total_px += w * h * len(items)
    dt = time.time() - t0
    print(f"batch-decompressed {nimg} streams -> {args.output}")
    if args.time:
        print(f"decode time: {dt:.3f}s ({total_px / dt / 1e6:.2f} MP/s)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.operation == "compress":
        return cmd_compress(args)
    if args.operation == "batch-compress":
        return cmd_batch_compress(args)
    if args.operation == "batch-decompress":
        return cmd_batch_decompress(args)
    return cmd_decompress(args)


if __name__ == "__main__":
    sys.exit(main())
