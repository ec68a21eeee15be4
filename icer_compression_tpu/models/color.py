"""Color (YUV) ICER codec.

Mirrors icer_compress_image_yuv_uint8/uint16 and the matching decoders
(lib_icer/src/icer_color.c): the grayscale pipeline applied per channel,
with a shared rate-allocation loop over a 3-channel packet list (Y packets
get the cumulative priority doubling of icer_color.c:404), the channel id
packed into the header's lsb_chan nibble, and format-version-specific
stream rearrangement orders (uint8: ascending, icer_color.c:186-203;
uint16: descending, icer_color.c:510-527).
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from ..core.header import SegmentHeader, scan_bytestream
from ..core.packets import (build_packets_color, rearrange_order_color_uint8,
                            rearrange_order_color_uint16, sort_packets)
from ..core.partition import partition_segments
from ..core.status import IcerError, IcerStatus
from ..core.subbands import dim_low, subband_view
from ..ops import wavelet
from .grayscale import (CodecConfig, _bitplanes, _mag_bits, assemble_stream,
                        encode_plane_payload, reconstruct_channel,
                        transform_for_encode)


def compress_yuv(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 config: CodecConfig,
                 encode_plane=encode_plane_payload,
                 backend: str = "auto") -> bytes:
    """Compress three equally-sized channel planes into one stream."""
    if not (y.shape == u.shape == v.shape and y.dtype == u.dtype == v.dtype):
        raise IcerError(IcerStatus.INVALID_INPUT, "channel mismatch")
    mag_bits = _mag_bits(y.dtype)
    bitplanes = _bitplanes(mag_bits)
    h, w = y.shape

    chans = []
    ll_means = []
    for plane in (y, u, v):
        img, ll_mean = transform_for_encode(plane, config.stages,
                                            config.filt, mag_bits)
        chans.append(img)
        ll_means.append(ll_mean)

    if (encode_plane is encode_plane_payload
            and backend in ("auto", "native")):
        from ..backend import native_backend
        if native_backend.available():
            from .grayscale import _encode_allocate_native_tranches
            packets = sort_packets(build_packets_color(
                w, h, config.stages, ll_means, bitplanes))
            encoded = _encode_allocate_native_tranches(
                None, packets, config, mag_bits, bitplanes, w, h,
                channel_views={c: chans[c] for c in range(3)})
            order = (rearrange_order_color_uint8(bitplanes) if mag_bits == 7
                     else rearrange_order_color_uint16(bitplanes))
            return assemble_stream(encoded, order)

    packets = sort_packets(build_packets_color(
        w, h, config.stages, ll_means, bitplanes))

    quota = config.byte_quota
    size_used = 0
    encoded: dict[tuple, tuple[SegmentHeader, bytes]] = {}
    stop = False
    for pkt in packets:
        view = subband_view(w, h, pkt.decomp_level, pkt.subband_type)
        sub = chans[pkt.channel][view.row:view.row + view.h,
                                 view.col:view.col + view.w]
        rects = partition_segments(view.w, view.h, config.segments)
        for rect in rects:
            if quota is not None and quota - size_used < C.HEADER_SIZE:
                stop = True
                break
            seg_data = sub[rect.row:rect.row + rect.h,
                           rect.col:rect.col + rect.w]
            payload, nbits = encode_plane(seg_data, pkt.subband_type,
                                          pkt.lsb, mag_bits)
            if quota is not None:
                max_out = quota - size_used - C.HEADER_SIZE
                if nbits >= 8 * max_out:
                    stop = True
                    break
            hdr = SegmentHeader(
                ll_mean_val=pkt.ll_mean_val, decomp_level=pkt.decomp_level,
                subband_type=pkt.subband_type, segment_number=rect.index,
                lsb=pkt.lsb, channel=pkt.channel, image_w=w, image_h=h,
                data_length=nbits)
            encoded[(pkt.channel, pkt.decomp_level, pkt.subband_type,
                     pkt.lsb, rect.index)] = (hdr, payload)
            size_used += C.HEADER_SIZE + hdr.payload_bytes
        if stop:
            break

    order = (rearrange_order_color_uint8(bitplanes) if mag_bits == 7
             else rearrange_order_color_uint16(bitplanes))
    return assemble_stream(encoded, order)


_YUV_QUOTA_CLASSES: dict[tuple, list] = {}


def _yuv_quota_classes(w: int, h: int, stages: int, bitplanes: int):
    """Priority-prefix classes for quota-aware color TPU encoding.

    Like grayscale's (models/grayscale._jax_quota_classes) but over the
    color packet order (Y-priority doubling included).  All three
    channels share one batched encoder, so a class's per-stage cut is
    the lowest lsb ANY channel's prefix packet needs -- a superset for
    U/V (Y's boosted priorities reach deeper), which only costs some
    extra encoded-but-unallocated planes.
    """
    cached = _YUV_QUOTA_CLASSES.get((w, h, stages, bitplanes))
    if cached is not None:
        return cached
    from ..ops.encode_jax import PLANE_MASS
    packets = sort_packets(build_packets_color(
        w, h, stages, [0, 0, 0], bitplanes))
    npk = len(packets)
    mass = PLANE_MASS[:bitplanes]
    mass = [m / sum(mass) for m in mass]
    per_lsb_packets = max(1, npk // bitplanes)
    classes, seen = [], set()
    cum = 0.0
    bounds = [1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0]
    bi = 0
    cuts = [bitplanes] * stages
    for i, p in enumerate(packets):
        cum += mass[p.lsb] / per_lsb_packets
        cuts[p.decomp_level - 1] = min(cuts[p.decomp_level - 1], p.lsb)
        last = i + 1 == npk
        if bi < len(bounds) and (cum >= bounds[bi] or last):
            while bi < len(bounds) and cum >= bounds[bi]:
                bi += 1
            t = tuple(cuts)
            if t not in seen:
                seen.add(t)
                classes.append((min(cum, 1.0), t))
    if classes[-1][1] != (0,) * stages:
        classes.append((1.0, (0,) * stages))
    _YUV_QUOTA_CLASSES[(w, h, stages, bitplanes)] = classes
    return classes


def compress_yuv_jax(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     config: CodecConfig) -> bytes:
    """Color compression on the TPU (XLA) pipeline.

    One batched run of the (cached, geometry-keyed) fused channel
    encoder per quota class -- identical geometry, so one compile
    serves all channels -- followed by the shared host rate allocation.
    At constraining quotas only the priority-prefix planes are encoded
    (delta escalation, like grayscale compress_jax).  Bit-identical to
    compress_yuv.
    """
    from .grayscale import _JAX_ENCODERS, allocate_from_table
    from ..ops.encode_jax import JaxGrayscaleEncoder

    if not (y.shape == u.shape == v.shape and y.dtype == u.dtype == v.dtype):
        raise IcerError(IcerStatus.INVALID_INPUT, "channel mismatch")
    mag_bits = _mag_bits(y.dtype)
    bitplanes = _bitplanes(mag_bits)
    h, w = y.shape

    quota = config.byte_quota
    classes = _yuv_quota_classes(w, h, config.stages, bitplanes)
    if quota is None:
        ci = len(classes) - 1
    else:
        want = min(1.0, 1.7 * quota / max(1, 3 * 0.65 * h * w))
        ci = next((i for i, (frac, _) in enumerate(classes)
                   if frac >= want), len(classes) - 1)

    def get_encoder(windows):
        if all(lo == 0 and hi == bitplanes for lo, hi in windows):
            key = (w, h, config.stages, config.filt, config.segments,
                   mag_bits)
        else:
            key = (w, h, config.stages, config.filt, config.segments,
                   mag_bits, windows)
        enc = _JAX_ENCODERS.get(key)
        if enc is None:
            enc = JaxGrayscaleEncoder(w, h, config.stages, config.filt,
                                      config.segments, mag_bits,
                                      plane_cuts=windows)
            _JAX_ENCODERS[key] = enc
        return enc

    # Delta escalation (see grayscale.compress_jax): each step encodes
    # only the planes the previous classes did not; one batched device
    # call covers all three channels per step.
    table: dict = {}
    prev = (bitplanes,) * config.stages
    ll_means = [0, 0, 0]
    packets = nsegs = None
    stacked = np.stack([y, u, v])
    while True:
        cuts = classes[ci][1]
        windows = tuple((lo, hi) for lo, hi in zip(cuts, prev))
        if any(lo < hi for lo, hi in windows):
            results = get_encoder(windows).encode_batch(stacked)
            for chan in range(3):
                raw, ll_mean = results[chan]
                ll_means[chan] = ll_mean
                table.update({(chan,) + k: val for k, val in raw.items()})
            prev = tuple(min(a, b) for a, b in zip(cuts, prev))
        if packets is None:   # ll_means fixed by the channel transforms
            packets = sort_packets(build_packets_color(
                w, h, config.stages, ll_means, bitplanes))
            nsegs = {(p.decomp_level, p.subband_type): config.segments
                     for p in packets}
        try:
            encoded = allocate_from_table(packets, table, quota, nsegs,
                                          w, h)
            break
        except KeyError:
            if ci + 1 >= len(classes):
                raise
            ci += 1
    order = (rearrange_order_color_uint8(bitplanes) if mag_bits == 7
             else rearrange_order_color_uint16(bitplanes))
    return assemble_stream(encoded, order)


def compress_yuv_batch(ys, us, vs, config: CodecConfig,
                       defer: bool = False):
    """Batched color compression on the TPU pipeline (serving mode).

    ``ys``/``us``/``vs``: B same-geometry channel canvases each (arrays
    or lists of (h, w)).  All 3B canvases encode in ONE fused device
    program -- channels fold into the batch axis, exactly like the
    sharded color encoder (parallel/sharded.ShardedColorEncoder) -- and
    rate allocation + stream assembly run host-side per image.  Returns
    one stream per image, bit-identical to compress_yuv.  With ``defer``
    returns a zero-arg collector (pipelining), like encode_batch.
    """
    from .grayscale import _JAX_ENCODERS, allocate_from_table
    from ..ops.encode_jax import JaxGrayscaleEncoder

    ys, us, vs = (np.stack(c) for c in (ys, us, vs))
    if not (ys.shape == us.shape == vs.shape
            and ys.dtype == us.dtype == vs.dtype):
        raise IcerError(IcerStatus.INVALID_INPUT, "channel mismatch")
    B, h, w = ys.shape
    mag_bits = _mag_bits(ys.dtype)
    bitplanes = _bitplanes(mag_bits)
    quota = config.byte_quota

    key = (w, h, config.stages, config.filt, config.segments, mag_bits,
           3 * B)
    enc = _JAX_ENCODERS.get(key)
    if enc is None:
        enc = JaxGrayscaleEncoder(w, h, config.stages, config.filt,
                                  config.segments, mag_bits, batch=3 * B)
        _JAX_ENCODERS[key] = enc

    stacked = np.concatenate([ys, us, vs])      # channel-major (3B, h, w)
    res = enc.encode_batch(stacked, defer=defer)
    order = (rearrange_order_color_uint8(bitplanes) if mag_bits == 7
             else rearrange_order_color_uint16(bitplanes))

    def finish(results):
        streams = []
        for i in range(B):
            ll_means = [results[c * B + i][1] for c in range(3)]
            table = {(c,) + k: v for c in range(3)
                     for k, v in results[c * B + i][0].items()}
            packets = sort_packets(build_packets_color(
                w, h, config.stages, ll_means, bitplanes))
            nsegs = {(p.decomp_level, p.subband_type): config.segments
                     for p in packets}
            encoded = allocate_from_table(packets, table, quota, nsegs,
                                          w, h)
            streams.append(assemble_stream(encoded, order))
        return streams

    if defer:
        return lambda: finish(res())
    return finish(res)


def decompress_yuv(data: bytes, config: CodecConfig, dtype=np.uint16,
                   decode_partition=None, max_pixels: int | None = None,
                   backend: str = "auto"):
    """Decompress a color stream into (y, u, v) planes.

    ``max_pixels`` (default grayscale.DEFAULT_MAX_PIXELS) bounds the
    allocation implied by the untrusted header dimensions.  backend
    "jax" routes to the lane-batched TPU decoder
    (models/decode_jax.decompress_yuv_lanes); otherwise the native /
    python host path."""
    from .grayscale import DEFAULT_MAX_PIXELS, _check_decode_dims
    if max_pixels is None:
        max_pixels = DEFAULT_MAX_PIXELS
    if backend == "jax":
        from .decode_jax import decompress_yuv_lanes
        return decompress_yuv_lanes(data, config, dtype=dtype,
                                    backend="pallas",
                                    max_pixels=max_pixels)
    mag_bits = _mag_bits(dtype)
    bitplanes = _bitplanes(mag_bits)

    found = scan_bytestream(data, with_offsets=True, with_payload=False)
    if not found:
        raise IcerError(IcerStatus.DECODER_OUT_OF_DATA, "no valid segments")

    table: dict[tuple, tuple[int, int]] = {}
    w = h = 0
    ll_means = [0, 0, 0]
    for hdr, _payload, off in found:
        table[(hdr.channel, hdr.decomp_level, hdr.subband_type,
               hdr.segment_number, hdr.lsb)] = (off, hdr.data_length)
        w, h = hdr.image_w, hdr.image_h
        ll_means[hdr.channel] = hdr.ll_mean_val

    _check_decode_dims(w, h, max_pixels)
    out = []
    ll_w = dim_low(w, config.stages)
    ll_h = dim_low(h, config.stages)
    for chan in range(3):
        img = np.zeros((h, w), dtype=np.int32)
        reconstruct_channel(img, table, chan, config, mag_bits, bitplanes,
                            decode_partition, backend=backend, stream=data)
        img = np.asarray(wavelet.from_sign_magnitude(img, mag_bits))
        img[:ll_h, :ll_w] = wavelet._wrap(
            img[:ll_h, :ll_w] + ll_means[chan], mag_bits, np)
        from .grayscale import inverse_transform
        img = inverse_transform(img, config.stages, config.filt, mag_bits)
        img[img < 0] = 0
        out.append(img.astype(dtype))
    return tuple(out)
