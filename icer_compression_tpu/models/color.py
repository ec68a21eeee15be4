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


def compress_yuv_jax(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     config: CodecConfig) -> bytes:
    """Color compression on the TPU (XLA) pipeline.

    Three runs of the (cached, geometry-keyed) fused channel encoder --
    identical geometry, so one compile serves all channels -- followed by
    the shared host rate allocation.  Bit-identical to compress_yuv.
    """
    from .grayscale import _JAX_ENCODERS, allocate_from_table
    from ..ops.encode_jax import JaxGrayscaleEncoder

    if not (y.shape == u.shape == v.shape and y.dtype == u.dtype == v.dtype):
        raise IcerError(IcerStatus.INVALID_INPUT, "channel mismatch")
    mag_bits = _mag_bits(y.dtype)
    bitplanes = _bitplanes(mag_bits)
    h, w = y.shape
    key = (w, h, config.stages, config.filt, config.segments, mag_bits)
    enc = _JAX_ENCODERS.get(key)
    if enc is None:
        enc = JaxGrayscaleEncoder(w, h, config.stages, config.filt,
                                  config.segments, mag_bits)
        _JAX_ENCODERS[key] = enc

    # One device call for all three channels: the batched fused encoder
    # folds the channels into shared entropy kernel lane blocks.
    results = enc.encode_batch(np.stack([y, u, v]))
    table = {}
    ll_means = []
    for chan in range(3):
        raw, ll_mean = results[chan]
        ll_means.append(ll_mean)
        table.update({(chan,) + k: val for k, val in raw.items()})

    packets = sort_packets(build_packets_color(
        w, h, config.stages, ll_means, bitplanes))
    nsegs = {(p.decomp_level, p.subband_type): config.segments
             for p in packets}
    encoded = allocate_from_table(packets, table, config.byte_quota, nsegs,
                                  w, h)
    order = (rearrange_order_color_uint8(bitplanes) if mag_bits == 7
             else rearrange_order_color_uint16(bitplanes))
    return assemble_stream(encoded, order)


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
