"""Grayscale ICER codec: full encode/decode pipelines.

Pipeline parity targets:
  encode -> icer_compress_image_uint8/uint16 (icer_compress.c:18-166,
  279-426); decode -> icer_decompress_image_uint8/uint16
  (icer_compress.c:168-274, 430-537).

Encode backends (all byte-identical): "native" (default; C++ runtime with
fused pixel-loop context modelling + interleaved coder, threaded over
segments, native threaded DWT), compress_jax (the XLA/TPU pipeline), and
the per-plane vectorized numpy path (the TPU algorithm prototype; also the
route for custom ``encode_plane`` hooks).  Decode uses the native
multithreaded segment decoder with a pure-python reference fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import constants as C
from ..core.header import SegmentHeader, scan_bytestream
from ..core.packets import (PacketContext, build_packets_grayscale,
                            rearrange_order_grayscale, sort_packets)
from ..core.partition import partition_segments
from ..core.status import IcerError, IcerStatus
from ..core.subbands import decode_subband_order, dim_low, subband_view
from ..ops import entropy_vec, wavelet
from ..ops.context_model import plane_emissions
from ..backend import sequential
from ..backend.decode_plane import decode_segment_planes


@dataclass
class CodecConfig:
    stages: int = 4
    filt: int = C.FILTER_A
    segments: int = 6
    byte_quota: int | None = None  # None = unlimited ("pure" lossless)


def _mag_bits(dtype) -> int:
    dt = np.dtype(dtype)
    if dt == np.uint8:
        return 7
    if dt == np.uint16:
        return 15
    raise IcerError(IcerStatus.INVALID_INPUT, f"unsupported dtype {dt}")


def _bitplanes(mag_bits: int) -> int:
    return C.BITPLANES_8 if mag_bits == 7 else C.BITPLANES_16


def encode_plane_payload(seg_data: np.ndarray, subband_type: int, lsb: int,
                         mag_bits: int):
    """One segment-plane: vectorized pass-1 + vectorized entropy coding.

    The data-parallel coder handles everything except the rare mid-plane
    codeword-buffer flush, which it detects exactly and delegates to the
    sequential reference coder.  Returns (payload bytes, bit_length).
    """
    valid, ctx, bit = plane_emissions(seg_data, subband_type, lsb, mag_bits)
    out = entropy_vec.encode_emissions_vec(valid, ctx, bit)
    if out is None:
        payload, nbits, _ = sequential.encode_emissions(valid, ctx, bit)
        return payload, nbits
    return out


def encode_plane_payload_sequential(seg_data: np.ndarray, subband_type: int,
                                    lsb: int, mag_bits: int):
    """Reference path: sequential entropy coding (differential anchor)."""
    valid, ctx, bit = plane_emissions(seg_data, subband_type, lsb, mag_bits)
    payload, nbits, _ = sequential.encode_emissions(valid, ctx, bit)
    return payload, nbits


def transform_for_encode(image: np.ndarray, stages: int, filt: int,
                         mag_bits: int):
    """DWT + LL mean removal + sign-magnitude.  Returns (array, ll_mean)."""
    h, w = image.shape
    wavelet.check_stages(w, h, stages)
    img = np.ascontiguousarray(image, dtype=np.int32)
    from ..backend import native_backend
    if native_backend.available():
        overflow = native_backend.dwt_native(img, stages, filt, mag_bits)
    else:
        img, overflow = wavelet.forward_stages(img, stages, filt, mag_bits)
        img = np.asarray(img)
    if overflow:
        raise IcerError(IcerStatus.INTEGER_OVERFLOW, "wavelet transform")

    ll_w = dim_low(w, stages)
    ll_h = dim_low(h, stages)
    # The reference sums the raw (unsigned-reinterpreted) sample words
    # (icer_compress.c:289-299); LL values are non-negative here so the two
    # agree, but we reproduce the unsigned view for exactness.
    sample_mask = (1 << (mag_bits + 1)) - 1
    ll = img[:ll_h, :ll_w]
    ll_mean = int((ll & sample_mask).astype(np.uint64).sum() // (ll_w * ll_h))
    if ll_mean > (1 << mag_bits) - 1:
        raise IcerError(IcerStatus.INTEGER_OVERFLOW, "ll mean")
    img[:ll_h, :ll_w] = wavelet._wrap(ll - ll_mean, mag_bits, np)
    img = np.asarray(wavelet.to_sign_magnitude(img, mag_bits))
    return img, ll_mean


def all_subbands(stages: int):
    """Every (stage, subband) of an N-stage decomposition."""
    out = []
    for stage in range(1, stages + 1):
        if stage == stages:
            out.append((stage, C.SUBBAND_LL))
        out.append((stage, C.SUBBAND_HL))
        out.append((stage, C.SUBBAND_LH))
        out.append((stage, C.SUBBAND_HH))
    return out


def encode_channel_native(img_t: np.ndarray, config: CodecConfig,
                          mag_bits: int, bitplanes: int) -> dict:
    """All (stage, subband, lsb, seg) payloads of one transformed channel
    via the native runtime (fused pixel-loop modelling + entropy, threaded
    over segments)."""
    from ..backend import native_backend

    h, w = img_t.shape
    tasks = []
    keys = []
    for (stage, subband) in all_subbands(config.stages):
        view = subband_view(w, h, stage, subband)
        for rect in partition_segments(view.w, view.h, config.segments):
            tasks.append({
                "seg_off": (view.row + rect.row) * w + (view.col + rect.col),
                "h": rect.h, "w": rect.w, "rowstride": w,
                "subband": subband, "mag_bits": mag_bits,
            })
            keys.append((stage, subband, rect.index))
    img_c = np.ascontiguousarray(img_t, dtype=np.int32)
    out, bits = native_backend.encode_segments_native(img_c, tasks, bitplanes)
    table = {}
    for i, (stage, subband, seg) in enumerate(keys):
        for lsb in range(bitplanes):
            r = i * bitplanes + lsb
            nb = int(bits[r])
            table[(stage, subband, lsb, seg)] = (
                out[r, : (nb + 7) // 8].tobytes(), nb)
    return table


def compress(image: np.ndarray, config: CodecConfig,
             encode_plane=encode_plane_payload,
             backend: str = "auto") -> bytes:
    """Compress a grayscale image to an ICER bytestream.

    backend "auto"/"native" uses the C++ runtime (fused context modelling +
    entropy, threaded over segments); "vectorized" uses the numpy
    data-parallel path (the TPU algorithm prototype).  A custom
    ``encode_plane`` forces the per-plane path.

    Depth note (matches the reference): uint16 inputs code only the
    BITPLANES_16 = 9 least-significant magnitude bitplanes of the
    transformed coefficients (icer.h:44-46); wavelet magnitudes above
    bit 9 -- possible when pixel values approach 2^15 on high-frequency
    content -- silently lose their MSBs on decode, exactly as
    lib_icer does.  Round-trips are lossless for typical <= 14-bit
    content; pinned against the C oracle in
    tests/test_extremes.py::test_deep_uint16_msb_loss_matches_oracle.
    """
    mag_bits = _mag_bits(image.dtype)
    bitplanes = _bitplanes(mag_bits)
    h, w = image.shape

    if (encode_plane is encode_plane_payload
            and backend in ("auto", "native")):
        from ..backend import native_backend
        if native_backend.available():
            img, ll_mean = transform_for_encode(
                image, config.stages, config.filt, mag_bits)
            packets = sort_packets(build_packets_grayscale(
                w, h, config.stages, ll_mean, bitplanes))
            encoded = _encode_allocate_native_tranches(
                img, packets, config, mag_bits, bitplanes, w, h)
            return assemble_stream(encoded,
                                   rearrange_order_grayscale(bitplanes))
        if backend == "native":
            raise RuntimeError("native runtime unavailable")

    img, ll_mean = transform_for_encode(image, config.stages, config.filt,
                                        mag_bits)

    packets = sort_packets(build_packets_grayscale(
        w, h, config.stages, ll_mean, bitplanes))

    quota = config.byte_quota
    size_used = 0
    # encoded[(chan, stage, subband, lsb, seg)] = (header, payload)
    encoded: dict[tuple, tuple[SegmentHeader, bytes]] = {}

    stop = False
    for pkt in packets:
        view = subband_view(w, h, pkt.decomp_level, pkt.subband_type)
        sub = img[view.row:view.row + view.h, view.col:view.col + view.w]
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
                    # Mid-plane quota hit: the reference releases this
                    # packet's header and stops encoding entirely
                    # (icer_partition.c:323-326, icer_compress.c:404).
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

    return assemble_stream(encoded, rearrange_order_grayscale(bitplanes))


def _encode_allocate_native_tranches(img_t: np.ndarray, packets, config,
                                     mag_bits: int, bitplanes: int,
                                     w: int, h: int,
                                     channel_views=None) -> dict:
    """Quota-aware native encode: packets in priority order, early stop.

    The reference stops coding the moment the quota is hit
    (icer_compress.c:404, icer_partition.c:323-326); encoding every plane
    first and truncating afterwards wastes ~3x the work at small quotas.
    This walks the sorted packet list in tranches of geometrically growing
    size (each packet = one (stage, subband, lsb) x segments batch of
    single-plane native tasks), interleaving exact allocation so encoding
    halts at the same packet the reference does.  Streams are byte-
    identical to the full-encode + allocate_from_table path at any quota.

    ``channel_views``: optional {channel: transformed image} for the color
    path (packets then carry the channel); ``img_t`` is ignored if given.
    """
    from ..backend import native_backend

    views = channel_views if channel_views is not None else {0: img_t}
    quota = config.byte_quota
    npk = len(packets)
    if quota is None:
        k0 = npk
    else:
        k0 = max(8, min(npk, (npk * quota) // max(1, h * w)))

    rect_cache: dict[tuple, list] = {}

    def rects_of(pkt):
        key = (pkt.decomp_level, pkt.subband_type)
        r = rect_cache.get(key)
        if r is None:
            view = subband_view(w, h, pkt.decomp_level, pkt.subband_type)
            r = (view, partition_segments(view.w, view.h, config.segments))
            rect_cache[key] = r
        return r

    encoded: dict[tuple, tuple[SegmentHeader, bytes]] = {}
    size_used = 0
    i = 0
    k = k0
    while i < npk:
        tranche = packets[i:i + k]
        i += k
        k *= 2
        tasks = []
        tmeta = []
        for pkt in tranche:
            view, rects = rects_of(pkt)
            for rect in rects:
                tasks.append({
                    "seg_off": ((view.row + rect.row) * w
                                + (view.col + rect.col)),
                    "h": rect.h, "w": rect.w, "rowstride": w,
                    "subband": pkt.subband_type, "mag_bits": mag_bits,
                    "lsb0": pkt.lsb,
                })
                tmeta.append((pkt, rect))
        img_c = views[tranche[0].channel]
        if channel_views is not None and any(
                p.channel != tranche[0].channel for p in tranche):
            # mixed-channel tranche: encode per channel
            out = np.empty((len(tasks), 0), dtype=np.uint8)
            outs = [None] * len(tasks)
            bits = np.zeros(len(tasks), dtype=np.int64)
            for chan, view_img in views.items():
                idxs = [j for j, (p, _) in enumerate(tmeta)
                        if p.channel == chan]
                if not idxs:
                    continue
                o, b = native_backend.encode_segments_native(
                    view_img, [tasks[j] for j in idxs], 1)
                for r, j in enumerate(idxs):
                    outs[j] = o[r]
                    bits[j] = b[r]
        else:
            out, bits = native_backend.encode_segments_native(
                img_c, tasks, 1)
            outs = list(out)
        for j, (pkt, rect) in enumerate(tmeta):
            if quota is not None and quota - size_used < C.HEADER_SIZE:
                return encoded
            nbits = int(bits[j])
            if quota is not None:
                max_out = quota - size_used - C.HEADER_SIZE
                if nbits >= 8 * max_out:
                    return encoded
            hdr = SegmentHeader(
                ll_mean_val=pkt.ll_mean_val, decomp_level=pkt.decomp_level,
                subband_type=pkt.subband_type, segment_number=rect.index,
                lsb=pkt.lsb, channel=pkt.channel, image_w=w, image_h=h,
                data_length=nbits)
            encoded[(pkt.channel, pkt.decomp_level, pkt.subband_type,
                     pkt.lsb, rect.index)] = (
                hdr, outs[j][: (nbits + 7) // 8].tobytes())
            size_used += C.HEADER_SIZE + hdr.payload_bytes
    return encoded


def allocate_from_table(packets, payload_table: dict, quota,
                        segments_per_subband: dict, image_w: int,
                        image_h: int):
    """Greedy rate allocation over fully-encoded payloads.

    packets: sorted PacketContext list; payload_table maps
    (chan, stage, subband, lsb, seg) -> (payload, nbits).  Reproduces the
    reference's in-order truncation (header release + stop-all on quota,
    icer_partition.c:323-326, icer_compress.c:404).  Returns the encoded
    dict for assemble_stream.
    """
    size_used = 0
    encoded: dict[tuple, tuple[SegmentHeader, bytes]] = {}
    for pkt in packets:
        nsegs = segments_per_subband[(pkt.decomp_level, pkt.subband_type)]
        for seg in range(nsegs):
            if quota is not None and quota - size_used < C.HEADER_SIZE:
                return encoded
            payload, nbits = payload_table[
                (pkt.channel, pkt.decomp_level, pkt.subband_type, pkt.lsb,
                 seg)]
            if quota is not None:
                max_out = quota - size_used - C.HEADER_SIZE
                if nbits >= 8 * max_out:
                    return encoded
            hdr = SegmentHeader(
                ll_mean_val=pkt.ll_mean_val, decomp_level=pkt.decomp_level,
                subband_type=pkt.subband_type, segment_number=seg,
                lsb=pkt.lsb, channel=pkt.channel, image_w=image_w,
                image_h=image_h, data_length=nbits)
            encoded[(pkt.channel, pkt.decomp_level, pkt.subband_type,
                     pkt.lsb, seg)] = (hdr, payload)
            size_used += C.HEADER_SIZE + hdr.payload_bytes
    return encoded


_JAX_ENCODERS: dict[tuple, object] = {}


# Byte-mass share of bitplane lsb: single source of truth lives next to
# its other consumer (the per-plane payload caps) in ops/encode_jax.
from ..ops.encode_jax import PLANE_MASS as _PLANE_MASS  # noqa: E402


_QUOTA_CLASSES: dict[tuple, list] = {}


def _jax_quota_classes(w: int, h: int, stages: int, bitplanes: int):
    """Priority-prefix classes for quota-aware TPU encoding.

    The packet priority order is a pure function of (stage, subband,
    lsb), so the prefix of packets a byte quota can admit is static up
    to the (data-dependent) payload sizes.  Prefix boundaries are placed
    where the _PLANE_MASS byte model crosses geometric fractions (byte
    mass is tail-heavy: half the packets carry <10% of the bytes, so
    count-based prefixes would make every mid-range quota escalate).
    Returns [(model_fraction, cuts)]; cuts[gi] is the lowest lsb any
    prefix packet needs from stage-group gi -- the encoder then skips
    all lower planes (the reference stops coding at the quota,
    icer_compress.c:404; this is the lane-masked equivalent).
    """
    cached = _QUOTA_CLASSES.get((w, h, stages, bitplanes))
    if cached is not None:
        return cached
    packets = sort_packets(build_packets_grayscale(w, h, stages, 0,
                                                   bitplanes))
    npk = len(packets)
    mass = _PLANE_MASS[:bitplanes]
    mass = [m / sum(mass) for m in mass]
    per_lsb_packets = max(1, npk // bitplanes)
    classes, seen = [], set()
    cum = 0.0
    bounds = [1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0]
    bi = 0
    cuts = [bitplanes] * stages
    for i, p in enumerate(packets):
        cum += mass[p.lsb] / per_lsb_packets
        gi = p.decomp_level - 1
        cuts[gi] = min(cuts[gi], p.lsb)
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
    _QUOTA_CLASSES[(w, h, stages, bitplanes)] = classes
    return classes


def compress_jax(image: np.ndarray, config: CodecConfig) -> bytes:
    """Grayscale compression with the TPU (XLA) encode pipeline.

    Bit-identical to compress(); the DWT, context modelling and the
    interleaved entropy coder run as compiled XLA programs on the
    accelerator, with host-side rate allocation and stream assembly.
    At constraining quotas only the priority-prefix planes are encoded
    (per-lane payloads are state-independent, so the stream is
    byte-identical to the full-encode + allocate path at any quota);
    an undershot prefix escalates to the next class and re-encodes.
    """
    from ..ops.encode_jax import JaxGrayscaleEncoder

    mag_bits = _mag_bits(image.dtype)
    bitplanes = _bitplanes(mag_bits)
    h, w = image.shape

    quota = config.byte_quota
    classes = _jax_quota_classes(w, h, config.stages, bitplanes)
    if quota is None:
        ci = len(classes) - 1
    else:
        # model byte coverage needed: quota as a fraction of a lossless
        # stream (~0.65 x raw for natural images), with 1.7x headroom --
        # an overshoot wastes a little device work, an undershoot costs a
        # delta-escalation encode
        want = min(1.0, 1.7 * quota / max(1, 0.65 * h * w))
        ci = next((i for i, (frac, _) in enumerate(classes)
                   if frac >= want), len(classes) - 1)

    def get_encoder(windows):
        if all(lo == 0 and hi == bitplanes for lo, hi in windows):
            key = (w, h, config.stages, config.filt, config.segments,
                   mag_bits)      # the full encoder; shared cache entry
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

    # Delta escalation: each step encodes only the planes the previous
    # classes did not (payloads are per-lane independent, so the union of
    # the step tables equals the bigger class's table byte for byte).
    table: dict = {}
    prev = (bitplanes,) * config.stages
    ll_mean = 0
    packets = nsegs = None
    while True:
        cuts = classes[ci][1]
        windows = tuple((lo, hi) for lo, hi in zip(cuts, prev))
        if any(lo < hi for lo, hi in windows):
            raw_table, ll_mean = get_encoder(windows).encode(image)
            table.update({(0,) + k: v for k, v in raw_table.items()})
            prev = tuple(min(a, b) for a, b in zip(cuts, prev))
        if packets is None:   # ll_mean is fixed by the image transform
            packets = sort_packets(build_packets_grayscale(
                w, h, config.stages, ll_mean, bitplanes))
            nsegs = {(p.decomp_level, p.subband_type): config.segments
                     for p in packets}
        try:
            encoded = allocate_from_table(packets, table, quota, nsegs,
                                          w, h)
            break
        except KeyError:
            # quota admits more than the encoded prefix: widen
            if ci + 1 >= len(classes):
                raise
            ci += 1
    return assemble_stream(encoded, rearrange_order_grayscale(bitplanes))


def assemble_stream(encoded: dict, order) -> bytes:
    """Lay out segments grouped by segment number, then rearrange order.

    Sorts the encoded entries by (segment, rearrangement-order rank) and
    packs them into a single preallocated buffer -- equivalent to the
    reference's grouped rewrite loop (icer_compress.c:330-345) without
    probing every (plane, segment) combination.
    """
    rank = {key: i for i, key in enumerate(order)}
    items = sorted(
        (kv for kv in encoded.items() if kv[0][:4] in rank),
        key=lambda kv: (kv[0][4], rank[kv[0][:4]]))
    total = sum(C.HEADER_SIZE + hdr.payload_bytes
                for _, (hdr, _) in items)
    out = bytearray(total)
    off = 0
    for _, (hdr, payload) in items:
        off += hdr.pack_into(out, off, payload)
    return bytes(out)


def inverse_transform(img: np.ndarray, stages: int, filt: int,
                      mag_bits: int) -> np.ndarray:
    """Inverse DWT (native runtime when available)."""
    from ..backend import native_backend
    img = np.ascontiguousarray(img, dtype=np.int32)
    if native_backend.available():
        native_backend.dwt_native(img, stages, filt, mag_bits, inverse=True)
        return img
    out, _ = wavelet.inverse_stages(img, stages, filt, mag_bits)
    return np.asarray(out)


# Decode-side allocation guard: header dimensions are attacker-controlled
# u32 fields protected only by CRC32 (not cryptographic), so a crafted
# stream can request an arbitrarily large image buffer.  The reference is
# implicitly bounded by the caller-supplied image_bufsize
# (icer_compress.c:430-444); we bound with a pixel-count cap instead.
DEFAULT_MAX_PIXELS = 1 << 28          # 268 MP ~= 512 MB of int32 workspace


def _check_decode_dims(w: int, h: int, max_pixels: int | None):
    if max_pixels is None:
        return
    if w <= 0 or h <= 0 or w * h > max_pixels:
        raise IcerError(
            IcerStatus.INVALID_INPUT,
            f"header dimensions {w}x{h} exceed max_pixels={max_pixels}")


def decompress(data: bytes, config: CodecConfig, dtype=np.uint16,
               decode_partition=None,
               max_pixels: int | None = DEFAULT_MAX_PIXELS,
               backend: str = "auto",
               pack8: bool | None = None) -> np.ndarray:
    """Decompress an ICER bytestream into a grayscale image.

    Like the reference grayscale decoder, the header's channel nibble is
    ignored (icer_compress.c:449-467 indexes its reconstruct table without
    the channel): every segment lands in the single grayscale table,
    last-in-stream wins on duplicates.  ``max_pixels`` bounds the decode
    allocation implied by the (untrusted) header dimensions.

    backend: "auto"/"native" (multithreaded C++ runtime), "python"
    (sequential reference), or "jax" (the lane-batched TPU decoder,
    models/decode_jax -- lock-step plane rounds over all segments in one
    fused device program).  All are pixel-identical.  ``pack8`` (jax
    backend only) fetches pixels 4/word with an exact wide refetch when
    any pixel exceeds a byte; default on for dtype=uint8.
    """
    mag_bits = _mag_bits(dtype)
    bitplanes = _bitplanes(mag_bits)
    if backend == "jax":
        from .decode_jax import decompress_lanes_batch
        return decompress_lanes_batch([data], config, dtype=dtype,
                                      max_pixels=max_pixels,
                                      pack8=pack8)[0]

    segments_found = scan_bytestream(data, with_offsets=True, with_payload=False)
    if not segments_found:
        raise IcerError(IcerStatus.DECODER_OUT_OF_DATA, "no valid segments")

    table: dict[tuple, tuple[int, int]] = {}
    w = h = 0
    ll_mean = 0
    for hdr, _payload, off in segments_found:
        table[(0, hdr.decomp_level, hdr.subband_type,
               hdr.segment_number, hdr.lsb)] = (off, hdr.data_length)
        w, h = hdr.image_w, hdr.image_h
        ll_mean = hdr.ll_mean_val

    _check_decode_dims(w, h, max_pixels)
    img = np.zeros((h, w), dtype=np.int32)
    reconstruct_channel(img, table, 0, config, mag_bits, bitplanes,
                        decode_partition, backend=backend, stream=data)

    img = np.asarray(wavelet.from_sign_magnitude(img, mag_bits))
    ll_w = dim_low(w, config.stages)
    ll_h = dim_low(h, config.stages)
    img[:ll_h, :ll_w] = wavelet._wrap(img[:ll_h, :ll_w] + ll_mean,
                                      mag_bits, np)
    img = inverse_transform(img, config.stages, config.filt, mag_bits)
    img[img < 0] = 0
    return img.astype(dtype)


def reconstruct_channel(img: np.ndarray, table: dict, chan: int,
                        config: CodecConfig, mag_bits: int, bitplanes: int,
                        decode_partition=None, backend: str = "auto",
                        stream: bytes | None = None) -> None:
    """Decode all subbands of one channel into ``img`` (sign-magnitude).

    backend: "native" (multithreaded C++ runtime), "python" (sequential
    reference), or "auto" (native when available).

    Table values are either (payload bytes, bit_length), or -- when
    ``stream`` is given -- (payload_offset, bit_length) into the stream.
    The stream form matches the reference's zero-copy decoding: a decoder
    driven (out of contract, e.g. by >9-bitplane content) to consume past
    data_length reads the *following stream bytes*, exactly as the C
    decoder does (icer_compress.c:449-459 keeps pointers into the
    datastream).
    """
    h, w = img.shape
    if decode_partition is None and backend in ("auto", "native"):
        from ..backend import native_backend
        if native_backend.available():
            tasks, blob = collect_decode_tasks(
                (h, w), table, chan, config, mag_bits, bitplanes, stream)
            if tasks:
                native_backend.decode_segments_native(img, tasks, blob)
            return
        if backend == "native":
            raise RuntimeError("native runtime unavailable")

    mv = memoryview(stream) if stream is not None else None
    for (stage, subband) in decode_subband_order(config.stages):
        view = subband_view(w, h, stage, subband)
        sub = img[view.row:view.row + view.h, view.col:view.col + view.w]
        rects = partition_segments(view.w, view.h, config.segments)
        for rect in rects:
            planes = {}
            for lsb in range(bitplanes):
                ent = table.get((chan, stage, subband, rect.index, lsb))
                if ent is None:
                    continue
                if mv is None:
                    planes[lsb] = ent
                else:
                    off, nbits = ent
                    planes[lsb] = (mv[off:], nbits)
            seg_arr = sub[rect.row:rect.row + rect.h,
                          rect.col:rect.col + rect.w]
            if decode_partition is not None:
                decode_partition(seg_arr, subband, mag_bits, planes, bitplanes)
            else:
                decode_segment_planes(seg_arr, subband, mag_bits, planes,
                                      bitplanes)


def collect_decode_tasks(img_shape, table: dict, chan: int,
                         config: CodecConfig, mag_bits: int, bitplanes: int,
                         stream: bytes | None = None):
    """Flatten a channel's decode work into independent segment tasks.

    Returns (tasks, blob): each task decodes one segment of one subband
    (its bitplanes MSB->LSB); tasks touch disjoint image rectangles, so
    they run in parallel across threads / cores / chips.  With ``stream``
    the blob IS the stream and table values are payload offsets (zero-copy,
    reference-exact over-read behavior); without it, payload bytes are
    concatenated.
    """
    h, w = img_shape
    tasks = []
    blob = bytearray() if stream is None else None
    for (stage, subband) in decode_subband_order(config.stages):
        view = subband_view(w, h, stage, subband)
        rects = partition_segments(view.w, view.h, config.segments)
        for rect in rects:
            planes = {}
            for lsb in range(bitplanes):
                ent = table.get((chan, stage, subband, rect.index, lsb))
                if ent is None:
                    continue
                if stream is None:
                    payload, nbits = ent
                    planes[lsb] = (len(blob), nbits)
                    blob += payload
                else:
                    planes[lsb] = ent    # (offset, nbits)
            if not planes:
                continue
            tasks.append({
                "seg_off": (view.row + rect.row) * w + (view.col + rect.col),
                "h": rect.h, "w": rect.w, "rowstride": w,
                "subband": subband, "mag_bits": mag_bits,
                "nplanes": bitplanes, "planes": planes,
            })
    return tasks, (stream if stream is not None else bytes(blob))
