"""ctypes bindings for the native C++ runtime (backend/native).

Builds the shared library on first use (g++ -O3, cached next to the
source), and exposes:
  * encode_emissions_native / encode_batch_native -- the sequential
    interleaved coder on precomputed emission streams (host fast path and
    fallback for TPU-detected buffer flushes);
  * decode_segments_native -- multithreaded batched segment decoding.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "icer_runtime.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "_icer_runtime.so")

_lib = None


class SegTask(ct.Structure):
    _fields_ = [
        ("seg_off", ct.c_int32),
        ("h", ct.c_int32),
        ("w", ct.c_int32),
        ("rowstride", ct.c_int32),
        ("subband", ct.c_int32),
        ("mag_bits", ct.c_int32),
        ("nplanes", ct.c_int32),
        ("_pad", ct.c_int32),
        ("plane_off", ct.c_int64 * 16),
        ("plane_bits", ct.c_int64 * 16),
    ]


def _build() -> str:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) > os.path.getmtime(_SRC)):
        return _SO
    tmp = _SO + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-pthread", "-o", tmp, _SRC]
    subprocess.run(cmd, check=True)
    os.replace(tmp, _SO)
    return _SO


def get_lib():
    global _lib
    if _lib is None:
        lib = ct.CDLL(_build())
        i32p = ct.POINTER(ct.c_int32)
        i64p = ct.POINTER(ct.c_int64)
        u8p = ct.POINTER(ct.c_uint8)
        lib.icer_tpu_encode_emissions.restype = ct.c_int64
        lib.icer_tpu_encode_emissions.argtypes = [
            i32p, i32p, i32p, ct.c_int64, u8p, ct.c_int64, i32p]
        lib.icer_tpu_decode_segments.restype = None
        lib.icer_tpu_decode_segments.argtypes = [
            i32p, ct.POINTER(SegTask), ct.c_int64, u8p, ct.c_int64,
            ct.c_int32, i32p]
        lib.icer_tpu_encode_batch.restype = None
        lib.icer_tpu_encode_batch.argtypes = [
            i32p, i32p, i32p, i64p, i64p, ct.c_int64, u8p, ct.c_int64,
            i64p, ct.c_int32]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _i32(a):
    return np.ascontiguousarray(np.asarray(a).ravel(), dtype=np.int32)


def encode_emissions_native(valid, ctx, bit):
    """Returns (payload bytes, bit_length)."""
    lib = get_lib()
    v, c, b = _i32(valid), _i32(ctx), _i32(bit)
    n = len(v)
    cap = 2 * n + 64  # 10 bits per emission max / 8 + slack
    out = np.empty(cap, dtype=np.uint8)
    fl = ct.c_int32(0)
    nbits = lib.icer_tpu_encode_emissions(
        v.ctypes.data_as(ct.POINTER(ct.c_int32)),
        c.ctypes.data_as(ct.POINTER(ct.c_int32)),
        b.ctypes.data_as(ct.POINTER(ct.c_int32)),
        n, out.ctypes.data_as(ct.POINTER(ct.c_uint8)), cap, ct.byref(fl))
    assert nbits >= 0, "native encode buffer overflow"
    return out[: (nbits + 7) // 8].tobytes(), int(nbits)


def encode_batch_native(valid, ctx, bit, offsets, lengths, nthreads=0):
    """Batched entropy encode over a flat emission buffer.

    Returns (payloads uint8 (ntasks, stride), bits int64 (ntasks,)).
    """
    lib = get_lib()
    v, c, b = _i32(valid), _i32(ctx), _i32(bit)
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    lens = np.ascontiguousarray(lengths, dtype=np.int64)
    ntasks = len(offs)
    stride = int(2 * lens.max() + 64) if ntasks else 64
    out = np.empty((ntasks, stride), dtype=np.uint8)
    bits = np.zeros(ntasks, dtype=np.int64)
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    lib.icer_tpu_encode_batch(
        v.ctypes.data_as(ct.POINTER(ct.c_int32)),
        c.ctypes.data_as(ct.POINTER(ct.c_int32)),
        b.ctypes.data_as(ct.POINTER(ct.c_int32)),
        offs.ctypes.data_as(ct.POINTER(ct.c_int64)),
        lens.ctypes.data_as(ct.POINTER(ct.c_int64)),
        ntasks, out.ctypes.data_as(ct.POINTER(ct.c_uint8)), stride,
        bits.ctypes.data_as(ct.POINTER(ct.c_int64)), nthreads)
    assert (bits >= 0).all(), "native encode buffer overflow"
    return out, bits


def dwt_native(image: np.ndarray, stages: int, filt: int, mag_bits: int,
               inverse: bool = False, nthreads: int = 0) -> bool:
    """Multi-stage integer lifting DWT in place (int32 image).

    Returns the overflow flag.  Bit-identical to ops/wavelet.py
    (differentially tested), threaded over lines.
    """
    lib = get_lib()
    if not hasattr(lib, "_dwt_declared"):
        for name in ("icer_tpu_dwt_forward", "icer_tpu_dwt_inverse"):
            fn = getattr(lib, name)
            fn.restype = ct.c_int32
            fn.argtypes = [ct.POINTER(ct.c_int32)] + [ct.c_int32] * 6
        lib._dwt_declared = True
    assert image.dtype == np.int32 and image.flags.c_contiguous
    h, w = image.shape
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    fn = lib.icer_tpu_dwt_inverse if inverse else lib.icer_tpu_dwt_forward
    return bool(fn(image.ctypes.data_as(ct.POINTER(ct.c_int32)),
                   w, h, stages, filt, mag_bits, nthreads))


class EncTask(ct.Structure):
    _fields_ = [
        ("seg_off", ct.c_int32), ("h", ct.c_int32), ("w", ct.c_int32),
        ("rowstride", ct.c_int32), ("subband", ct.c_int32),
        ("mag_bits", ct.c_int32), ("nplanes", ct.c_int32),
        ("lsb0", ct.c_int32),
    ]


def encode_segments_native(image: np.ndarray, tasks: list[dict],
                           nplanes: int, nthreads=0):
    """Encode a batch of (subband, segment) tasks, ``nplanes`` bitplanes
    each starting at the task's ``lsb0`` (default 0).

    image: the transformed sign-magnitude image, int32 C-contiguous.
    Each task dict: seg_off, h, w, rowstride, subband, mag_bits[, lsb0].
    Returns (payloads uint8 (ntasks*nplanes, stride), bits (ntasks*nplanes,)).
    """
    lib = get_lib()
    if not hasattr(lib, "_enc_seg_declared"):
        lib.icer_tpu_encode_segments.restype = None
        lib.icer_tpu_encode_segments.argtypes = [
            ct.POINTER(ct.c_int32), ct.POINTER(EncTask), ct.c_int64,
            ct.POINTER(ct.c_uint8), ct.c_int64,
            ct.POINTER(ct.c_int64), ct.c_int32]
        lib._enc_seg_declared = True
    n = len(tasks)
    arr = (EncTask * n)()
    max_px = 1
    for i, t in enumerate(tasks):
        s = arr[i]
        s.seg_off = t["seg_off"]
        s.h, s.w = t["h"], t["w"]
        s.rowstride = t["rowstride"]
        s.subband = t["subband"]
        s.mag_bits = t["mag_bits"]
        s.nplanes = nplanes
        s.lsb0 = t.get("lsb0", 0)
        max_px = max(max_px, t["h"] * t["w"])
    stride = 4 * max_px + 64  # worst case ~2.5 bits/pixel-slot, 2 slots
    # The native encoder assigns every output byte it produces (no OR into
    # stale memory), so an uninitialized buffer is safe -- and much cheaper
    # than faulting in ~100x-overprovisioned zero pages per call.
    out = np.empty((n * nplanes, stride), dtype=np.uint8)
    bits = np.zeros(n * nplanes, dtype=np.int64)
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    assert image.dtype == np.int32 and image.flags.c_contiguous
    lib.icer_tpu_encode_segments(
        image.ctypes.data_as(ct.POINTER(ct.c_int32)), arr, n,
        out.ctypes.data_as(ct.POINTER(ct.c_uint8)), stride,
        bits.ctypes.data_as(ct.POINTER(ct.c_int64)), nthreads)
    assert (bits >= 0).all(), "native encode stride overflow"
    return out, bits


def decode_segments_native(image: np.ndarray, tasks: list[dict],
                           blob: bytes, nthreads=0) -> np.ndarray:
    """Decode independent segment tasks into ``image`` (int32, in place).

    Each task dict: seg_off, h, w, rowstride, subband, mag_bits, nplanes,
    planes: {lsb: (blob_offset_bytes, bit_length)}.
    Returns per-task planes-decoded counts.
    """
    lib = get_lib()
    n = len(tasks)
    arr = (SegTask * n)()
    for i, t in enumerate(tasks):
        s = arr[i]
        s.seg_off = t["seg_off"]
        s.h, s.w = t["h"], t["w"]
        s.rowstride = t["rowstride"]
        s.subband = t["subband"]
        s.mag_bits = t["mag_bits"]
        s.nplanes = t["nplanes"]
        for lsb in range(16):
            ent = t["planes"].get(lsb)
            if ent is None:
                s.plane_off[lsb] = -1
                s.plane_bits[lsb] = 0
            else:
                s.plane_off[lsb] = ent[0]
                s.plane_bits[lsb] = ent[1]
    blob_arr = np.frombuffer(blob + b"\x00" * 8, dtype=np.uint8)
    done = np.zeros(n, dtype=np.int32)
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    assert image.dtype == np.int32 and image.flags.c_contiguous
    lib.icer_tpu_decode_segments(
        image.ctypes.data_as(ct.POINTER(ct.c_int32)), arr, n,
        blob_arr.ctypes.data_as(ct.POINTER(ct.c_uint8)), len(blob),
        nthreads, done.ctypes.data_as(ct.POINTER(ct.c_int32)))
    return done
