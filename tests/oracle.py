"""ctypes harness around the reference C library (golden oracle).

Builds /root/reference's lib_icer into a shared library under /tmp (the
reference tree itself is never modified) and exposes the top-level
compress/decompress entry points for differential testing.  If the
reference tree is unavailable the caller should skip oracle tests.
"""

from __future__ import annotations

import ctypes as ct
import glob
import os
import subprocess

REFERENCE = os.environ.get("ICER_REFERENCE", "/root/reference")
BUILD_DIR = "/tmp/icer_oracle"
SO_PATH = os.path.join(BUILD_DIR, "libicer_oracle.so")


def available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "lib_icer"))


def build() -> str:
    os.makedirs(BUILD_DIR, exist_ok=True)
    srcs = sorted(glob.glob(os.path.join(REFERENCE, "lib_icer/src/*.c")))
    newest = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(SO_PATH) and os.path.getmtime(SO_PATH) > newest:
        return SO_PATH
    cmd = ["gcc", "-shared", "-fPIC", "-O2",
           "-I", os.path.join(REFERENCE, "lib_icer/inc"),
           "-o", SO_PATH] + srcs
    subprocess.run(cmd, check=True)
    return SO_PATH


class OutputBuf(ct.Structure):
    _fields_ = [
        ("size_used", ct.c_size_t),
        ("size_allocated", ct.c_size_t),
        ("data_start", ct.POINTER(ct.c_uint8)),
        ("rearrange_start", ct.POINTER(ct.c_uint8)),
    ]


class Oracle:
    def __init__(self):
        self.lib = ct.CDLL(build())
        self._declare()
        self.lib.icer_init()

    def _declare(self):
        """Set argtypes so size_t params get clean 64-bit values."""
        L = self.lib
        u8p, u16p = ct.POINTER(ct.c_uint8), ct.POINTER(ct.c_uint16)
        szp = ct.POINTER(ct.c_size_t)
        sz, i = ct.c_size_t, ct.c_int
        outp = ct.POINTER(OutputBuf)
        L.icer_init_output_struct.argtypes = [outp, u8p, sz, sz]
        L.icer_compress_image_uint16.argtypes = [u16p, sz, sz, ct.c_uint8, i, ct.c_uint8, outp]
        L.icer_compress_image_uint8.argtypes = [u8p, sz, sz, ct.c_uint8, i, ct.c_uint8, outp]
        L.icer_compress_image_yuv_uint16.argtypes = [u16p, u16p, u16p, sz, sz, ct.c_uint8, i, ct.c_uint8, outp]
        L.icer_compress_image_yuv_uint8.argtypes = [u8p, u8p, u8p, sz, sz, ct.c_uint8, i, ct.c_uint8, outp]
        L.icer_decompress_image_uint16.argtypes = [u16p, szp, szp, sz, u8p, sz, ct.c_uint8, i, ct.c_uint8]
        L.icer_decompress_image_uint8.argtypes = [u8p, szp, szp, sz, u8p, sz, ct.c_uint8, i, ct.c_uint8]
        L.icer_decompress_image_yuv_uint16.argtypes = [u16p, u16p, u16p, szp, szp, sz, u8p, sz, ct.c_uint8, i, ct.c_uint8]
        L.icer_decompress_image_yuv_uint8.argtypes = [u8p, u8p, u8p, szp, szp, sz, u8p, sz, ct.c_uint8, i, ct.c_uint8]
        L.icer_wavelet_transform_stages_uint16.argtypes = [u16p, sz, sz, ct.c_uint8, i]
        L.icer_inverse_wavelet_transform_stages_uint16.argtypes = [u16p, sz, sz, ct.c_uint8, i]
        L.icer_wavelet_transform_stages_uint8.argtypes = [u8p, sz, sz, ct.c_uint8, i]
        L.icer_inverse_wavelet_transform_stages_uint8.argtypes = [u8p, sz, sz, ct.c_uint8, i]

    # -- encode -----------------------------------------------------------
    def _compress(self, fn, arrays, w, h, stages, filt, segments, quota):
        buf_len = 2 * quota + 64
        data = (ct.c_uint8 * buf_len)()
        out = OutputBuf()
        r = self.lib.icer_init_output_struct(ct.byref(out), data, buf_len, quota)
        assert r == 0, r
        args = [a.ctypes.data_as(ct.POINTER(ct.c_uint16 if a.itemsize == 2
                                            else ct.c_uint8))
                for a in arrays]
        res = fn(*args, w, h, stages, filt, segments, ct.byref(out))
        stream = bytes(bytearray(data[quota:quota + out.size_used]))
        return res, stream

    def compress_u16(self, img, stages, filt, segments, quota):
        import numpy as np
        img = np.ascontiguousarray(img.astype(np.uint16)).copy()
        h, w = img.shape
        return self._compress(self.lib.icer_compress_image_uint16, [img],
                              w, h, stages, filt, segments, quota)

    def compress_u8(self, img, stages, filt, segments, quota):
        import numpy as np
        img = np.ascontiguousarray(img.astype(np.uint8)).copy()
        h, w = img.shape
        return self._compress(self.lib.icer_compress_image_uint8, [img],
                              w, h, stages, filt, segments, quota)

    def compress_yuv_u16(self, y, u, v, stages, filt, segments, quota):
        import numpy as np
        chans = [np.ascontiguousarray(c.astype(np.uint16)).copy()
                 for c in (y, u, v)]
        h, w = chans[0].shape
        return self._compress(self.lib.icer_compress_image_yuv_uint16, chans,
                              w, h, stages, filt, segments, quota)

    def compress_yuv_u8(self, y, u, v, stages, filt, segments, quota):
        import numpy as np
        chans = [np.ascontiguousarray(c.astype(np.uint8)).copy()
                 for c in (y, u, v)]
        h, w = chans[0].shape
        return self._compress(self.lib.icer_compress_image_yuv_uint8, chans,
                              w, h, stages, filt, segments, quota)

    # -- decode -----------------------------------------------------------
    def decompress_u16(self, stream, stages, filt, segments, bufpix):
        import numpy as np
        img = np.zeros(bufpix, dtype=np.uint16)
        w = ct.c_size_t(0)
        h = ct.c_size_t(0)
        # Pad: the reference scan loop reads up to a header past the end.
        buf = (ct.c_uint8 * (len(stream) + 4096)).from_buffer_copy(
            stream + b"\x00" * 4096)
        res = self.lib.icer_decompress_image_uint16(
            img.ctypes.data_as(ct.POINTER(ct.c_uint16)), ct.byref(w),
            ct.byref(h), bufpix, buf, len(stream), stages, filt, segments)
        return res, img[:w.value * h.value].reshape(h.value, w.value)

    def decompress_u8(self, stream, stages, filt, segments, bufpix):
        import numpy as np
        img = np.zeros(bufpix, dtype=np.uint8)
        w = ct.c_size_t(0)
        h = ct.c_size_t(0)
        # Pad: the reference scan loop reads up to a header past the end.
        buf = (ct.c_uint8 * (len(stream) + 4096)).from_buffer_copy(
            stream + b"\x00" * 4096)
        res = self.lib.icer_decompress_image_uint8(
            img.ctypes.data_as(ct.POINTER(ct.c_uint8)), ct.byref(w),
            ct.byref(h), bufpix, buf, len(stream), stages, filt, segments)
        return res, img[:w.value * h.value].reshape(h.value, w.value)

    def decompress_yuv_u16(self, stream, stages, filt, segments, bufpix):
        import numpy as np
        chans = [np.zeros(bufpix, dtype=np.uint16) for _ in range(3)]
        w = ct.c_size_t(0)
        h = ct.c_size_t(0)
        # Pad: the reference scan loop reads up to a header past the end.
        buf = (ct.c_uint8 * (len(stream) + 4096)).from_buffer_copy(
            stream + b"\x00" * 4096)
        res = self.lib.icer_decompress_image_yuv_uint16(
            *[c.ctypes.data_as(ct.POINTER(ct.c_uint16)) for c in chans],
            ct.byref(w), ct.byref(h), bufpix, buf, len(stream),
            stages, filt, segments)
        shaped = [c[:w.value * h.value].reshape(h.value, w.value)
                  for c in chans]
        return res, shaped

    def decompress_yuv_u8(self, stream, stages, filt, segments, bufpix):
        import numpy as np
        chans = [np.zeros(bufpix, dtype=np.uint8) for _ in range(3)]
        w = ct.c_size_t(0)
        h = ct.c_size_t(0)
        # Pad: the reference scan loop reads up to a header past the end.
        buf = (ct.c_uint8 * (len(stream) + 4096)).from_buffer_copy(
            stream + b"\x00" * 4096)
        res = self.lib.icer_decompress_image_yuv_uint8(
            *[c.ctypes.data_as(ct.POINTER(ct.c_uint8)) for c in chans],
            ct.byref(w), ct.byref(h), bufpix, buf, len(stream),
            stages, filt, segments)
        shaped = [c[:w.value * h.value].reshape(h.value, w.value)
                  for c in chans]
        return res, shaped

    # -- internals for layer-level differential tests ---------------------
    def wavelet_fwd_u16(self, img, stages, filt):
        import numpy as np
        img = np.ascontiguousarray(img.astype(np.uint16)).copy()
        h, w = img.shape
        res = self.lib.icer_wavelet_transform_stages_uint16(
            img.ctypes.data_as(ct.POINTER(ct.c_uint16)), w, h, stages, filt)
        return res, img

    def wavelet_inv_u16(self, img, stages, filt):
        import numpy as np
        img = np.ascontiguousarray(img.astype(np.uint16)).copy()
        h, w = img.shape
        res = self.lib.icer_inverse_wavelet_transform_stages_uint16(
            img.ctypes.data_as(ct.POINTER(ct.c_uint16)), w, h, stages, filt)
        return res, img

    def wavelet_fwd_u8(self, img, stages, filt):
        import numpy as np
        img = np.ascontiguousarray(img.astype(np.uint8)).copy()
        h, w = img.shape
        res = self.lib.icer_wavelet_transform_stages_uint8(
            img.ctypes.data_as(ct.POINTER(ct.c_uint8)), w, h, stages, filt)
        return res, img

    def wavelet_inv_u8(self, img, stages, filt):
        import numpy as np
        img = np.ascontiguousarray(img.astype(np.uint8)).copy()
        h, w = img.shape
        res = self.lib.icer_inverse_wavelet_transform_stages_uint8(
            img.ctypes.data_as(ct.POINTER(ct.c_uint8)), w, h, stages, filt)
        return res, img


_oracle = None


def get_oracle() -> Oracle:
    global _oracle
    if _oracle is None:
        _oracle = Oracle()
    return _oracle
