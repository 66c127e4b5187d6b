"""Golden-output generation via the system's installed libheif.

The container ships the reference implementation as a shared library
(/lib/x86_64-linux-gnu/libheif.so.1 with libde265/dav1d/aom plugins).
We ctypes-call it to produce golden decoded planes for test
comparison — HEVC/AV1 decoding is bit-exact by spec, so our decoder
output must match exactly.

This is *test harness only*: nothing links against it at runtime.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Dict, Optional, Tuple

import numpy as np

_lib = None


class _HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for name in ("libheif.so.1", "libheif.so", ctypes.util.find_library("heif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None

    lib.heif_context_alloc.restype = ctypes.c_void_p
    lib.heif_context_read_from_file.restype = _HeifError
    lib.heif_context_read_from_file.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p]
    lib.heif_context_get_primary_image_handle.restype = _HeifError
    lib.heif_context_get_primary_image_handle.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    lib.heif_decode_image.restype = _HeifError
    lib.heif_decode_image.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    lib.heif_image_get_plane_readonly.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.heif_image_get_plane_readonly.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.heif_image_get_width.restype = ctypes.c_int
    lib.heif_image_get_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.heif_image_get_height.restype = ctypes.c_int
    lib.heif_image_get_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.heif_image_has_channel.restype = ctypes.c_int
    lib.heif_image_has_channel.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.heif_image_get_bits_per_pixel_range.restype = ctypes.c_int
    lib.heif_image_get_bits_per_pixel_range.argtypes = [
        ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return lib


# heif_channel enum values (reference: heif_image.h)
_CHANNELS = {"Y": 0, "Cb": 1, "Cr": 2, "R": 3, "G": 4, "B": 5,
             "Alpha": 6, "interleaved": 10}

# heif_colorspace / heif_chroma enums
_CS_UNDEFINED = 99
_CHROMA_UNDEFINED = 99
_CS_YCBCR, _CS_RGB, _CS_MONO = 0, 1, 2
_CHROMA_420, _CHROMA_422, _CHROMA_444, _CHROMA_MONO = 1, 2, 3, 0


def reference_available() -> bool:
    return _load() is not None


def decode_with_reference(path: str,
                          colorspace: Optional[str] = None
                          ) -> Optional[Dict[str, np.ndarray]]:
    """Decode `path` with the system libheif; returns channel → plane.

    colorspace None → undefined (decoder-native, e.g. YCbCr for HEVC).
    """
    lib = _load()
    if lib is None:
        return None

    ctx = ctypes.c_void_p(lib.heif_context_alloc())
    try:
        err = lib.heif_context_read_from_file(ctx, path.encode(), None)
        if err.code != 0:
            return None
        handle = ctypes.c_void_p()
        err = lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle))
        if err.code != 0:
            return None
        img = ctypes.c_void_p()
        cs = _CS_UNDEFINED if colorspace is None else {
            "YCbCr": _CS_YCBCR, "RGB": _CS_RGB, "mono": _CS_MONO}[colorspace]
        err = lib.heif_decode_image(handle, ctypes.byref(img), cs,
                                    _CHROMA_UNDEFINED, None)
        if err.code != 0:
            return None

        planes = {}
        for name, ch in _CHANNELS.items():
            if not lib.heif_image_has_channel(img, ch):
                continue
            w = lib.heif_image_get_width(img, ch)
            h = lib.heif_image_get_height(img, ch)
            bits = lib.heif_image_get_bits_per_pixel_range(img, ch)
            stride = ctypes.c_int()
            ptr = lib.heif_image_get_plane_readonly(img, ch,
                                                    ctypes.byref(stride))
            if not ptr:
                continue
            nbytes = stride.value * h
            buf = np.ctypeslib.as_array(ptr, shape=(nbytes,)).copy()
            if bits <= 8:
                plane = buf.reshape(h, stride.value)[:, :w]
            else:
                plane = buf.view(np.uint16).reshape(
                    h, stride.value // 2)[:, :w]
            planes[name] = plane.copy()
        return planes
    finally:
        lib.heif_context_free(ctx)
