"""WebP import/export (heifio equivalent).

Re-designed equivalent of the reference's heifio WebP converters
(reference: heifio/decoder_webp.cc, heifio/encoder_webp.cc).  Like the
reference, this wraps the system libwebp — here via ctypes rather than
a compile-time link, gated at runtime: if libwebp is absent the
functions raise Unsupported_codec (mirroring the reference's
`--with webp` build gate, heifio/CMakeLists.txt).
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

from ..core.error import HeifError, SubError

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _webp() -> ctypes.CDLL:
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        for name in ("libwebp.so.7", "libwebp.so", "libwebp.dylib",
                     ctypes.util.find_library("webp")):
            if not name:
                continue
            try:
                lib = ctypes.CDLL(name)
            except OSError:
                continue
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            for fn in ("WebPEncodeRGB", "WebPEncodeRGBA"):
                f = getattr(lib, fn)
                f.restype = ctypes.c_size_t
                f.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            for fn in ("WebPEncodeLosslessRGB", "WebPEncodeLosslessRGBA"):
                f = getattr(lib, fn)
                f.restype = ctypes.c_size_t
                f.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _lib = lib
            break
    if _lib is None:
        raise HeifError.unsupported(SubError.Unsupported_codec,
                                    "libwebp not available")
    return _lib


def read_webp(data: bytes):
    """WebP bytes → PixelImage (RGB, alpha preserved when present)."""
    from ..image.pixel_image import PixelImage, Channel, Colorspace, Chroma
    lib = _webp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w),
                           ctypes.byref(h)):
        raise HeifError.invalid_input(msg="not a WebP file")
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not buf:
        raise HeifError.invalid_input(msg="WebP decode failed")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(buf, shape=(n,)).reshape(
            h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(buf)
    img = PixelImage(w.value, h.value, Colorspace.RGB, Chroma.C444)
    img.set_plane(Channel.R, arr[:, :, 0], 8)
    img.set_plane(Channel.G, arr[:, :, 1], 8)
    img.set_plane(Channel.B, arr[:, :, 2], 8)
    if not np.all(arr[:, :, 3] == 255):
        img.set_plane(Channel.Alpha, arr[:, :, 3], 8)
    return img


def write_webp(img, quality: int = 90, lossless: bool = False) -> bytes:
    """PixelImage → WebP bytes (RGB(A) 8-bit; convert first if needed).

    quality 0..100; lossless=True uses the VP8L path (quality ignored),
    matching the reference encoder's -L handling (encoder_webp.cc).
    """
    from ..image.pixel_image import Channel, Colorspace, Chroma
    from ..color import convert_image
    if not img.has_channel(Channel.R):
        img = convert_image(img, Colorspace.RGB, Chroma.C444)
    r = np.asarray(img.plane(Channel.R))
    g = np.asarray(img.plane(Channel.G))
    b = np.asarray(img.plane(Channel.B))
    if img.bit_depth(Channel.R) > 8:
        shift = img.bit_depth(Channel.R) - 8
        r, g, b = r >> shift, g >> shift, b >> shift
    h, w = r.shape
    has_alpha = img.has_channel(Channel.Alpha)
    if has_alpha:
        a = np.asarray(img.plane(Channel.Alpha))
        if img.bit_depth(Channel.Alpha) > 8:
            a = a >> (img.bit_depth(Channel.Alpha) - 8)
        inter = np.dstack([r, g, b, a]).astype(np.uint8)
        stride = w * 4
    else:
        inter = np.dstack([r, g, b]).astype(np.uint8)
        stride = w * 3
    raw = inter.tobytes()

    lib = _webp()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        fn = lib.WebPEncodeLosslessRGBA if has_alpha else \
            lib.WebPEncodeLosslessRGB
        size = fn(raw, w, h, stride, ctypes.byref(out))
    else:
        fn = lib.WebPEncodeRGBA if has_alpha else lib.WebPEncodeRGB
        size = fn(raw, w, h, stride, ctypes.c_float(quality),
                  ctypes.byref(out))
    if size == 0 or not out:
        raise HeifError.usage(msg="WebP encode failed")
    try:
        data = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)
    return data


def read_webp_file(path: str):
    with open(path, "rb") as f:
        return read_webp(f.read())


def write_webp_file(img, path: str, quality: int = 90,
                    lossless: bool = False) -> None:
    with open(path, "wb") as f:
        f.write(write_webp(img, quality, lossless))
