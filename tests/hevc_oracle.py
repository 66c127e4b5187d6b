"""Direct libde265 oracle for HEVC conformance testing.

Feeds raw NALs straight to libde265 (bypassing libheif's color
pipeline, which rescales chroma) and returns the decoded planes.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is None:
        try:
            lib = ctypes.CDLL("libde265.so.0")
        except OSError:
            return None
        lib.de265_new_decoder.restype = ctypes.c_void_p
        lib.de265_get_next_picture.restype = ctypes.c_void_p
        lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.de265_get_image_width.restype = ctypes.c_int
        lib.de265_get_image_height.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_nals(nals: List[bytes]) -> Optional[Dict[str, np.ndarray]]:
    """Decode annex-B wrapped NALs with libde265 → planes dict."""
    lib = _load()
    if lib is None:
        return None
    dec = ctypes.c_void_p(lib.de265_new_decoder())
    try:
        for nal in nals:
            buf = b"\x00\x00\x01" + nal
            lib.de265_push_data(dec, buf, len(buf), 0, None)
        lib.de265_flush_data(dec)
        pic = None
        for _ in range(200):
            more = ctypes.c_int(0)
            err = lib.de265_decode(dec, ctypes.byref(more))
            p = ctypes.c_void_p(lib.de265_get_next_picture(dec))
            if p.value:
                pic = p
                break
            if not more.value and err != 0:
                break
        if pic is None:
            return None
        return _planes_of(lib, pic)
    finally:
        lib.de265_free_decoder(dec)


def _planes_of(lib, pic) -> Dict[str, np.ndarray]:
    """Extract Y/Cb/Cr planes from a de265 picture; 10/12-bit planes
    come back as uint16 (stride is in bytes)."""
    out = {}
    for name, chn in (("Y", 0), ("Cb", 1), ("Cr", 2)):
        w = lib.de265_get_image_width(pic, chn)
        h = lib.de265_get_image_height(pic, chn)
        bpp = lib.de265_get_bits_per_pixel(pic, chn)
        stride = ctypes.c_int()
        ptr = lib.de265_get_image_plane(pic, chn, ctypes.byref(stride))
        if not ptr:
            continue
        arr = np.ctypeslib.as_array(ptr, shape=(stride.value * h,))
        rows = arr.copy().reshape(h, stride.value)
        if bpp > 8:
            rows = rows.view(np.uint16)
        out[name] = rows[:, :w]
    return out


def decode_nals_seq(nals: List[bytes]) -> Optional[List[Dict[str,
                                                              np.ndarray]]]:
    """Decode annex-B wrapped NALs with libde265 → list of plane dicts,
    one per picture in DECODE order (the order slices appear in the
    stream).  Each slice NAL is pushed with its decode index as PTS and
    the output pictures are sorted back by that PTS, so the result is
    independent of libde265's output/bumping behavior (needed for
    B-frame streams, where output order != decode order)."""
    lib = _load()
    if lib is None:
        return None
    lib.de265_get_image_PTS.restype = ctypes.c_int64
    dec = ctypes.c_void_p(lib.de265_new_decoder())
    frames = []
    try:
        slice_idx = 0
        for nal in nals:
            buf = b"\x00\x00\x01" + nal
            t = (nal[0] >> 1) & 0x3F
            pts = slice_idx
            if t <= 31:
                slice_idx += 1
            lib.de265_push_data(dec, buf, len(buf), pts, None)
        # do NOT flush before decoding: flagging EOS up front makes
        # libde265 output eagerly in decode order, defeating the POC
        # reorder of B-frame streams; flush once the decoder stalls
        WAITING = 13                # DE265_ERROR_WAITING_FOR_INPUT_DATA
        flushed = False
        for _ in range(1000):
            more = ctypes.c_int(0)
            err = lib.de265_decode(dec, ctypes.byref(more))
            if err == WAITING or not more.value:
                if not flushed:
                    lib.de265_flush_data(dec)
                    flushed = True
                    more.value = 1
                else:
                    more.value = 0
            while True:
                pic = ctypes.c_void_p(lib.de265_get_next_picture(dec))
                if not pic.value:
                    break
                out = _planes_of(lib, pic)
                frames.append((int(lib.de265_get_image_PTS(pic)), out))
            if not more.value:
                break
        frames.sort(key=lambda kv: kv[0])
        return [f for _, f in frames]
    finally:
        lib.de265_free_decoder(dec)
