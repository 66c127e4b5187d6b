"""libaom oracle for AV1 conformance testing.

Drives the system libaom via ctypes: the encoder generates AV1 streams
with a controlled feature set (via aom_codec_set_option), the decoder
supplies reference pixels. Used by the AV1 differential tests the same
way libde265 anchors the HEVC tests (tests/hevc_oracle.py).
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

_lib = None
_DEC_ABI = 22

# aom_image_t field offsets (libaom 3.6, x86-64) — validated at runtime
# by sanity checks on w/h/stride after the first decode
_IMG_FMT = 0
_IMG_MONO = 16
_IMG_W = 28
_IMG_H = 32
_IMG_BITDEPTH = 36
_IMG_DW = 40
_IMG_DH = 44
_IMG_XSHIFT = 56
_IMG_YSHIFT = 60
_IMG_PLANES = 64
_IMG_STRIDE = 88

_AOM_IMG_FMT_I420 = 0x102
_AOM_IMG_FMT_HIGHBITDEPTH = 0x800
_AOM_IMG_FMT_I42016 = _AOM_IMG_FMT_I420 | _AOM_IMG_FMT_HIGHBITDEPTH
_AOM_CODEC_USE_HIGHBITDEPTH = 0x40000


def _load():
    global _lib
    if _lib is None:
        try:
            lib = ctypes.CDLL("libaom.so.3")
        except OSError:
            return None
        lib.aom_codec_av1_dx.restype = ctypes.c_void_p
        lib.aom_codec_av1_cx.restype = ctypes.c_void_p
        lib.aom_codec_get_frame.restype = ctypes.c_void_p
        lib.aom_codec_get_cx_data.restype = ctypes.c_void_p
        lib.aom_img_alloc.restype = ctypes.c_void_p
        lib.aom_codec_error_detail.restype = ctypes.c_char_p
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u32(buf_addr: int, off: int) -> int:
    return ctypes.cast(buf_addr + off,
                       ctypes.POINTER(ctypes.c_uint32)).contents.value


def _ptr(buf_addr: int, off: int) -> int:
    return ctypes.cast(buf_addr + off,
                       ctypes.POINTER(ctypes.c_void_p)).contents.value or 0


def _i32(buf_addr: int, off: int) -> int:
    return ctypes.cast(buf_addr + off,
                       ctypes.POINTER(ctypes.c_int32)).contents.value


def decode(obus: bytes) -> Optional[Dict[str, np.ndarray]]:
    """Decode one temporal unit of OBUs (with size fields) → planes."""
    lib = _load()
    if lib is None:
        return None
    ctx = (ctypes.c_uint8 * 256)()
    iface = ctypes.c_void_p(lib.aom_codec_av1_dx())
    if lib.aom_codec_dec_init_ver(ctx, iface, None, 0, _DEC_ABI) != 0:
        return None
    try:
        if lib.aom_codec_decode(ctx, obus, len(obus), None) != 0:
            return None
        it = ctypes.c_void_p(None)
        img = lib.aom_codec_get_frame(ctx, ctypes.byref(it))
        if not img:
            return None
        w, h = _u32(img, _IMG_DW), _u32(img, _IMG_DH)
        xs, ys = _u32(img, _IMG_XSHIFT), _u32(img, _IMG_YSHIFT)
        mono = _u32(img, _IMG_MONO)
        hbd = bool(_u32(img, _IMG_FMT) & _AOM_IMG_FMT_HIGHBITDEPTH)
        assert 0 < w <= 65536 and 0 < h <= 65536, "aom_image layout drift"
        out = {}
        names = ["Y"] if mono else ["Y", "U", "V"]
        for i, name in enumerate(names):
            pw = w if i == 0 else (w + xs) >> xs
            ph = h if i == 0 else (h + ys) >> ys
            stride = _i32(img, _IMG_STRIDE + 4 * i)  # bytes
            plane = _ptr(img, _IMG_PLANES + 8 * i)
            if not plane:
                continue
            arr = np.ctypeslib.as_array(
                ctypes.cast(plane, ctypes.POINTER(ctypes.c_uint8)),
                shape=(ph * stride,))
            rows = arr.copy().reshape(ph, stride)
            if hbd:
                out[name] = rows.view(np.uint16)[:, :pw]
            else:
                out[name] = rows[:, :pw]
        return out
    finally:
        lib.aom_codec_destroy(ctx)


# aom_codec_enc_cfg_t word offsets (uint32 view; libaom 3.6 x86-64),
# established from aom_codec_enc_config_default's default values
_CFG_USAGE = 0
_CFG_THREADS = 1
_CFG_PROFILE = 2
_CFG_W = 3
_CFG_H = 4
_CFG_LIMIT = 5
_CFG_BIT_DEPTH = 8
_CFG_INPUT_BIT_DEPTH = 9
_CFG_LAG = 14
_CFG_END_USAGE = 24
_CFG_MIN_Q = 35
_CFG_MAX_Q = 36
_AOM_Q = 3
_ENC_ABI = None


def encode(planes: Dict[str, np.ndarray], options: Dict[str, str],
           usage: int = 1, bit_depth: int = 8) -> Optional[bytes]:
    """Encode one I420 frame with libaom → OBU temporal unit bytes.

    options: aom string options, e.g. {"lossless": "1", "cpu-used": "6"}.
    usage=1 (realtime) keeps encode fast; stills are key frames anyway.
    bit_depth 10/12 encodes high-bit-depth (profile 0 covers 10-bit).
    """
    global _ENC_ABI
    lib = _load()
    if lib is None:
        return None
    hbd = bit_depth > 8
    y = planes["Y"]
    h, w = y.shape
    cfg = (ctypes.c_uint8 * 8192)()
    iface = ctypes.c_void_p(lib.aom_codec_av1_cx())
    if lib.aom_codec_enc_config_default(iface, cfg, usage) != 0:
        return None
    u32 = ctypes.cast(cfg, ctypes.POINTER(ctypes.c_uint32))
    assert u32[_CFG_W] == 320 and u32[_CFG_H] == 240, "enc cfg layout drift"
    u32[_CFG_W] = w
    u32[_CFG_H] = h
    u32[_CFG_LIMIT] = 1
    u32[_CFG_LAG] = 0
    u32[_CFG_END_USAGE] = _AOM_Q
    u32[_CFG_THREADS] = 1
    if hbd:
        u32[_CFG_BIT_DEPTH] = bit_depth
        u32[_CFG_INPUT_BIT_DEPTH] = bit_depth
        if bit_depth == 12:
            u32[_CFG_PROFILE] = 2       # professional profile for 12-bit
    options = dict(options)
    if "_min_q" in options:
        u32[_CFG_MIN_Q] = int(options.pop("_min_q"))
    if "_max_q" in options:
        u32[_CFG_MAX_Q] = int(options.pop("_max_q"))

    flags = _AOM_CODEC_USE_HIGHBITDEPTH if hbd else 0
    ctx = (ctypes.c_uint8 * 256)()
    if _ENC_ABI is None:
        for abi in range(9, 48):
            if lib.aom_codec_enc_init_ver(ctx, iface, cfg, flags, abi) == 0:
                _ENC_ABI = abi
                break
        else:
            return None
    else:
        if lib.aom_codec_enc_init_ver(ctx, iface, cfg, flags,
                                      _ENC_ABI) != 0:
            return None
    try:
        for k, v in options.items():
            if lib.aom_codec_set_option(ctx, k.encode(), str(v).encode()) != 0:
                detail = lib.aom_codec_error_detail(ctx)
                raise RuntimeError(f"aom option {k}={v}: "
                                   f"{(detail or b'?').decode()}")
        fmt = _AOM_IMG_FMT_I42016 if hbd else _AOM_IMG_FMT_I420
        img = ctypes.c_void_p(lib.aom_img_alloc(None, fmt, w, h, 16))
        if not img:
            return None
        try:
            dt = np.uint16 if hbd else np.uint8
            for i, name in enumerate(["Y", "U", "V"]):
                p = planes[name]
                stride = _i32(img.value, _IMG_STRIDE + 4 * i)  # bytes
                dst = _ptr(img.value, _IMG_PLANES + 8 * i)
                src = np.ascontiguousarray(p, dt)
                nbytes = p.shape[1] * np.dtype(dt).itemsize
                for row in range(p.shape[0]):
                    ctypes.memmove(dst + row * stride,
                                   src[row].ctypes.data, nbytes)
            if lib.aom_codec_encode(ctx, img, 0, 1, 0) != 0:
                detail = lib.aom_codec_error_detail(ctx)
                raise RuntimeError(
                    f"aom encode: {(detail or b'?').decode()}")
            out = b""
            it = ctypes.c_void_p(None)
            while True:
                pkt = lib.aom_codec_get_cx_data(ctx, ctypes.byref(it))
                if not pkt:
                    break
                kind = _u32(pkt, 0)
                if kind == 0:  # AOM_CODEC_CX_FRAME_PKT
                    buf = _ptr(pkt, 8)
                    sz = ctypes.cast(pkt + 16, ctypes.POINTER(
                        ctypes.c_size_t)).contents.value
                    out += ctypes.string_at(buf, sz)
            return out or None
        finally:
            lib.aom_img_free(img)
    finally:
        lib.aom_codec_destroy(ctx)
