"""libavcodec H.264 oracle for AVC conformance testing.

Compiles tests/avc_shim.c on demand (gcc, linked against the system
libavcodec) and exposes encode/decode helpers. The encoder is x264 via
libavcodec — exactly the library the reference wraps in its
encoder_x264.cc plugin — and the decoder is avcodec's native H.264
decoder, standing in for the reference's decoder_openh264.cc boundary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "avc_shim.c")
_SO = os.path.join(_HERE, "_build", "libavcshim.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        cmd = ["gcc", "-O2", "-shared", "-fPIC", _SRC,
               "-lavcodec", "-lavutil", "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.avc_decode.restype = ctypes.c_int
    lib.avc_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    lib.avc_encode.restype = ctypes.c_int
    lib.avc_encode.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode(stream: bytes) -> Optional[Dict[str, np.ndarray]]:
    """Decode the first frame of an annex-B H.264 stream → planes."""
    lib = _load()
    if lib is None:
        return None
    cap = 64 * 1024 * 1024
    out = (ctypes.c_uint8 * cap)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    mono = ctypes.c_int()
    n = lib.avc_decode(stream, len(stream), out, cap,
                       ctypes.byref(w), ctypes.byref(h), ctypes.byref(mono))
    if n <= 0:
        return None
    buf = np.ctypeslib.as_array(out, (n,)).copy()
    W, H = w.value, h.value
    y = buf[:W * H].reshape(H, W)
    if mono.value:
        return {"Y": y}
    cw, ch = (W + 1) // 2, (H + 1) // 2
    u = buf[W * H:W * H + cw * ch].reshape(ch, cw)
    v = buf[W * H + cw * ch:W * H + 2 * cw * ch].reshape(ch, cw)
    return {"Y": y, "U": u, "V": v}


def encode_seq(frames, qp: int = 26, gop: int = 250,
               extra_params: str = "") -> Optional[bytes]:
    """Encode [(y, u, v), ...] as an IPPP annex-B stream via x264."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "avc_encode_seq"):
        return None
    lib.avc_encode_seq.restype = ctypes.c_int
    h, w = frames[0][0].shape
    parts = []
    for (y, u, v) in frames:
        parts += [y.ravel(), u.ravel(), v.ravel()]
    yuv = np.concatenate(parts).astype(np.uint8)
    src = yuv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    cap = 64 * 1024 * 1024
    out = (ctypes.c_uint8 * cap)()
    n = lib.avc_encode_seq(src, len(frames), w, h, qp, gop,
                           extra_params.encode(), out, cap)
    if n <= 0:
        return None
    return bytes(bytearray(out[:n]))


def decode_seq(stream: bytes):
    """Decode every frame of an annex-B stream → list of plane dicts."""
    lib = _load()
    if lib is None or not hasattr(lib, "avc_decode_seq"):
        return None
    lib.avc_decode_seq.restype = ctypes.c_int
    cap = 256 * 1024 * 1024
    out = (ctypes.c_uint8 * cap)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    nf = ctypes.c_int()
    n = lib.avc_decode_seq(stream, len(stream), out, cap,
                           ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(nf))
    if n <= 0:
        return None
    buf = np.ctypeslib.as_array(out, (n,)).copy()
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    fsz = W * H + 2 * cw * ch
    frames = []
    for f in range(nf.value):
        b = buf[f * fsz:(f + 1) * fsz]
        frames.append({"Y": b[:W * H].reshape(H, W),
                       "U": b[W * H:W * H + cw * ch].reshape(ch, cw),
                       "V": b[W * H + cw * ch:].reshape(ch, cw)})
    return frames


def encode(y: np.ndarray, u: np.ndarray, v: np.ndarray, qp: int = 26,
           cabac: bool = False, tx8: bool = False,
           extra_params: str = "") -> Optional[bytes]:
    """Encode one 4:2:0 frame as an intra H.264 annex-B stream."""
    lib = _load()
    if lib is None:
        return None
    h, w = y.shape
    yuv = np.concatenate([y.ravel(), u.ravel(), v.ravel()]).astype(np.uint8)
    src = yuv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    cap = 32 * 1024 * 1024
    out = (ctypes.c_uint8 * cap)()
    n = lib.avc_encode(src, w, h, qp, int(cabac), int(tx8),
                       extra_params.encode(), out, cap)
    if n <= 0:
        return None
    return bytes(bytearray(out[:n]))
