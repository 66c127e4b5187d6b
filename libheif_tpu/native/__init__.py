"""Native host runtime (C++), loaded via ctypes.

The TPU handles the pixel plane; the serial entropy chains and other
byte-oriented host work (the parts the reference implements in C++
inside libjpeg/libde265/... behind its plugin ABI) live here as our
own C++ compiled on first use with the system toolchain.  Every
native entry point has a pure-Python reference implementation that
remains the portable fallback and the difftest anchor, so the engine
works (slower) without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_build")

_SOURCES = ["jpeg_scan.cc", "hevc_parse.cc", "hevc_recon.cc",
            "hevc_plan.cc", "hevc_enc.cc", "av1_native.cc",
            "j2k_t1.cc", "avc_native.cc", "ht_j2k.cc"]
_LIB_NAME = "libtpuheif_native.so"

_lock = threading.Lock()
_lib = None
_build_failed = False

# set True to force the pure-Python fallbacks (tests use this to
# difftest native vs reference paths)
DISABLED = os.environ.get("TPUHEIF_NO_NATIVE", "") not in ("", "0")


def _newest_mtime(paths):
    return max(os.path.getmtime(p) for p in paths)


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out = os.path.join(_BUILD_DIR, _LIB_NAME)
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    if os.path.exists(out) and os.path.getmtime(out) >= _newest_mtime(srcs):
        return out
    # -march=native is safe: the library is always compiled on the
    # machine that runs it (build-on-first-import).  AVX-512 is
    # explicitly disabled: its license-based downclocking slows the
    # scalar entropy-decode hot path more than the wide vectors gain
    # (measured ~15% whole-decode regression on Cooperlake).
    cmd = ["g++", "-O3", "-march=native", "-mno-avx512f",
           "-funroll-loops", "-shared",
           "-fPIC", "-std=c++17", "-pthread", "-o", out] + srcs
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    return out


def get_lib():
    """The native library handle, or None if unavailable."""
    global _lib, _build_failed
    if DISABLED or _build_failed:
        return None
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            path = _build()
            lib = ctypes.CDLL(path)
            lib.tpuheif_jpeg_decode_scan.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _build_failed = True
            return None
    return _lib


def available() -> bool:
    return get_lib() is not None
