"""Native (C) AVC decode fast path vs the Python reference engine.

The native core (native/src/avc_native.cc) must agree bit-exactly with
the Python engine (codecs/avc/mb.py) on every stream — including PCM
macroblocks, multi-slice frames, and both transform sizes — and both
must reject corrupt data with HeifError, never a crash.
"""

import numpy as np
import pytest

from libheif_tpu.core.error import HeifError
from tests import avc_oracle

needs_oracle = pytest.mark.skipif(not avc_oracle.available(),
                                  reason="libavcodec oracle not available")


def _native_ok():
    from libheif_tpu.codecs.avc.native_decode import native_enabled
    return native_enabled()


needs_native = pytest.mark.skipif(not _native_ok(),
                                  reason="native library unavailable")


def _both_decodes(stream, monkeypatch):
    from libheif_tpu.codecs.avc.decoder import decode_annexb
    native = decode_annexb(stream)
    monkeypatch.setenv("TPUHEIF_AVC_NATIVE", "0")
    python = decode_annexb(stream)
    return native, python


def _assert_equal(native, python):
    for k in native:
        assert np.array_equal(native[k], python[k]), f"plane {k} differs"


@needs_oracle
@needs_native
@pytest.mark.parametrize("qp,tx8", [(30, False), (26, True), (40, False)])
def test_native_matches_python(qp, tx8, monkeypatch):
    rng = np.random.default_rng(qp)
    y = rng.integers(0, 256, (80, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (40, 48)).astype(np.uint8)
    v = rng.integers(0, 256, (40, 48)).astype(np.uint8)
    stream = avc_oracle.encode(y, u, v, qp=qp, cabac=True, tx8=tx8)
    _assert_equal(*_both_decodes(stream, monkeypatch))


@needs_oracle
@needs_native
def test_native_pcm_blocks(monkeypatch):
    """qp 0 noise makes x264 emit I_PCM macroblocks (cheaper than
    residual coding); the PCM byte-alignment rollback must match."""
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    stream = avc_oracle.encode(y, u, v, qp=0, cabac=True, tx8=False)
    native, python = _both_decodes(stream, monkeypatch)
    _assert_equal(native, python)
    ref = avc_oracle.decode(stream)
    for k in native:
        assert np.array_equal(native[k], ref[k])


@needs_oracle
@needs_native
def test_native_multi_slice(monkeypatch):
    """slices=3 → several slice NALs per frame; per-frame state arrays
    persist across the per-slice C calls."""
    rng = np.random.default_rng(17)
    y = rng.integers(0, 256, (96, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (48, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (48, 32)).astype(np.uint8)
    stream = avc_oracle.encode(y, u, v, qp=30, cabac=True, tx8=False,
                               extra_params="slices=3")
    native, python = _both_decodes(stream, monkeypatch)
    _assert_equal(native, python)
    ref = avc_oracle.decode(stream)
    for k in native:
        assert np.array_equal(native[k], ref[k])


@needs_oracle
@needs_native
def test_native_corrupt_raises_heiferror():
    from libheif_tpu.codecs.avc.decoder import decode_annexb
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    stream = avc_oracle.encode(y, u, v, qp=28, cabac=True, tx8=False)
    for cut in (len(stream) // 2, len(stream) - 3):
        try:
            decode_annexb(stream[:cut])
        except HeifError:
            pass
    for seed in range(20):
        r2 = np.random.default_rng(seed)
        bad = bytearray(stream)
        for _ in range(6):
            bad[int(r2.integers(50, len(bad)))] = int(r2.integers(0, 256))
        try:
            decode_annexb(bytes(bad))
        except HeifError:
            pass
