"""Native (C) AVC encoder fast path vs the Python SliceEncoder.

The C port (native/src/avc_native.cc tpuheif_avc_encode_slice) must
make the same mode decisions and emit the same CABAC bin stream —
byte-identical slice NALs and identical reconstructions.
"""

import numpy as np
import pytest


def _native_ok():
    from libheif_tpu.codecs.avc.encoder import _native_enc_enabled
    return _native_enc_enabled()


needs_native = pytest.mark.skipif(not _native_ok(),
                                  reason="native library unavailable")


def _pair(monkeypatch, y, u, v, qp, tx8):
    from libheif_tpu.codecs.avc import encoder as AE
    monkeypatch.setenv("TPUHEIF_AVC_ENC_NATIVE", "1")
    a = AE.encode_frame(y, u, v, qp=qp, tx8=tx8, deblock=False)
    monkeypatch.setenv("TPUHEIF_AVC_ENC_NATIVE", "0")
    b = AE.encode_frame(y, u, v, qp=qp, tx8=tx8, deblock=False)
    return a, b


@needs_native
@pytest.mark.parametrize("qp,tx8", [(26, True), (30, False), (46, True),
                                    (12, False)])
def test_byte_identical(qp, tx8, monkeypatch):
    rng = np.random.default_rng(qp)
    y = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    a, b = _pair(monkeypatch, y, u, v, qp, tx8)
    assert a[2] == b[2]
    for pa, pb in zip(a[3], b[3]):
        assert np.array_equal(pa, pb)


@needs_native
def test_byte_identical_mono_and_smooth(monkeypatch):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (4, 5))
    y = np.kron(base, np.ones((16, 16), np.int64)).astype(np.uint8)
    a, b = _pair(monkeypatch, y, None, None, 28, True)
    assert a[2] == b[2]
    assert np.array_equal(a[3][0], b[3][0])


@needs_native
def test_randomized_fuzz(monkeypatch):
    fails = []
    for trial in range(8):
        r = np.random.default_rng(300 + trial)
        w = int(r.integers(2, 7)) * 16
        h = int(r.integers(2, 5)) * 16
        qp = int(r.integers(4, 50))
        tx8 = bool(r.integers(0, 2))
        y = r.integers(0, 256, (h, w)).astype(np.uint8)
        u = r.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = r.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        a, b = _pair(monkeypatch, y, u, v, qp, tx8)
        if a[2] != b[2]:
            fails.append((trial, w, h, qp, tx8))
    assert not fails
