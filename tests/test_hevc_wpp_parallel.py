"""WPP wavefront-parallel entropy decode (hevc_parse.cc
tpuheif_hevc_parse_slice_wpp).

Rows interleave across worker threads with the spec's 2-CTB-column
wavefront lag (the libde265 WPP thread-task behavior).  The parallel
parse must be bit-exact with the serial engine on every stream; the
driver only engages it on >=3-core hosts, so tests force it with
TPUHEIF_HEVC_WPP_THREADS.
"""

import numpy as np
import pytest

from libheif_tpu.codecs.hevc import headers as H
from libheif_tpu.codecs.hevc.decoder import decode_intra_picture
from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.image.pixel_image import (Channel, Chroma, Colorspace,
                                           PixelImage)


def _native_ok():
    from libheif_tpu.native import available
    return available()


needs_native = pytest.mark.skipif(not _native_ok(),
                                  reason="native library unavailable")


def _make_stream(side, qp, ctb_log2=5, seed=3, sao=False):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (side // 8, side // 8)).astype(float)
    y = np.clip(np.kron(base, np.ones((8, 8)))[:side, :side] +
                rng.integers(-10, 11, (side, side)), 0,
                255).astype(np.uint8)
    img = PixelImage(side, side, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb, y[::2, ::2], 8)
    img.set_plane(Channel.Cr, y[1::2, 1::2], 8)
    enc = IntraEncoder(side, side,
                       EncParams(qp=qp, ctb_log2=ctb_log2,
                                 cu_log2=ctb_log2, wpp=True, sao=sao))
    slice_nal, cfg_nals = enc.encode(img)
    sps = pps = None
    for n in cfg_nals:
        t = (n[0] >> 1) & 0x3F
        if t == 33:
            sps = H.parse_sps(n)
        elif t == 34:
            pps = H.parse_pps(n)
    return sps, pps, [slice_nal], list(cfg_nals) + [slice_nal]


def _decode(sps, pps, slices, workers, monkeypatch):
    monkeypatch.setenv("TPUHEIF_HEVC_WPP_THREADS", str(workers))
    return decode_intra_picture(sps, pps, slices, engine="native")


@needs_native
@pytest.mark.parametrize("side,qp,ctb_log2,workers",
                         [(256, 30, 5, 2), (256, 18, 5, 3),
                          (192, 36, 6, 2), (128, 26, 4, 4)])
def test_parallel_matches_serial(side, qp, ctb_log2, workers,
                                 monkeypatch):
    sps, pps, slices, _ = _make_stream(side, qp, ctb_log2)
    a = _decode(sps, pps, slices, 1, monkeypatch)
    b = _decode(sps, pps, slices, workers, monkeypatch)
    for pa, pb in zip(a, b):
        assert np.array_equal(pa, pb)


@needs_native
def test_parallel_with_sao(monkeypatch):
    sps, pps, slices, _ = _make_stream(256, 28, 5, seed=9, sao=True)
    a = _decode(sps, pps, slices, 1, monkeypatch)
    b = _decode(sps, pps, slices, 2, monkeypatch)
    for pa, pb in zip(a, b):
        assert np.array_equal(pa, pb)


@needs_native
def test_parallel_vs_libde265(monkeypatch):
    from tests import hevc_oracle
    if not hevc_oracle.available():
        pytest.skip("libde265 oracle not available")
    sps, pps, slices, nals = _make_stream(256, 30, 5, seed=5)
    y, cb, cr = _decode(sps, pps, slices, 2, monkeypatch)
    ref = hevc_oracle.decode_nals(nals)
    assert ref is not None
    assert np.array_equal(ref["Y"], y)
    assert np.array_equal(ref["Cb"], cb)
    assert np.array_equal(ref["Cr"], cr)


@needs_native
def test_corrupt_wpp_stream_no_hang(monkeypatch):
    """Corrupt entry points / truncated payload must error cleanly and
    never deadlock the wavefront."""
    from libheif_tpu.core.error import HeifError
    sps, pps, slices, _ = _make_stream(192, 30, 5, seed=7)
    monkeypatch.setenv("TPUHEIF_HEVC_WPP_THREADS", "2")
    sl = slices[0]
    for cut in (len(sl) // 3, len(sl) // 2, len(sl) - 4):
        try:
            decode_intra_picture(sps, pps, [sl[:cut]], engine="native")
        except HeifError:
            pass
    rng = np.random.default_rng(1)
    for seed in range(10):
        bad = bytearray(sl)
        for _ in range(4):
            bad[int(rng.integers(30, len(bad)))] = int(
                rng.integers(0, 256))
        try:
            decode_intra_picture(sps, pps, [bytes(bad)], engine="native")
        except HeifError:
            pass
