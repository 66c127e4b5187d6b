"""Native C++ HEVC encoder fast path (native/src/hevc_enc.cc) must be
byte-identical to the Python IntraEncoder across the default-parameter
envelope, and still decode bit-exactly (closed loop)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.codecs.hevc import decoder as HD, headers as H
from libheif_tpu.image.pixel_image import (PixelImage, Channel, Colorspace,
                                           Chroma)
from libheif_tpu.codecs.hevc.native_parse import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


def _img(w, h, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        ych = rng.integers(0, 256, (h, w)).astype(np.uint8)
    else:
        base = rng.integers(0, 256, (max(h // 8, 1),
                                     max(w // 8, 1))).astype(np.float64)
        ych = np.clip(np.kron(base, np.ones((8, 8)))[:h, :w] +
                      rng.integers(-6, 7, (h, w)), 0, 255).astype(np.uint8)
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, ych, 8)
    img.set_plane(Channel.Cb, ych[::2, ::2], 8)
    img.set_plane(Channel.Cr, ych[1::2, ::2], 8)
    return img


CASES = [
    ("auto-q32", (64, 48), dict(qp=32), "photo"),
    ("auto-noise", (64, 48), dict(qp=26), "noise"),
    ("dc", (32, 32), dict(qp=32, mode="dc"), "noise"),
    ("planar", (64, 64), dict(qp=30, mode="planar"), "photo"),
    ("angular14", (64, 64), dict(qp=30, mode=14), "photo"),
    ("strong-smooth-q37", (128, 96), dict(qp=37, strong_smoothing=True),
     "photo"),
    ("small-ctb", (96, 64), dict(qp=12, ctb_log2=4, cu_log2=4), "noise"),
    ("min-cb", (80, 48), dict(qp=45, ctb_log2=5, cu_log2=3), "photo"),
    ("cu32", (64, 64), dict(qp=30, ctb_log2=5, cu_log2=5), "photo"),
]


@pytest.mark.parametrize("name,size,kw,kind", CASES,
                         ids=[c[0] for c in CASES])
def test_native_matches_python(name, size, kw, kind, monkeypatch):
    img = _img(*size, seed=sum(size), kind=kind)
    monkeypatch.setenv("TPUHEIF_HEVC_ENC_NATIVE", "0")
    nal_py, cfg = IntraEncoder(*size, EncParams(**kw)).encode(img)
    monkeypatch.setenv("TPUHEIF_HEVC_ENC_NATIVE", "1")
    nal_nat, _ = IntraEncoder(*size, EncParams(**kw)).encode(img)
    assert nal_nat == nal_py


def test_native_roundtrip_decodes():
    img = _img(96, 64, seed=9, kind="photo")
    nal, cfg = IntraEncoder(96, 64, EncParams(qp=28)).encode(img)
    sps = H.parse_sps(cfg[0])
    pps = H.parse_pps(cfg[1])
    y, cb, cr = HD.decode_intra_picture(sps, pps, [nal], engine="native")
    src = np.asarray(img.plane(Channel.Y), np.int64)
    err = np.abs(y[:64, :96].astype(np.int64) - src)
    assert err.mean() < 12     # qp28 closed loop sanity


def test_oracle_features_fall_back():
    """Parameters outside the fast path silently use the Python loop."""
    img = _img(64, 48, seed=3, kind="noise")
    nal, _ = IntraEncoder(64, 48, EncParams(qp=30, sao=True)).encode(img)
    assert len(nal) > 10
