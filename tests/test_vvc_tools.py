"""VVC optional intra tools — MIP / ISP / LFNST round-trip
(reference bar: libheif/plugins/decoder_vvdec.cc; this codec pair is
validated by encoder↔decoder bit-exactness, tables.py provenance
note).

Each tool is forced on over a content/size/qp matrix; the decoder must
reproduce the encoder's reconstruction bit-exactly and the tool must
actually have been used (tool_counts)."""

import numpy as np
import pytest

from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                           Colorspace, Chroma)
from libheif_tpu.codecs.vvc.encoder import VvcIntraEncoder, EncParams
from libheif_tpu.codecs.vvc import headers as H
from libheif_tpu.codecs.vvc.decoder import decode_intra_picture


def _img(w, h, seed, kind="waves"):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "waves":
        y = (128 + 60 * np.sin(xx / 13.0) + 30 * np.cos(yy / 9.0)
             + rng.integers(-6, 6, (h, w)))
    elif kind == "edges":
        y = np.where((xx // 16 + yy // 16) % 2 == 0, 60, 200) \
            + rng.integers(-4, 4, (h, w))
    else:
        y = rng.integers(0, 256, (h, w))
    y = np.clip(y, 0, 255).astype(np.uint8)
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                  8)
    img.set_plane(Channel.Cr, (200 - y[::2, ::2] // 2).astype(np.uint8),
                  8)
    return img


def _roundtrip(params, w, h, seed, kind="waves"):
    img = _img(w, h, seed, kind)
    enc = VvcIntraEncoder(w, h, params)
    nal, cfg = enc.encode(img)
    sps = H.parse_sps(cfg[0])
    pps = H.parse_pps(cfg[1])
    y, cb, cr = decode_intra_picture(sps, pps, nal)
    exp = enc.recon.planes
    assert np.array_equal(y, exp[0]), "luma mismatch"
    assert np.array_equal(cb, exp[1]), "cb mismatch"
    assert np.array_equal(cr, exp[2]), "cr mismatch"
    return enc.tool_counts


CASES = [(96, 64, 1, "waves"), (64, 96, 2, "edges"),
         (128, 80, 3, "waves")]


@pytest.mark.parametrize("w,h,seed,kind", CASES)
def test_mip_roundtrip(w, h, seed, kind):
    counts = _roundtrip(EncParams(qp=30, mip="force", isp="off",
                                  lfnst="off"), w, h, seed, kind)
    assert counts["mip"] > 0


@pytest.mark.parametrize("w,h,seed,kind", CASES)
def test_isp_roundtrip(w, h, seed, kind):
    counts = _roundtrip(EncParams(qp=34, mip="off", isp="force",
                                  lfnst="off", split_thresh=50.0,
                                  mtt_depth=0), w, h, seed, kind)
    assert counts["isp"] > 0


@pytest.mark.parametrize("w,h,seed,kind", CASES)
def test_lfnst_roundtrip(w, h, seed, kind):
    counts = _roundtrip(EncParams(qp=30, mip="off", isp="off",
                                  lfnst="force"), w, h, seed, kind)
    assert counts["lfnst"] > 0


@pytest.mark.parametrize("qp", [22, 30, 40])
def test_all_tools_auto(qp):
    _roundtrip(EncParams(qp=qp, mip="auto", isp="auto", lfnst="auto"),
               96, 96, 7, "waves")


def test_all_tools_force_mixed_content():
    counts = _roundtrip(EncParams(qp=34, mip="force", isp="force",
                                  lfnst="force", split_thresh=50.0,
                                  mtt_depth=0), 96, 64, 5, "edges")
    # MIP takes precedence per CU; at least one tool must fire
    assert sum(counts.values()) > 0


def test_sps_flags_roundtrip():
    """The SPS carries the tool flags through write+parse."""
    sps_nal = H.write_sps(H.SPS(pic_width=64, pic_height=64,
                                mip_enabled=True, isp_enabled=True,
                                lfnst_enabled=True))
    sps = H.parse_sps(sps_nal)
    assert sps.mip_enabled and sps.isp_enabled and sps.lfnst_enabled
