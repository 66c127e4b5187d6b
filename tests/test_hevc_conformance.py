"""HEVC conformance: differential tests against libde265 (when present).

The full parameter sweep lives in tests/hevc_difftest.py (run directly);
here a representative subset keeps the pytest suite fast while still
covering every feature family used by real x265 streams.
"""

import numpy as np
import pytest

from tests import hevc_oracle
from tests.hevc_difftest import run_config

needs_oracle = pytest.mark.skipif(not hevc_oracle.available(),
                                  reason="libde265 not available")

SUBSET = [
    ("auto-qp26", dict(qp=26), (64, 64), False),
    ("nxn-dqp-sh", dict(qp=28, cu_log2=3, nxn=True, cu_qp_delta=True,
                        sign_hiding=True), (96, 64), False),
    ("ctb64-smooth", dict(qp=35, ctb_log2=6, cu_log2=6,
                          strong_smoothing=True), (128, 128), True),
    ("x265full", dict(qp=24, ctb_log2=6, cu_log2=6, var_cu=True, nxn=True,
                      rqt_depth=1, strong_smoothing=True, sign_hiding=True,
                      cu_qp_delta=True, diff_qg_depth=1, deblock=True,
                      sao=True, wpp=True, chroma_modes=True),
     (192, 192), False),
    # Main10 (ref: plugins/decoder_libde265.cc:123 reads bpp from the
    # decoded image — any-depth decode is reference behavior)
    ("10bit-auto-qp26", dict(qp=26, bit_depth=10), (64, 64), False),
    ("10bit-deblock-sao", dict(qp=34, deblock=True, sao=True,
                               bit_depth=10), (96, 96), True),
    ("10bit-x265full", dict(qp=24, ctb_log2=6, cu_log2=6, var_cu=True,
                            nxn=True, rqt_depth=1, strong_smoothing=True,
                            sign_hiding=True, cu_qp_delta=True,
                            diff_qg_depth=1, deblock=True, sao=True,
                            wpp=True, chroma_modes=True, bit_depth=10),
     (192, 128), True),
    # explicit scaling matrices (spec 7.3.4/8.6.3)
    ("slists-custom", dict(qp=26, scaling_lists="custom"),
     (96, 64), False),
    ("slists-custom-10bit", dict(qp=28, bit_depth=10, rqt_depth=1,
                                 scaling_lists="custom"), (96, 96), True),
]


@needs_oracle
@pytest.mark.parametrize("name,kw,size,smooth", SUBSET,
                         ids=[c[0] for c in SUBSET])
def test_difftest_config(name, kw, size, smooth):
    err = run_config(name, kw, size, smooth)
    assert err is None, err


def _decode_example_heic():
    from libheif_tpu.file import HeifFile
    from libheif_tpu.boxes.codec_cfg import Box_hvcC
    from libheif_tpu.codecs.hevc import headers as H
    from libheif_tpu.codecs.hevc.decoder import (split_length_prefixed,
                                                 decode_intra_picture)
    hf = HeifFile.from_file('/root/reference/examples/example.heic')
    pid = hf.primary_item_id
    cfg = hf.get_property(pid, Box_hvcC)
    hdr_nals = cfg.get_header_nals()
    nals = split_length_prefixed(hf.get_item_data(pid), cfg.length_size)
    sps = pps = None
    slices = []
    for nal in hdr_nals + nals:
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            sps = H.parse_sps(nal)
        elif t == H.NAL_PPS:
            pps = H.parse_pps(nal)
        elif H.is_slice(t):
            slices.append(nal)
    return hdr_nals + nals, decode_intra_picture(sps, pps, slices)


@needs_oracle
def test_example_heic_bit_exact():
    """Real x265 stream (WPP+SAO+deblock+AQ+RQT) decodes bit-exactly."""
    all_nals, (y, cb, cr) = _decode_example_heic()
    ref = hevc_oracle.decode_nals(all_nals)
    for name, mine in (("Y", y), ("Cb", cb), ("Cr", cr)):
        r = ref[name]
        assert np.array_equal(mine[:r.shape[0], :r.shape[1]], r), \
            f"{name} plane differs from libde265"


def test_ten_bit_heic_container_roundtrip():
    """10-bit HEIC through the full container path: encode → write →
    reload → decode keeps uint16 planes and 10-bit depth (ref:
    heif_decoding.h:84 HDR handling; decoder_libde265.cc:123)."""
    from libheif_tpu import api
    from libheif_tpu.option_types import EncodingOptions
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    rng = np.random.default_rng(11)
    img = PixelImage(120, 90, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, np.clip(
        np.kron(rng.integers(0, 1024, (12, 16)),
                np.ones((8, 8)))[:90, :120]
        + rng.integers(-20, 20, (90, 120)), 0, 1023).astype(np.uint16), 10)
    img.set_plane(Channel.Cb,
                  rng.integers(0, 1024, (45, 60)).astype(np.uint16), 10)
    img.set_plane(Channel.Cr,
                  rng.integers(0, 1024, (45, 60)).astype(np.uint16), 10)
    ctx = api.HeifContext()
    ctx.encode_image(img, fmt="hevc", options=EncodingOptions(quality=80))
    import io
    import tempfile
    import os
    fd, path = tempfile.mkstemp(suffix=".heic")
    os.close(fd)
    try:
        ctx.write_to_file(path)
        ctx2 = api.HeifContext.read_from_file(path)
        img2 = ctx2.decode_image(ctx2.primary_item_id,
                                 colorspace=Colorspace.YCbCr)
        assert img2.bit_depth(Channel.Y) == 10
        assert img2.plane(Channel.Y).dtype == np.uint16
        y1 = np.asarray(img.plane(Channel.Y), np.float64)
        y2 = np.asarray(img2.plane(Channel.Y), np.float64)
        psnr = 10 * np.log10(1023.0 ** 2 / ((y1 - y2) ** 2).mean())
        assert psnr > 40.0, psnr
    finally:
        os.unlink(path)
