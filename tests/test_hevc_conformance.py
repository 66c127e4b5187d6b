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
