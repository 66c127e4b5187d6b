"""Native C++ HEVC slice parser difftest vs the pure-Python engine.

The Python SliceParser (ctu.py) is the conformance anchor (validated
bit-exactly against libde265); the native engine (hevc_parse.cc) must
produce identical SliceSyntax output — maps, TU stream, coefficients,
SAO parameters — on every stream.
"""

import numpy as np
import pytest

from libheif_tpu import native
from libheif_tpu.codecs.hevc import headers as H
from libheif_tpu.codecs.hevc.ctu import SliceParser
from libheif_tpu.codecs.hevc.decoder import (remove_emulation_prevention,
                                             _substreams,
                                             split_length_prefixed)
from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.codecs.hevc.native_parse import (parse_slice_native,
                                                  native_available)
from tests.hevc_difftest import make_image

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native lib unavailable")

CONFIGS = [
    ("auto-qp26", dict(qp=26), (64, 64), False),
    ("nxn-dqp-sh", dict(qp=28, cu_log2=3, nxn=True, cu_qp_delta=True,
                        sign_hiding=True), (96, 64), False),
    ("sao-smooth", dict(qp=32, sao=True, deblock=True), (96, 64), True),
    ("x265full", dict(qp=24, ctb_log2=6, cu_log2=6, var_cu=True, nxn=True,
                      rqt_depth=1, strong_smoothing=True, sign_hiding=True,
                      cu_qp_delta=True, diff_qg_depth=1, deblock=True,
                      sao=True, wpp=True, chroma_modes=True),
     (192, 128), False),
]


def assert_syntax_equal(py, nat):
    for nm in ("intra_mode_y", "intra_mode_c", "ct_depth", "cu_log2",
               "tu_log2", "qp_y", "tqb_map", "nonzero_y"):
        np.testing.assert_array_equal(getattr(py, nm), getattr(nat, nm),
                                      err_msg=f"map {nm}")
    assert len(py.tus) == len(nat.tus)
    for i, (a, b) in enumerate(zip(py.tus, nat.tus)):
        assert (a.x, a.y, a.log2, a.c_idx, a.pred_mode, a.qp,
                a.transform_skip, a.tqb) == \
               (b.x, b.y, b.log2, b.c_idx, b.pred_mode, b.qp,
                b.transform_skip, b.tqb), f"TU {i}"
        assert (a.coeffs is None) == (b.coeffs is None), f"TU {i} coeffs"
        if a.coeffs is not None:
            np.testing.assert_array_equal(a.coeffs, b.coeffs,
                                          err_msg=f"TU {i} coeffs")
    assert set(py.sao.keys()) == set(nat.sao.keys())
    for k in py.sao:
        a, b = py.sao[k], nat.sao[k]
        assert a.type_idx == b.type_idx and a.offsets == b.offsets and \
            a.band_pos == b.band_pos and a.eo_class == b.eo_class, f"SAO {k}"


def parse_both(sps, pps, slice_nal):
    sh = H.parse_slice_header(slice_nal, sps, {pps.pps_id: pps})
    rbsp = remove_emulation_prevention(slice_nal[2:])
    subs = _substreams(slice_nal, rbsp, sh.data_offset_bits,
                       sh.entry_point_offsets)
    py = SliceParser(sps, pps, sh, rbsp, subs).parse()
    nat = parse_slice_native(sps, pps, sh, rbsp, subs)
    return py, nat


@needs_native
@pytest.mark.parametrize("name,kw,size,smooth", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_native_matches_python(name, kw, size, smooth):
    w, h = size
    img = make_image(w, h, 7, smooth)
    enc = IntraEncoder(w, h, EncParams(**kw))
    slice_nal, cfg_nals = enc.encode(img)
    sps = H.parse_sps(cfg_nals[0])
    pps = H.parse_pps(cfg_nals[1])
    py, nat = parse_both(sps, pps, slice_nal)
    assert_syntax_equal(py, nat)


@needs_native
@pytest.mark.parametrize("name,kw,size,smooth", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_native_full_decode_matches_python(name, kw, size, smooth):
    """Native parse+recon+filters (hevc_recon.cc) vs the numpy pipeline."""
    from libheif_tpu.codecs.hevc.native_parse import decode_picture_native
    from libheif_tpu.codecs.hevc.recon import IntraReconstructor
    from libheif_tpu.codecs.hevc.filters import Deblocker, apply_sao
    w, h = size
    img = make_image(w, h, 7, smooth)
    enc = IntraEncoder(w, h, EncParams(**kw))
    slice_nal, cfg_nals = enc.encode(img)
    sps = H.parse_sps(cfg_nals[0])
    pps = H.parse_pps(cfg_nals[1])
    sh = H.parse_slice_header(slice_nal, sps, {pps.pps_id: pps})
    rbsp = remove_emulation_prevention(slice_nal[2:])
    subs = _substreams(slice_nal, rbsp, sh.data_offset_bits,
                       sh.entry_point_offsets)
    syn = SliceParser(sps, pps, sh, rbsp, subs).parse()
    planes = IntraReconstructor(syn).run()
    Deblocker(syn, planes).run()
    py_planes = apply_sao(syn, planes)
    nat_planes = decode_picture_native(sps, pps, sh, rbsp, subs)
    assert nat_planes is not None
    for i, (a, b) in enumerate(zip(py_planes, nat_planes)):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {i}")


@needs_native
def test_native_example_heic():
    """Real x265 stream (WPP + SAO + AQ + RQT) parses identically."""
    import os
    path = "/root/reference/examples/example.heic"
    if not os.path.exists(path):
        pytest.skip("example.heic not available")
    from libheif_tpu.file import HeifFile
    from libheif_tpu.boxes.codec_cfg import Box_hvcC
    hf = HeifFile.from_file(path)
    pid = hf.primary_item_id
    cfg = hf.get_property(pid, Box_hvcC)
    nals = cfg.get_header_nals() + split_length_prefixed(
        hf.get_item_data(pid), cfg.length_size)
    sps = pps = slice_nal = None
    for nal in nals:
        t = (nal[0] >> 1) & 0x3f
        if t == 33:
            sps = H.parse_sps(nal)
        elif t == 34:
            pps = H.parse_pps(nal)
        elif t <= 31:
            slice_nal = nal
    py, nat = parse_both(sps, pps, slice_nal)
    assert_syntax_equal(py, nat)
