"""HEVC device (TPU/jnp) reconstruction engine — bit-exactness tests.

The device engine (codecs/hevc/device_recon.py) must match the numpy
reference pipeline (recon.py + filters.py) bit-for-bit; the numpy
pipeline itself is difftested against libde265 (test_hevc_conformance).
Runs on the CPU backend via conftest — same XLA semantics as TPU for
int32 ops.
"""

import os

import numpy as np
import pytest

from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.codecs.hevc import headers as H
from libheif_tpu.codecs.hevc.decoder import (decode_intra_picture,
                                             parse_intra_picture)
from tests.hevc_difftest import make_image, CONFIGS

# representative subset of the encoder feature matrix (full sweep:
# tests/hevc_difftest.py); the x265full configs cover every tool at once
_SUBSET = [c for c in CONFIGS if c[0] in (
    "auto-qp26", "nxn-dqp-sh", "big-ctb-auto", "strongsmooth",
    "rqt1-cu32", "deblock-smooth", "sao", "wpp-ctb64",
    "x265full", "x265full-smooth", "dqp-big-varcu", "chromamodes")]


def _encode(name, kw, size, smooth, seed=7):
    w, h = size
    img = make_image(w, h, seed, smooth)
    enc = IntraEncoder(w, h, EncParams(**kw))
    slice_nal, cfg_nals = enc.encode(img)
    sps = H.parse_sps(cfg_nals[0])
    pps = H.parse_pps(cfg_nals[1])
    return sps, pps, [slice_nal]


@pytest.mark.parametrize("name,kw,size,smooth", _SUBSET,
                         ids=[c[0] for c in _SUBSET])
def test_device_matches_python(name, kw, size, smooth):
    sps, pps, slices = _encode(name, kw, size, smooth)
    ref = decode_intra_picture(sps, pps, slices, engine="python")
    dev = decode_intra_picture(sps, pps, slices, engine="device")
    for pi, (a, b) in enumerate(zip(ref, dev)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=f"{name} plane {pi}")


def test_device_example_heic():
    """Real x265 stream: device == native engine (which is bit-exact vs
    libde265, tests/test_hevc_conformance.py)."""
    path = "/root/reference/examples/example.heic"
    if not os.path.exists(path):
        pytest.skip("example.heic not available")
    from libheif_tpu.file import HeifFile
    from libheif_tpu.boxes.codec_cfg import Box_hvcC
    from libheif_tpu.codecs.hevc.decoder import split_length_prefixed
    hf = HeifFile.from_file(path)
    pid = hf.primary_item_id
    cfg = hf.get_property(pid, Box_hvcC)
    data = hf.get_item_data(pid)
    sps = pps = None
    for nal in cfg.get_header_nals():
        t = H.nal_type(nal)
        if t == H.NAL_SPS:
            sps = H.parse_sps(nal)
        elif t == H.NAL_PPS:
            pps = H.parse_pps(nal)
    slices = [n for n in split_length_prefixed(data, cfg.length_size)
              if H.is_slice(H.nal_type(n))]
    ref = decode_intra_picture(sps, pps, slices, engine="python")
    dev = decode_intra_picture(sps, pps, slices, engine="device")
    for pi, (a, b) in enumerate(zip(ref, dev)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=f"plane {pi}")


def test_device_batch_matches_individual():
    """A batch of pictures decodes identically to one-at-a-time — the
    grid-tile path (one program, tile batch axis)."""
    from libheif_tpu.codecs.hevc.device_recon import decode_pictures_device
    syns = []
    singles = []
    for seed, (name, kw, size, smooth) in enumerate(
            [c for c in CONFIGS if c[0] in ("auto-qp26", "sao",
                                            "deblock")][:3] * 2):
        sps, pps, slices = _encode(name, kw, (64, 64), smooth, seed=seed)
        syns.append(parse_intra_picture(sps, pps, slices))
        singles.append(decode_intra_picture(sps, pps, slices,
                                            engine="python"))
    batch = decode_pictures_device(syns)
    assert len(batch) == len(singles)
    for bi, (b, s) in enumerate(zip(batch, singles)):
        for pi in range(3):
            np.testing.assert_array_equal(
                np.asarray(b[pi]), np.asarray(s[pi]),
                err_msg=f"batch item {bi} plane {pi}")


def test_native_planner_matches_python():
    """hevc_plan.cc wave schedule == the pure-Python replay."""
    from libheif_tpu.codecs.hevc.device_recon import (
        _plan_waves, _plan_waves_python, tu_columns_from_syntax)
    sps, pps, slices = _encode("x265full", dict(
        qp=24, ctb_log2=6, cu_log2=6, var_cu=True, nxn=True,
        rqt_depth=1, strong_smoothing=True, sign_hiding=True,
        cu_qp_delta=True, diff_qg_depth=1, deblock=True, sao=True,
        wpp=True, chroma_modes=True), (192, 192), False)
    syn = parse_intra_picture(sps, pps, slices)
    cols, _, _ = tu_columns_from_syntax(syn)
    w1, a1 = _plan_waves(cols, sps.pic_width, sps.pic_height)
    w2, a2 = _plan_waves_python(cols, sps.pic_width, sps.pic_height)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(a1, a2)
