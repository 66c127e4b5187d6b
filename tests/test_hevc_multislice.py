"""HEVC multi-slice pictures, bit-exact vs libde265 (spec 7.3.6.1
slice_segment_address + 6.4.1 same-slice availability).

x265-class encoders split large pictures into slices; the reference
decodes them via full libde265 (decoder_libde265.cc:479).  Streams come
from our own encoder's multi-slice mode (independent slice segments at
CTB-row boundaries, cross-slice loop filtering on — the x265 default).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import hevc_oracle
from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                           Colorspace, Chroma)
from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.codecs.hevc import headers as H
from libheif_tpu.codecs.hevc.decoder import decode_intra_picture

pytestmark = pytest.mark.skipif(not hevc_oracle.available(),
                                reason="libde265 not available")


def _img(w, h, bd=8, smooth=False, seed=7):
    rng = np.random.default_rng(seed)
    maxp = 1 << bd
    dt = np.uint8 if bd <= 8 else np.uint16
    img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)

    def pl(hh, ww):
        if smooth:
            base = rng.integers(0, maxp, (hh // 8 + 1, ww // 8 + 1))
            return np.kron(base, np.ones((8, 8)))[:hh, :ww].astype(dt)
        return rng.integers(0, maxp, (hh, ww)).astype(dt)
    img.set_plane(Channel.Y, pl(h, w), bd)
    img.set_plane(Channel.Cb, pl(h // 2, w // 2), bd)
    img.set_plane(Channel.Cr, pl(h // 2, w // 2), bd)
    return img


CASES = [
    ("2slices", dict(qp=26, num_slices=2), (96, 96), False, 8),
    ("3slices-smooth", dict(qp=30, num_slices=3), (96, 96), True, 8),
    ("4slices-deblock", dict(qp=28, num_slices=4, deblock=True),
     (128, 128), False, 8),
    ("slices-rqt", dict(qp=26, num_slices=2, rqt_depth=1),
     (96, 96), False, 8),
    ("slices-10bit", dict(qp=26, num_slices=2, bit_depth=10),
     (96, 96), False, 10),
    ("slices-nxn", dict(qp=28, num_slices=3, cu_log2=3, nxn=True),
     (96, 96), False, 8),
    ("slices-slists", dict(qp=26, num_slices=2,
                           scaling_lists="custom"), (96, 96), False, 8),
    ("8slices", dict(qp=30, num_slices=8, deblock=True),
     (128, 256), True, 8),
]


@pytest.mark.parametrize("name,kw,size,smooth,bd", CASES,
                         ids=[c[0] for c in CASES])
def test_multislice(name, kw, size, smooth, bd):
    w, h = size
    img = _img(w, h, bd, smooth)
    enc = IntraEncoder(w, h, EncParams(**kw))
    nals, cfg = enc.encode_slices(img)
    assert len(nals) == min(kw["num_slices"],
                            enc.height >> kw.get("ctb_log2", 5))
    sps = H.parse_sps(cfg[0])
    pps = H.parse_pps(cfg[1])
    mine = decode_intra_picture(sps, pps, nals, engine="python")
    ref = hevc_oracle.decode_nals(cfg + nals)
    assert ref is not None, "libde265 refused the stream"
    for a, k in zip(mine, ("Y", "Cb", "Cr")):
        assert np.array_equal(np.asarray(a, np.int64),
                              np.asarray(ref[k], np.int64)), (
            f"{k} differs from libde265")


def test_multislice_bad_coverage_rejected():
    """Dropping a middle slice must fail cleanly, not emit garbage."""
    img = _img(96, 96)
    enc = IntraEncoder(96, 96, EncParams(qp=26, num_slices=3))
    nals, cfg = enc.encode_slices(img)
    sps = H.parse_sps(cfg[0])
    pps = H.parse_pps(cfg[1])
    from libheif_tpu.core.error import HeifError
    with pytest.raises(HeifError):
        decode_intra_picture(sps, pps, [nals[0], nals[2]],
                             engine="python")
