"""Device-assisted HEVC intra mode search (VERDICT r4 item 5): the
batched open-loop SATD search must agree with its host reference and
the resulting streams must stay conformant."""

import numpy as np
import pytest

from libheif_tpu.codecs.hevc.device_modes import (plan_modes_device,
                                                  plan_modes_host)
from libheif_tpu.codecs.hevc.encoder import IntraEncoder, EncParams
from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                           Colorspace, Chroma)


def _frame(w=128, h=96, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (120 + 70 * np.sin(xx / 11.0) + 50 * np.cos((xx + 2 * yy)
            / 17.0) + rng.integers(-10, 10, (h, w))) \
        .clip(0, 255).astype(np.uint8)


def test_device_matches_host_search():
    y = _frame()
    dev = plan_modes_device(y)
    host = plan_modes_host(y)
    assert set(dev) == {3, 4, 5}
    for lg in dev:
        agree = float((dev[lg] == host[lg]).mean())
        # identical math modulo float reduction order
        assert agree > 0.97, f"log2={lg}: only {agree:.3f} agreement"


def test_device_planned_stream_roundtrip():
    y = _frame(160, 128, 7)
    img = PixelImage(160, 128, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb, np.full((64, 80), 110, np.uint8), 8)
    img.set_plane(Channel.Cr, np.full((64, 80), 140, np.uint8), 8)
    enc = IntraEncoder(160, 128, EncParams(qp=30, mode="device"))
    nal, cfg = enc.encode(img)
    # our own decoder must reproduce the encoder recon
    from libheif_tpu.codecs.hevc.decoder import HevcDecoder

    class Cfg:
        def __init__(self, nals):
            self._n = nals
            self.length_size = 4

        def get_header_nals(self):
            return self._n

    payload = b"".join(len(n).to_bytes(4, "big") + n for n in [nal])
    out = HevcDecoder().decode_single_image(Cfg(cfg), payload)
    assert np.array_equal(np.asarray(out.plane(Channel.Y)),
                          enc.recon[0][:128, :160])


def test_device_planned_stream_vs_libde265():
    from tests import hevc_oracle
    if not hevc_oracle.available():
        pytest.skip("libde265 missing")
    y = _frame(160, 128, 11)
    img = PixelImage(160, 128, Colorspace.YCbCr, Chroma.C420)
    img.set_plane(Channel.Y, y, 8)
    img.set_plane(Channel.Cb, np.full((64, 80), 110, np.uint8), 8)
    img.set_plane(Channel.Cr, np.full((64, 80), 140, np.uint8), 8)
    enc = IntraEncoder(160, 128, EncParams(qp=30, mode="device"))
    nal, cfg = enc.encode(img)
    ref = hevc_oracle.decode_nals(cfg + [nal])
    assert np.array_equal(ref["Y"][:128, :160], enc.recon[0][:128, :160])
