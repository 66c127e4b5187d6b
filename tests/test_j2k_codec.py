"""JPEG 2000 codec conformance tests.

Difftests against OpenJPEG (via Pillow) in both directions:
decode our way from opj-encoded codestreams (bit-exact for the
reversible 5/3 path, near-exact for 9/7), and decode opj's way from
our codestreams.  Mirrors the reference's reliance on OpenJPEG
(plugins/decoder_openjpeg.cc) as ground truth.
"""

import io

import numpy as np
import pytest

from libheif_tpu.codecs.j2k.decoder import decode_codestream
from libheif_tpu.codecs.j2k.encoder import encode_codestream
from libheif_tpu.codecs.j2k.mq import MQDecoder, MQEncoder
from libheif_tpu.codecs.j2k import dwt
from libheif_tpu.codecs.j2k.t1 import T1Decoder, T1Encoder

PIL = pytest.importorskip("PIL.Image")


def _opj_encode(arr: np.ndarray, mode: str, **kw) -> bytes:
    im = PIL.fromarray(arr, mode)
    buf = io.BytesIO()
    im.save(buf, format="JPEG2000", irreversible=kw.pop("irreversible", False),
            **kw)
    return buf.getvalue()


def _opj_decode(data: bytes) -> np.ndarray:
    return np.asarray(PIL.open(io.BytesIO(data)))


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


class TestMQ:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(40):
            n = int(rng.integers(1, 1500))
            ctxs = rng.integers(0, 19, n)
            bits = (rng.random(n) < rng.random()).astype(int)
            enc = MQEncoder()
            for c, b in zip(ctxs, bits):
                enc.encode(int(c), int(b))
            dec = MQDecoder(enc.flush())
            assert [dec.decode(int(c)) for c in ctxs] == list(bits)


class TestDWT:
    @pytest.mark.parametrize("shape", [(23, 37), (5, 7), (1, 9), (16, 17)])
    @pytest.mark.parametrize("parity", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_53_roundtrip(self, shape, parity):
        rng = np.random.default_rng(5)
        x = rng.integers(-500, 500, shape).astype(np.int32)
        subs = dwt.sd_2d(x, parity[0], parity[1], True)
        x2 = dwt.sr_2d(*subs, parity[0], parity[1], True)
        assert (x2 == x).all()

    def test_97_roundtrip(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(33, 41)) * 100
        subs = dwt.sd_2d(x, 0, 0, False)
        x2 = dwt.sr_2d(*subs, 0, 0, False)
        assert np.abs(x2 - x).max() < 1e-8


class TestT1:
    @pytest.mark.parametrize("shape", [(23, 37), (3, 5), (4, 4), (64, 64)])
    def test_roundtrip(self, shape):
        rng = np.random.default_rng(7)
        for orient in range(4):
            c = rng.integers(-300, 300, shape).astype(np.int32)
            e = T1Encoder(shape[1], shape[0], orient)
            data, npasses, nplanes = e.encode(c)
            d = T1Decoder(shape[1], shape[0], orient)
            out = d.decode(data, npasses, 12, 12 - nplanes)
            assert (out == c).all()


class TestDecodeVsOpenJPEG:
    @pytest.mark.parametrize("shape,res", [
        ((16, 16), 2), ((23, 37), 4), ((96, 128), 6), ((1, 1), 1),
        ((255, 257), 6),
    ])
    def test_gray_lossless_bitexact(self, shape, res):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        data = _opj_encode(a, "L", num_resolutions=res)
        planes, cs = decode_codestream(data)
        assert (planes[0] == _opj_decode(data)).all()

    def test_rgb_mct_lossless_bitexact(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        data = _opj_encode(a, "RGB", num_resolutions=4)
        planes, cs = decode_codestream(data)
        assert (np.stack(planes, -1) == _opj_decode(data)).all()

    def test_multi_tile_bitexact(self):
        rng = np.random.default_rng(4)
        a = rng.integers(0, 256, (96, 96), dtype=np.uint8)
        data = _opj_encode(a, "L", num_resolutions=3, tile_size=(32, 32))
        planes, _ = decode_codestream(data)
        assert (planes[0] == _opj_decode(data)).all()

    def test_irreversible_97_close(self):
        yy, xx = np.mgrid[0:120, 0:160]
        img = (np.sin(xx / 9) * 60 + np.cos(yy / 7) * 50 + 128)
        img = img.clip(0, 255).astype(np.uint8)
        data = _opj_encode(img, "L", irreversible=True, num_resolutions=5)
        planes, _ = decode_codestream(data)
        ref = _opj_decode(data)
        assert np.abs(planes[0].astype(int) - ref.astype(int)).max() <= 2
        assert _psnr(planes[0], ref) > 55

    def test_rate_truncated_layers(self):
        yy, xx = np.mgrid[0:120, 0:160]
        img = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        data = _opj_encode(img, "L", irreversible=True, num_resolutions=5,
                           quality_mode="rates", quality_layers=[20])
        planes, _ = decode_codestream(data)
        # truncated stream: compare against openjpeg's own reconstruction
        assert _psnr(planes[0], _opj_decode(data)) > 35


class TestEncodeVsOpenJPEG:
    @pytest.mark.parametrize("shape,levels", [
        ((16, 16), 1), ((16, 16), 0), ((96, 128), 5), ((23, 37), 3),
        ((300, 400), 5),
    ])
    def test_gray_lossless(self, shape, levels):
        rng = np.random.default_rng(8)
        a = rng.integers(0, 256, shape).astype(np.int32)
        data = encode_codestream([a], levels=levels)
        got, _ = decode_codestream(data)
        assert (got[0] == a).all()                     # self
        assert (_opj_decode(data) == a).all()          # oracle

    def test_rgb_mct_lossless(self):
        rng = np.random.default_rng(9)
        planes = [rng.integers(0, 256, (48, 64)).astype(np.int32)
                  for _ in range(3)]
        data = encode_codestream(planes, levels=4)
        got, _ = decode_codestream(data)
        assert all((g == p).all() for g, p in zip(got, planes))
        assert (_opj_decode(data) == np.stack(planes, -1)).all()

    def test_16bit_lossless(self):
        rng = np.random.default_rng(10)
        a = rng.integers(0, 65536, (33, 29)).astype(np.int32)
        data = encode_codestream([a], depth=16, levels=4)
        got, _ = decode_codestream(data)
        assert (got[0] == a).all()
        ref = _opj_decode(data)
        assert (ref.astype(np.int64) == a).all()

    def test_lossy_97(self):
        yy, xx = np.mgrid[0:120, 0:160]
        img = (np.sin(xx / 9) * 60 + np.cos(yy / 7) * 50 + 128)
        img = img.clip(0, 255).astype(np.uint8)
        data = encode_codestream([img.astype(np.int32)], reversible=False,
                                 quality=70, levels=5)
        ref = _opj_decode(data)          # oracle decodes our lossy stream
        got, _ = decode_codestream(data)
        assert _psnr(img, ref) > 38
        assert _psnr(got[0], ref) > 45   # our decode agrees with oracle


class TestHeifIntegration:
    def _rgb_image(self, w=51, h=37, seed=0):
        from libheif_tpu.image.pixel_image import (Channel, Chroma,
                                                   Colorspace, PixelImage)
        rng = np.random.default_rng(seed)
        img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
        for ch in (Channel.R, Channel.G, Channel.B):
            img.set_plane(ch, rng.integers(0, 256, (h, w), dtype=np.uint8), 8)
        return img

    def test_j2k1_item_roundtrip(self):
        from libheif_tpu.api.types import EncodingOptions
        from libheif_tpu.context import HeifContext
        from libheif_tpu.image.pixel_image import Channel
        img = self._rgb_image()
        ctx = HeifContext()
        ctx.new_file()
        ctx.encode_image(img, fmt="jpeg2000",
                         options=EncodingOptions(lossless=True))
        data = ctx.write()
        ctx2 = HeifContext.read_from_bytes(data)
        info = ctx2.get_image_info(ctx2.primary_item_id)
        assert info["type"] == "j2k1"
        out = ctx2.decode_image()
        for ch in (Channel.R, Channel.G, Channel.B):
            assert (np.asarray(out.plane(ch))
                    == np.asarray(img.plane(ch))).all()

    def test_j2kH_property_roundtrip(self):
        from libheif_tpu.api.types import EncodingOptions
        from libheif_tpu.boxes.j2k import Box_cdef, Box_j2kH
        from libheif_tpu.context import HeifContext
        img = self._rgb_image()
        ctx = HeifContext()
        ctx.new_file()
        iid = ctx.encode_image(img, fmt="jpeg2000",
                               options=EncodingOptions(lossless=True))
        data = ctx.write()
        ctx2 = HeifContext.read_from_bytes(data)
        item = ctx2.get_item(iid)
        j2kh = item.get_property(Box_j2kH)
        assert j2kh is not None
        cdef = j2kh.get_child(Box_cdef)
        assert cdef.channels == [(0, 0, 1), (1, 0, 2), (2, 0, 3)]


class TestNativeT1:
    """Native MQ/EBCOT tier-1 engine (native/src/j2k_t1.cc) must match
    the Python anchor bit-for-bit, both directions, incl. truncated
    pass counts."""

    def test_native_matches_python(self, monkeypatch):
        from libheif_tpu.codecs.j2k.t1 import T1Decoder, T1Encoder
        from libheif_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(11)
        for _ in range(12):
            h, w = [int(v) for v in rng.integers(1, 65, 2)]
            orient = int(rng.integers(0, 4))
            coeffs = rng.integers(-500, 501, (h, w)).astype(np.int32)
            monkeypatch.setenv("TPUHEIF_J2K_NATIVE", "0")
            d_py, np_py, npl = T1Encoder(w, h, orient).encode(coeffs)
            monkeypatch.setenv("TPUHEIF_J2K_NATIVE", "1")
            d_nat, np_nat, npl_n = T1Encoder(w, h, orient).encode(coeffs)
            assert (d_py, np_py, npl) == (d_nat, np_nat, npl_n)
            mb = npl + 2
            for npass in (np_py, max(1, np_py - 2)):
                monkeypatch.setenv("TPUHEIF_J2K_NATIVE", "0")
                r_py = T1Decoder(w, h, orient).decode(d_py, npass, mb,
                                                      mb - npl)
                monkeypatch.setenv("TPUHEIF_J2K_NATIVE", "1")
                r_nat = T1Decoder(w, h, orient).decode(d_py, npass, mb,
                                                       mb - npl)
                np.testing.assert_array_equal(r_py, r_nat)
