"""HT-J2K (ISO/IEC 15444-15) block-coder and codec tests.

Mirrors the reference's encode_htj2k.cc (round-trip through the
heif context with the htj2k compression format) and adds oracle
difftests: OpenJPEG 2.5 decodes HT cleanup-pass codestreams, so every
stream our encoder emits is verified bit-exact against it (via
Pillow).  Reference analog: plugins/encoder_openjph.cc,
codecs/jpeg2000_enc.h:84 Encoder_HTJ2K."""

import io
import os

import numpy as np
import pytest

from libheif_tpu.codecs.j2k.decoder import decode_codestream
from libheif_tpu.codecs.j2k.encoder import encode_codestream
from libheif_tpu.codecs.j2k.htj2k import (MagSgnReader, MagSgnWriter,
                                          MELDecoder, MELEncoder,
                                          VLCReader, VLCWriter,
                                          decode_cleanup, encode_cleanup)


class TestStreams:
    def test_magsgn_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            n = int(rng.integers(1, 200))
            widths = rng.integers(0, 13, n)
            vals = [int(rng.integers(0, 1 << w)) if w else 0 for w in widths]
            wtr = MagSgnWriter()
            for v, w in zip(vals, widths):
                wtr.bits(v, int(w))
            rd = MagSgnReader(wtr.flush())
            assert [rd.bits(int(w)) for w in widths] == vals

    def test_mel_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(50):
            n = int(rng.integers(1, 400))
            events = (rng.random(n) < rng.random()).astype(int).tolist()
            enc = MELEncoder()
            for e in events:
                enc.event(e)
            dec = MELDecoder(enc.flush())
            assert [dec.event() for _ in events] == events

    def test_vlc_backward_roundtrip(self):
        rng = np.random.default_rng(2)
        for _ in range(100):
            n = int(rng.integers(1, 300))
            bits = rng.integers(0, 2, n).tolist()
            w = VLCWriter()
            for b in bits:
                w.bits.append(int(b))
            nib, tail = w.pack()
            scup = len(tail) + 2
            seg = bytes(reversed(tail)) + bytes([(nib << 4) | (scup & 0xF),
                                                 scup >> 4])
            rd = VLCReader(seg, len(seg), scup)
            got = []
            for b in bits:
                got.append(rd.peek(1))
                rd.skip(1)
            assert got == bits


class TestCleanupBlock:
    @pytest.mark.parametrize("shape", [(1, 1), (2, 2), (3, 5), (64, 64),
                                       (17, 33), (1, 64), (64, 1)])
    def test_roundtrip_shapes(self, shape):
        rng = np.random.default_rng(3)
        h, w = shape
        a = rng.integers(-4000, 4000, (h, w))
        a[rng.random((h, w)) > 0.6] = 0
        if not a.any():
            a[0, 0] = 1
        seg, B = encode_cleanup(a)
        assert (decode_cleanup(seg, w, h, 14) == a).all()

    def test_roundtrip_random_sweep(self):
        rng = np.random.default_rng(4)
        for _ in range(120):
            h = int(rng.integers(1, 65))
            w = int(rng.integers(1, 65))
            mag = int(rng.integers(1, 15))
            a = rng.integers(-(1 << mag), 1 << mag, (h, w))
            a[rng.random((h, w)) > rng.random()] = 0
            if not a.any():
                continue
            seg, B = encode_cleanup(a)
            out = decode_cleanup(seg, w, h, mag + 2)
            assert (out == a).all()


class TestCodestream:
    def test_self_roundtrip_gray(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (57, 93)).astype(np.int32)
        data = encode_codestream([img], depth=8, levels=3,
                                 reversible=True, htj2k=True)
        planes, cs = decode_codestream(data)
        assert cs.cod.cbstyle == 0x40
        assert cs.cap is not None and cs.cap.has_htj2k
        assert (planes[0] == img).all()

    def test_self_roundtrip_rgb_mct(self):
        rng = np.random.default_rng(6)
        planes = [rng.integers(0, 256, (40, 61)).astype(np.int32)
                  for _ in range(3)]
        data = encode_codestream(planes, depth=8, levels=4,
                                 reversible=True, htj2k=True)
        out, _ = decode_codestream(data)
        for a, b in zip(out, planes):
            assert (a == b).all()

    def test_self_roundtrip_16bit(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 1 << 12, (33, 47)).astype(np.int32)
        data = encode_codestream([img], depth=12, levels=2,
                                 reversible=True, htj2k=True)
        planes, _ = decode_codestream(data)
        assert (planes[0] == img).all()


PIL = pytest.importorskip("PIL.Image")


def _opj_decode(data: bytes) -> np.ndarray:
    return np.asarray(PIL.open(io.BytesIO(data)))


class TestOracleDifftest:
    """OpenJPEG (which embeds the normative HT decoder) must decode
    our HT codestreams bit-exactly."""

    @pytest.mark.parametrize("shape,levels", [((8, 8), 0), ((64, 64), 2),
                                              ((57, 93), 3), ((200, 317), 5)])
    def test_gray_lossless(self, shape, levels):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_codestream([img.astype(np.int32)], depth=8,
                                 levels=levels, reversible=True, htj2k=True)
        assert (_opj_decode(data) == img).all()

    def test_rgb_mct_lossless(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (45, 77, 3), dtype=np.uint8)
        planes = [img[:, :, c].astype(np.int32) for c in range(3)]
        data = encode_codestream(planes, depth=8, levels=3,
                                 reversible=True, htj2k=True)
        assert (_opj_decode(data) == img).all()

    def test_smooth_image(self):
        y, x = np.mgrid[0:96, 0:128]
        img = ((np.sin(x / 9.0) + np.cos(y / 7.0)) * 60 + 128).astype(
            np.uint8)
        data = encode_codestream([img.astype(np.int32)], depth=8,
                                 levels=4, reversible=True, htj2k=True)
        assert (_opj_decode(data) == img).all()

    @pytest.mark.parametrize("quality", [90, 60])
    def test_lossy_97(self, quality):
        y, x = np.mgrid[0:96, 0:128]
        img = ((np.sin(x / 9.0) + np.cos(y / 7.0)) * 60 + 128).astype(
            np.uint8)
        data = encode_codestream([img.astype(np.int32)], depth=8,
                                 levels=4, reversible=False,
                                 quality=quality, htj2k=True)
        ref = _opj_decode(data).astype(np.int64)
        mine, _ = decode_codestream(data)
        # same codestream: both decoders within 1 LSB of each other
        # (9/7 float reconstruction), both near the source
        assert np.abs(mine[0].astype(np.int64) - ref).max() <= 1
        psnr = 10 * np.log10(
            255 ** 2 / max(((img.astype(float) - ref) ** 2).mean(), 1e-9))
        assert psnr > (55 if quality == 90 else 40)

    def test_sparse_extremes(self):
        img = np.full((32, 32), 128, np.uint8)
        img[0, 0] = 255
        img[31, 31] = 0
        img[13, 17] = 1
        data = encode_codestream([img.astype(np.int32)], depth=8,
                                 levels=2, reversible=True, htj2k=True)
        assert (_opj_decode(data) == img).all()

    def test_randomized_oracle_sweep(self):
        rng = np.random.default_rng(20)
        for t in range(12):
            h = int(rng.integers(1, 130))
            w = int(rng.integers(1, 170))
            lv = int(rng.integers(0, 6))
            kind = t % 3
            if kind == 0:
                img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            elif kind == 1:
                yy, xx = np.mgrid[0:h, 0:w]
                img = ((np.sin(xx / (1 + rng.random() * 20))
                        * np.cos(yy / (1 + rng.random() * 20)))
                       * 100 + 128).astype(np.uint8)
            else:
                img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
                for _ in range(8):
                    y0 = int(rng.integers(0, h))
                    x0 = int(rng.integers(0, w))
                    img[y0:y0 + int(rng.integers(1, 20)),
                        x0:x0 + int(rng.integers(1, 20))] = \
                        int(rng.integers(0, 256))
            data = encode_codestream([img.astype(np.int32)], depth=8,
                                     levels=lv, reversible=True, htj2k=True)
            assert (_opj_decode(data) == img).all(), (h, w, lv, kind)


class TestHeifIntegration:
    """encode_htj2k.cc equivalent: htj2k format through the context."""

    def _rgb_image(self):
        from libheif_tpu.image.pixel_image import (Channel, Chroma,
                                                   Colorspace, PixelImage)
        rng = np.random.default_rng(10)
        img = PixelImage(61, 39, Colorspace.RGB, Chroma.C444)
        for ch in (Channel.R, Channel.G, Channel.B):
            img.set_plane(ch, rng.integers(0, 256, (39, 61),
                                           dtype=np.uint8), 8)
        return img

    def test_htj2k_item_roundtrip(self):
        from libheif_tpu.api.types import EncodingOptions
        from libheif_tpu.context import HeifContext
        from libheif_tpu.image.pixel_image import Channel
        img = self._rgb_image()
        ctx = HeifContext()
        ctx.new_file()
        ctx.encode_image(img, fmt="htj2k",
                         options=EncodingOptions(lossless=True))
        data = ctx.write()
        ctx2 = HeifContext.read_from_bytes(data)
        info = ctx2.get_image_info(ctx2.primary_item_id)
        assert info["type"] == "j2k1"
        out = ctx2.decode_image()
        for ch in (Channel.R, Channel.G, Channel.B):
            assert (np.asarray(out.plane(ch))
                    == np.asarray(img.plane(ch))).all()

    def test_encoder_descriptor_present(self):
        from libheif_tpu.api.encoding import heif_get_encoder_descriptors
        descs = heif_get_encoder_descriptors("htj2k")
        assert descs, "htj2k encoder not registered"


class TestHTRefinementPasses:
    """SigProp + MagRef refinement passes (T.814 7.4/7.5, ht_passes=3):
    lossless roundtrip and bit-exact decode by the OpenJPEG 2.5 HT
    oracle."""

    def test_self_roundtrip(self):
        rng = np.random.default_rng(7)
        img = np.clip(
            np.kron(rng.integers(0, 256, (16, 16)).astype(float),
                    np.ones((8, 8))) +
            rng.integers(-12, 13, (128, 128)), 0, 255).astype(np.int32)
        data = encode_codestream([img], depth=8, levels=3,
                                 reversible=True, htj2k=True, ht_passes=3)
        planes, _ = decode_codestream(data)
        assert (planes[0] == img).all()

    def test_opj_oracle_sweep(self):
        rng = np.random.default_rng(31)
        n = 40 if os.environ.get("LIBHEIF_TPU_FULL_SWEEP") else 12
        for _ in range(n):
            h, w = [int(v) for v in rng.integers(2, 33, 2)]
            img = rng.integers(0, 256, (h, w)).astype(np.int32)
            if not (np.abs(img - 128) >> 1).any():
                continue
            data = encode_codestream([img], depth=8, levels=0,
                                     reversible=True, htj2k=True,
                                     ht_passes=3)
            assert (_opj_decode(data) == img).all()

    def test_opj_oracle_sigprop_heavy(self):
        rng = np.random.default_rng(4)
        n = 40 if os.environ.get("LIBHEIF_TPU_FULL_SWEEP") else 12
        done = 0
        for _ in range(200):
            if done >= n:
                break
            h, w = [int(v) for v in rng.integers(2, 13, 2)]
            img = (128 + rng.integers(-4, 5, (h, w))).astype(np.int32)
            if not (np.abs(img - 128) >> 1).any():
                continue
            data = encode_codestream([img], depth=8, levels=0,
                                     reversible=True, htj2k=True,
                                     ht_passes=3)
            assert (_opj_decode(data) == img).all()
            done += 1

    def test_opj_oracle_multilevel(self):
        rng = np.random.default_rng(7)
        img = np.clip(
            np.kron(rng.integers(0, 256, (16, 16)).astype(float),
                    np.ones((8, 8))) +
            rng.integers(-12, 13, (128, 128)), 0, 255).astype(np.int32)
        data = encode_codestream([img], depth=8, levels=3,
                                 reversible=True, htj2k=True, ht_passes=3)
        assert (_opj_decode(data) == img).all()

    def test_opj_oracle_coarse_plane_convention(self):
        """Cleanup-only streams at p>1 (foreign zero-bit-plane
        conventions, ADVICE r3) decode with the same midpoint
        reconstruction as OpenJPEG."""
        rng = np.random.default_rng(3)
        for k in (1, 2, 3):
            h, w = [int(v) for v in rng.integers(4, 33, 2)]
            img = rng.integers(0, 256, (h, w)).astype(np.int32)
            cs = encode_codestream([img], depth=8, levels=0,
                                   reversible=True, htj2k=True,
                                   ht_drop_planes=k)
            mine, _ = decode_codestream(cs)
            ref = np.asarray(_opj_decode(cs), np.int64)
            np.testing.assert_array_equal(ref,
                                          np.clip(mine[0], 0, 255),
                                          err_msg=f"drop_planes={k}")
