"""Color conversion tests (model: reference tests/conversion.cc, 896 LoC)."""

import numpy as np
import pytest

from libheif_tpu.image.pixel_image import PixelImage, Channel, Colorspace, Chroma
from libheif_tpu.color import convert_image, get_kr_kb, NclxProfile
from libheif_tpu.color.state import ColorState
from libheif_tpu.color.pipeline import find_pipeline
from libheif_tpu.color.ops import ColorConversionOptions


def make_rgb(w=16, h=8, bits=8, alpha=False):
    img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
    rng = np.random.default_rng(42)
    dt = np.uint8 if bits <= 8 else np.uint16
    for ch in (Channel.R, Channel.G, Channel.B):
        img.set_plane(ch, rng.integers(0, 1 << bits, (h, w)).astype(dt), bits)
    if alpha:
        img.set_plane(Channel.Alpha,
                      rng.integers(0, 1 << bits, (h, w)).astype(dt), bits)
    return img


class TestKrKb:
    def test_standard_matrices(self):
        assert get_kr_kb(1) == (0.2126, 0.0722)    # BT.709
        assert get_kr_kb(6) == (0.299, 0.114)      # BT.601
        assert get_kr_kb(9) == (0.2627, 0.0593)    # BT.2020

    def test_derived_from_primaries(self):
        # matrix 12 + BT.709 primaries ≈ BT.709 constants (ref: nclx.cc:45)
        kr, kb = get_kr_kb(12, 1)
        assert abs(kr - 0.2126) < 0.001
        assert abs(kb - 0.0722) < 0.001


class TestYCbCrRGB:
    def test_gray_roundtrip_identity(self):
        """Neutral grays map to Y=v, Cb=Cr=128 and back exactly."""
        img = PixelImage(8, 4, Colorspace.RGB, Chroma.C444)
        v = np.full((4, 8), 77, np.uint8)
        for ch in "RGB":
            img.set_plane(ch, v, 8)
        ycc = convert_image(img, Colorspace.YCbCr, Chroma.C444)
        assert np.asarray(ycc.plane("Y"))[0, 0] == 77
        assert np.asarray(ycc.plane("Cb"))[0, 0] == 128
        back = convert_image(ycc, Colorspace.RGB)
        for ch in "RGB":
            np.testing.assert_array_equal(np.asarray(back.plane(ch)), v)

    def test_known_bt601_values(self):
        """Pure red BT.601 full range: Y=76, Cb=85, Cr=255."""
        img = PixelImage(4, 4, Colorspace.RGB, Chroma.C444)
        img.set_plane("R", np.full((4, 4), 255, np.uint8), 8)
        img.set_plane("G", np.zeros((4, 4), np.uint8), 8)
        img.set_plane("B", np.zeros((4, 4), np.uint8), 8)
        ycc = convert_image(img, Colorspace.YCbCr, Chroma.C444)
        assert np.asarray(ycc.plane("Y"))[0, 0] == 76
        assert np.asarray(ycc.plane("Cb"))[0, 0] == 85
        assert np.asarray(ycc.plane("Cr"))[0, 0] == 255

    def test_rgb_ycbcr444_roundtrip_close(self):
        img = make_rgb()
        ycc = convert_image(img, Colorspace.YCbCr, Chroma.C444)
        back = convert_image(ycc, Colorspace.RGB)
        for ch in "RGB":
            diff = np.abs(np.asarray(back.plane(ch)).astype(int) -
                          np.asarray(img.plane(ch)).astype(int))
            assert diff.max() <= 2, f"channel {ch} max diff {diff.max()}"

    def test_limited_range_roundtrip(self):
        img = make_rgb()
        ycc = convert_image(img, Colorspace.YCbCr, Chroma.C444,
                            target_full_range=False)
        y = np.asarray(ycc.plane("Y"))
        assert y.min() >= 16 and y.max() <= 235
        ycc.color_profile_nclx = NclxProfile(full_range_flag=False)
        back = convert_image(ycc, Colorspace.RGB)
        for ch in "RGB":
            diff = np.abs(np.asarray(back.plane(ch)).astype(int) -
                          np.asarray(img.plane(ch)).astype(int))
            assert diff.max() <= 3

    def test_chroma_420_shapes(self):
        img = make_rgb(17, 9)  # odd sizes
        ycc = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        assert np.asarray(ycc.plane("Y")).shape == (9, 17)
        assert np.asarray(ycc.plane("Cb")).shape == (5, 9)
        back = convert_image(ycc, Colorspace.RGB)
        assert np.asarray(back.plane("R")).shape == (9, 17)

    def test_decoded_fixture_to_rgb(self):
        """End-to-end: unci YCbCr 420 fixture → RGB conversion."""
        from tests.test_unc_decode import decode_file, fixture
        img, _ = decode_file(fixture("uncompressed_comp_YUV_420.heif"))
        rgb = convert_image(img, Colorspace.RGB)
        assert set(rgb.channels()) == {"R", "G", "B"}
        r = np.asarray(rgb.plane("R"))
        assert r.shape == (20, 32)


class TestMono:
    def test_mono_to_rgb(self):
        img = PixelImage(8, 4, Colorspace.Monochrome, Chroma.Monochrome)
        v = np.arange(32, dtype=np.uint8).reshape(4, 8)
        img.set_plane("Y", v, 8)
        rgb = convert_image(img, Colorspace.RGB)
        for ch in "RGB":
            np.testing.assert_array_equal(np.asarray(rgb.plane(ch)), v)

    def test_mono_to_ycbcr(self):
        img = PixelImage(8, 4, Colorspace.Monochrome, Chroma.Monochrome)
        img.set_plane("Y", np.full((4, 8), 10, np.uint8), 8)
        ycc = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        assert np.asarray(ycc.plane("Cb")).shape == (2, 4)
        assert (np.asarray(ycc.plane("Cb")) == 128).all()


class TestBitDepthAlpha:
    def test_16_to_8(self):
        img = make_rgb(bits=16)
        out = convert_image(img, Colorspace.RGB, target_bits=8)
        r16 = np.asarray(img.plane("R")).astype(np.uint32)
        r8 = np.asarray(out.plane("R"))
        np.testing.assert_array_equal(
            r8, np.minimum((r16 + 128) >> 8, 255).astype(np.uint8))

    def test_8_to_16_replication(self):
        img = make_rgb(bits=8)
        out = convert_image(img, Colorspace.RGB, target_bits=16)
        r8 = np.asarray(img.plane("R")).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(out.plane("R")),
                                      ((r8 << 8) | r8).astype(np.uint16))
        # 255 maps to full-scale
        assert convert_image(img, Colorspace.RGB, target_bits=16) is not None

    def test_drop_and_add_alpha(self):
        img = make_rgb(alpha=True)
        out = convert_image(img, Colorspace.RGB, target_has_alpha=False)
        assert not out.has_channel("Alpha")
        out2 = convert_image(out, Colorspace.RGB, target_has_alpha=True)
        assert (np.asarray(out2.plane("Alpha")) == 255).all()


class TestPipelineSearch:
    def test_identity_is_empty(self):
        s = ColorState(Colorspace.RGB, Chroma.C444, False, 8)
        assert find_pipeline(s, s) == []

    def test_multi_step_chain(self):
        """mono 16-bit → RGB 8-bit with alpha requires 3 ops."""
        inp = ColorState(Colorspace.Monochrome, Chroma.Monochrome, False, 16)
        target = ColorState(Colorspace.RGB, Chroma.C444, True, 8)
        chain = find_pipeline(inp, target)
        assert chain is not None and 2 <= len(chain) <= 4

    def test_unreachable_returns_none(self):
        inp = ColorState(Colorspace.Nonvisual, Chroma.Undefined, False, 8)
        target = ColorState(Colorspace.RGB, Chroma.C444, False, 8)
        assert find_pipeline(inp, target) is None

    def test_ycbcr420_to_422(self):
        inp = ColorState(Colorspace.YCbCr, Chroma.C420, False, 8)
        target = ColorState(Colorspace.YCbCr, Chroma.C422, False, 8)
        chain = find_pipeline(inp, target)
        assert chain is not None and len(chain) == 1


class TestInterleavedRGB:
    """rgb2rgb.cc op parity: planar ↔ packed interleaved RGB(A)."""

    def _rgb(self, alpha=False):
        import numpy as np
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        h, w = 12, 20
        img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
        base = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        img.set_plane(Channel.R, base, 8)
        img.set_plane(Channel.G, base + 1, 8)
        img.set_plane(Channel.B, base + 2, 8)
        if alpha:
            img.set_plane(Channel.Alpha, base + 3, 8)
        return img, base

    def test_pack_rgba_roundtrip(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        img, base = self._rgb(alpha=True)
        packed = convert_image(img, Colorspace.RGB, Chroma.InterleavedRGBA)
        a = np.asarray(packed.plane(Channel.Interleaved)).reshape(12, 20, 4)
        assert np.array_equal(a[:, :, 0], base)
        assert np.array_equal(a[:, :, 3], base + 3)
        back = convert_image(packed, Colorspace.RGB, Chroma.C444)
        assert np.array_equal(np.asarray(back.plane(Channel.Alpha)),
                              base + 3)

    def test_pack_rgb_fills_opaque_alpha_on_rgba(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        img, _ = self._rgb(alpha=False)
        packed = convert_image(img, Colorspace.RGB, Chroma.InterleavedRGBA)
        a = np.asarray(packed.plane(Channel.Interleaved)).reshape(12, 20, 4)
        assert np.all(a[:, :, 3] == 255)

    def test_alpha_dropped_for_rgb_target(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        img, base = self._rgb(alpha=True)
        packed = convert_image(img, Colorspace.RGB, Chroma.InterleavedRGB)
        a = np.asarray(packed.plane(Channel.Interleaved))
        assert a.shape == (12, 60)
        assert np.array_equal(a.reshape(12, 20, 3)[:, :, 2], base + 2)

    def test_ycbcr420_to_interleaved_chain(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        h, w = 16, 24
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, np.full((h, w), 81, np.uint8), 8)
        img.set_plane(Channel.Cb, np.full((h // 2, w // 2), 90, np.uint8), 8)
        img.set_plane(Channel.Cr, np.full((h // 2, w // 2), 240, np.uint8), 8)
        out = convert_image(img, Colorspace.RGB, Chroma.InterleavedRGB)
        a = np.asarray(out.plane(Channel.Interleaved)).reshape(h, w, 3)
        # BT.601 81/90/240 ≈ red (the classic conformance triple)
        assert a[0, 0, 0] > 200 and a[0, 0, 1] < 60 and a[0, 0, 2] < 60

    def test_decode_to_interleaved(self):
        import numpy as np
        from libheif_tpu.api import HeifContext
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        import os
        path = "/root/reference/tests/data/uncompressed_pix_RGB.heif"
        if not os.path.exists(path):
            import pytest
            pytest.skip("fixture missing")
        ctx = HeifContext.read_from_file(path)
        img = ctx.decode_image(ctx.primary_item_id,
                               colorspace=Colorspace.RGB,
                               chroma=Chroma.InterleavedRGBA)
        a = np.asarray(img.plane(Channel.Interleaved))
        assert a.shape[1] % 4 == 0
        planar = ctx.decode_image(ctx.primary_item_id,
                                  colorspace=Colorspace.RGB,
                                  chroma=Chroma.C444)
        r = np.asarray(planar.plane(Channel.R))
        assert np.array_equal(a.reshape(r.shape[0], r.shape[1], 4)[:, :, 0],
                              r)


class TestFlattenAlpha:
    """Op_flatten_alpha_plane equivalent (ref: alpha.cc:95, activated
    via heif_alpha_composition_mode, heif_color.h:74)."""

    def _rgba(self, w=20, h=12):
        import numpy as np
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(11)
        img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
        for ch in (Channel.R, Channel.G, Channel.B, Channel.Alpha):
            img.set_plane(ch, rng.integers(0, 256, (h, w), dtype=np.uint8),
                          8)
        return img

    def test_solid_color_flatten(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.color.ops import ColorConversionOptions
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        img = self._rgba()
        opts = ColorConversionOptions(
            alpha_composition_mode=ColorConversionOptions.ALPHA_SOLID,
            background_rgb=(0xFFFF, 0x0000, 0x8080))
        out = convert_image(img, Colorspace.RGB, Chroma.C444,
                            target_has_alpha=False, options=opts)
        assert not out.has_channel(Channel.Alpha)
        a = np.asarray(img.plane(Channel.Alpha)).astype(np.int64)
        for ch, bkg16 in ((Channel.R, 0xFFFF), (Channel.G, 0x0000),
                          (Channel.B, 0x8080)):
            c = np.asarray(img.plane(ch)).astype(np.int64)
            bkg = bkg16 >> 8
            expect = (c * a + bkg * (255 - a)) >> 8
            assert (np.asarray(out.plane(ch)) == expect).all()

    def test_checkerboard_flatten(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.color.ops import ColorConversionOptions
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        img = self._rgba(16, 16)
        opts = ColorConversionOptions(
            alpha_composition_mode=ColorConversionOptions.ALPHA_CHECKERBOARD,
            background_rgb=(0xFFFF,) * 3,
            secondary_background_rgb=(0x0000,) * 3,
            checkerboard_square_size=4)
        out = convert_image(img, Colorspace.RGB, Chroma.C444,
                            target_has_alpha=False, options=opts)
        a = np.asarray(img.plane(Channel.Alpha)).astype(np.int64)
        c = np.asarray(img.plane(Channel.R)).astype(np.int64)
        yy, xx = np.mgrid[0:16, 0:16]
        # parity-0 (top-left) square takes the SECONDARY background
        # (ref: alpha.cc `bkg = parity ? bkg1 : bkg2`)
        bkg = np.where(((yy // 4 + xx // 4) & 1) == 0, 0, 255)
        expect = (c * a + bkg * (255 - a)) >> 8
        assert (np.asarray(out.plane(Channel.R)) == expect).all()

    def test_mode_none_drops_alpha(self):
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        import numpy as np
        img = self._rgba()
        out = convert_image(img, Colorspace.RGB, Chroma.C444,
                            target_has_alpha=False)
        assert not out.has_channel(Channel.Alpha)
        # plain drop: color planes unchanged
        assert (np.asarray(out.plane(Channel.R))
                == np.asarray(img.plane(Channel.R))).all()

    def test_flatten_from_yuv_routes_through_rgb(self):
        import numpy as np
        from libheif_tpu.color import convert_image
        from libheif_tpu.color.ops import ColorConversionOptions
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(12)
        img = PixelImage(16, 16, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y, rng.integers(0, 256, (16, 16),
                                              dtype=np.uint8), 8)
        img.set_plane(Channel.Cb, rng.integers(0, 256, (8, 8),
                                               dtype=np.uint8), 8)
        img.set_plane(Channel.Cr, rng.integers(0, 256, (8, 8),
                                               dtype=np.uint8), 8)
        img.set_plane(Channel.Alpha, rng.integers(0, 256, (16, 16),
                                                  dtype=np.uint8), 8)
        opts = ColorConversionOptions(
            alpha_composition_mode=ColorConversionOptions.ALPHA_SOLID)
        out = convert_image(img, Colorspace.RGB, Chroma.C444,
                            target_has_alpha=False, options=opts)
        assert not out.has_channel(Channel.Alpha)
        assert out.has_channel(Channel.R)

    def test_context_decode_with_alpha_composition(self):
        """heif_decoding_options.color_conversion_options_ext analog:
        decoding with a composition mode flattens aux alpha."""
        import numpy as np
        from libheif_tpu.context import HeifContext
        from libheif_tpu.api.types import EncodingOptions
        from libheif_tpu.items.item import DecodingOptions
        from libheif_tpu.color.ops import ColorConversionOptions
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(13)
        img = PixelImage(32, 24, Colorspace.RGB, Chroma.C444)
        for ch in (Channel.R, Channel.G, Channel.B):
            img.set_plane(ch, rng.integers(0, 256, (24, 32),
                                           dtype=np.uint8), 8)
        img.set_plane(Channel.Alpha,
                      rng.integers(0, 256, (24, 32), dtype=np.uint8), 8)
        ctx = HeifContext()
        ctx.encode_image(img, fmt="unci",
                         options=EncodingOptions(lossless=True))
        data = ctx.write()
        ctx2 = HeifContext.read_from_bytes(data)
        opts = DecodingOptions()
        opts.color_conversion_options = ColorConversionOptions(
            alpha_composition_mode=ColorConversionOptions.ALPHA_SOLID,
            background_rgb=(0xFFFF,) * 3)
        out = ctx2.decode_image(options=opts)
        assert not out.has_channel(Channel.Alpha)
        # flattened over white: result >= source color wherever a < 255
        a = np.asarray(img.plane(Channel.Alpha)).astype(np.int64)
        c = np.asarray(img.plane(Channel.R)).astype(np.int64)
        expect = (c * a + 255 * (255 - a)) >> 8
        got = np.asarray(out.plane(Channel.R)).astype(np.int64)
        assert (got == expect).all()
