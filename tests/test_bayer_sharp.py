"""Bayer demosaic + sharp-YUV downsampling tests
(reference: color-conversion/bayer_bilinear.cc, rgb2yuv_sharp.cc)."""

import numpy as np
import pytest


def _mosaic_from_rgb(rgb, channels, ph, pw):
    """Build a CFA mosaic plane by sampling rgb per pattern cell."""
    h, w = rgb.shape[:2]
    out = np.zeros((h, w), rgb.dtype)
    idx = {"R": 0, "G": 1, "B": 2}
    for py in range(ph):
        for px in range(pw):
            ch = idx[channels[py * pw + px]]
            out[py::ph, px::pw] = rgb[py::ph, px::pw, ch]
    return out


def _oracle_demosaic(mosaic, channels, ph, pw):
    """Direct numpy port of the reference's neighbour-offset averaging
    (bayer_bilinear.cc:139-185): for each pixel, missing channels are
    the equal-weight mean of same-channel neighbours within the
    (2ph-1)x(2pw-1) window, skipping out-of-image taps."""
    h, w = mosaic.shape
    idx = {"R": 0, "G": 1, "B": 2}
    cell = np.array([idx[c] for c in channels]).reshape(ph, pw)
    out = np.zeros((h, w, 3), np.float64)
    for y in range(h):
        for x in range(w):
            this_ch = cell[y % ph, x % pw]
            acc = [[] for _ in range(3)]
            acc[this_ch].append(mosaic[y, x])
            for dy in range(-(ph - 1), ph):
                for dx in range(-(pw - 1), pw):
                    if dx == 0 and dy == 0:
                        continue
                    ny, nx = y + dy, x + dx
                    if not (0 <= ny < h and 0 <= nx < w):
                        continue
                    nch = cell[ny % ph, nx % pw]
                    if nch != this_ch:
                        acc[nch].append(mosaic[ny, nx])
            for c in range(3):
                out[y, x, c] = np.mean(acc[c]) if acc[c] else 0
    return out


def _smooth_rgb(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 7) % 256
    g = (yy * 5 + xx) % 256
    b = ((xx + yy) * 3) % 256
    return np.dstack([r, g, b]).astype(np.uint8)


class TestBayerDemosaic:

    PATTERNS = {
        "rggb": ["R", "G", "G", "B"],
        "bggr": ["B", "G", "G", "R"],
        "grbg": ["G", "R", "B", "G"],
    }

    @pytest.mark.parametrize("name", list(PATTERNS))
    def test_matches_reference_oracle(self, name):
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma,
                                                   BayerPattern)
        channels = self.PATTERNS[name]
        rgb = _smooth_rgb()
        mosaic = _mosaic_from_rgb(rgb, channels, 2, 2)
        img = PixelImage(32, 24, Colorspace.FilterArray,
                         Chroma.Monochrome)
        img.set_plane(Channel.FilterArray, mosaic, 8)
        img.bayer_pattern = BayerPattern(2, 2, channels)
        out = convert_image(img, Colorspace.RGB, Chroma.C444)
        oracle = _oracle_demosaic(mosaic.astype(np.float64),
                                  channels, 2, 2)
        for ci, ch in enumerate((Channel.R, Channel.G, Channel.B)):
            got = np.asarray(out.plane(ch)).astype(np.float64)
            want = np.clip(np.round(oracle[:, :, ci]), 0, 255)
            assert np.abs(got - want).max() <= 1, (name, ch)

    def test_native_cells_pass_through(self):
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma,
                                                   BayerPattern)
        rgb = _smooth_rgb()
        mosaic = _mosaic_from_rgb(rgb, ["R", "G", "G", "B"], 2, 2)
        img = PixelImage(32, 24, Colorspace.FilterArray,
                         Chroma.Monochrome)
        img.set_plane(Channel.FilterArray, mosaic, 8)
        img.bayer_pattern = BayerPattern.rggb()
        out = convert_image(img, Colorspace.RGB, Chroma.C444)
        r = np.asarray(out.plane(Channel.R))
        assert np.array_equal(r[0::2, 0::2], mosaic[0::2, 0::2])
        b = np.asarray(out.plane(Channel.B))
        assert np.array_equal(b[1::2, 1::2], mosaic[1::2, 1::2])

    def test_missing_pattern_raises(self):
        from libheif_tpu.color import convert_image
        from libheif_tpu.core.error import HeifError
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        img = PixelImage(8, 8, Colorspace.FilterArray, Chroma.Monochrome)
        img.set_plane(Channel.FilterArray, np.zeros((8, 8), np.uint8), 8)
        with pytest.raises(HeifError):
            convert_image(img, Colorspace.RGB, Chroma.C444)

    def test_end_to_end_cpat_file(self, tmp_path):
        """unci filter_array item + cpat property → write → read →
        decode → demosaic (ref: unc_codec.cc cpat interpretation)."""
        from libheif_tpu.api import HeifContext, EncodingOptions
        from libheif_tpu.boxes.unc import Box_cpat
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rgb = _smooth_rgb()
        mosaic = _mosaic_from_rgb(rgb, ["R", "G", "G", "B"], 2, 2)
        img = PixelImage(32, 24, Colorspace.FilterArray,
                         Chroma.Monochrome)
        img.set_plane(Channel.FilterArray, mosaic, 8)
        ctx = HeifContext()
        iid = ctx.encode_image(img, fmt="unci", options=EncodingOptions())
        cpat = Box_cpat()
        cpat.pattern_width = 2
        cpat.pattern_height = 2
        cpat.components = [0, 0, 0, 0]   # single filter_array component
        cpat.component_gains = [1.0] * 4
        ctx.file.add_property(iid, cpat, False)
        data = ctx.write()

        back = HeifContext.read_from_bytes(data)
        dec = back.decode_image(back.primary_item_id)
        assert dec.colorspace == Colorspace.FilterArray
        # cpat with a single mosaic component: every cell maps to the
        # filter_array channel; pattern geometry survives the roundtrip
        assert dec.bayer_pattern is not None
        assert (dec.bayer_pattern.pattern_width,
                dec.bayer_pattern.pattern_height) == (2, 2)
        assert np.array_equal(
            np.asarray(dec.plane(Channel.FilterArray)), mosaic)


class TestSharpYUV:

    def test_sharp_beats_average_on_reconstruction(self):
        """min ‖up(C_sub) − C‖²: the sharp-yuv iteration must strictly
        reduce bilinear-reconstruction error vs plain averaging."""
        import jax.numpy as jnp
        from libheif_tpu.color import convert_image, ColorConversionOptions
        from libheif_tpu.color.ops import _upsample
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(3)
        h, w = 40, 64
        # high-frequency chroma: worst case for plain averaging
        cb = (128 + 90 * np.sin(np.mgrid[0:h, 0:w][1] * 1.1)
              ).astype(np.uint8)
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C444)
        img.set_plane(Channel.Y, rng.integers(0, 256, (h, w),
                                              dtype=np.uint8), 8)
        img.set_plane(Channel.Cb, cb, 8)
        img.set_plane(Channel.Cr, np.full((h, w), 128, np.uint8), 8)

        errs = {}
        for method in (ColorConversionOptions.AVERAGE,
                       ColorConversionOptions.SHARP_YUV):
            opts = ColorConversionOptions(chroma_downsampling=method)
            sub = convert_image(img, Colorspace.YCbCr, Chroma.C420,
                                options=opts)
            up = np.asarray(_upsample(
                np.asarray(sub.plane(Channel.Cb)), h, w,
                ColorConversionOptions.BILINEAR))
            errs[method] = float(((up - cb.astype(np.float64)) ** 2
                                  ).mean())
        assert errs[ColorConversionOptions.SHARP_YUV] < \
            errs[ColorConversionOptions.AVERAGE] * 0.8, errs

    def test_sharp_flat_image_is_exact(self):
        """On flat chroma, sharp and average must agree exactly."""
        from libheif_tpu.color import convert_image, ColorConversionOptions
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        h, w = 16, 16
        img = PixelImage(w, h, Colorspace.YCbCr, Chroma.C444)
        img.set_plane(Channel.Y, np.full((h, w), 77, np.uint8), 8)
        img.set_plane(Channel.Cb, np.full((h, w), 200, np.uint8), 8)
        img.set_plane(Channel.Cr, np.full((h, w), 30, np.uint8), 8)
        opts = ColorConversionOptions(
            chroma_downsampling=ColorConversionOptions.SHARP_YUV)
        sub = convert_image(img, Colorspace.YCbCr, Chroma.C420,
                            options=opts)
        assert np.all(np.asarray(sub.plane(Channel.Cb)) == 200)
        assert np.all(np.asarray(sub.plane(Channel.Cr)) == 30)


class TestGenBayerTool:
    """heif-gen-bayer tool + encoder-side cpat resolution
    (ref: examples/heif_gen_bayer.cc, unc_encoder.cc cpat writing)."""

    def test_generate_decode_demosaic(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tools"))
        import heif_gen_bayer
        from libheif_tpu import io as hio
        from libheif_tpu.api import HeifContext
        from libheif_tpu.color import convert_image
        from libheif_tpu.image.pixel_image import (Channel, Colorspace,
                                                   Chroma)
        rgb = _smooth_rgb(32, 48)
        png = tmp_path / "in.png"
        png.write_bytes(hio.write_png(rgb))
        out = str(tmp_path / "b.heif")
        assert heif_gen_bayer.main([str(png), out, "-p", "bggr"]) == 0
        ctx = HeifContext.read_from_file(out)
        img = ctx.decode_image(ctx.primary_item_id)
        assert img.colorspace == Colorspace.FilterArray
        assert img.bayer_pattern.channels == ["B", "G", "G", "R"]
        dem = convert_image(img, Colorspace.RGB, Chroma.C444)
        err = np.abs(np.asarray(dem.plane(Channel.R)).astype(int)
                     - rgb[:, :, 0].astype(int))
        assert err.mean() < 3

    def test_encoder_writes_reference_components(self, tmp_path):
        """cpat must reference plane-less R/G/B cmpd components while
        uncC references only the filter_array plane."""
        import numpy as np
        from libheif_tpu.api import HeifContext, EncodingOptions
        from libheif_tpu.boxes.unc import Box_cmpd, Box_cpat, Box_uncC
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma,
                                                   BayerPattern)
        img = PixelImage(8, 8, Colorspace.FilterArray, Chroma.Monochrome)
        img.set_plane(Channel.FilterArray,
                      np.arange(64, dtype=np.uint8).reshape(8, 8), 8)
        img.bayer_pattern = BayerPattern.rggb()
        ctx = HeifContext()
        iid = ctx.encode_image(img, fmt="unci",
                               options=EncodingOptions())
        data = ctx.write()
        back = HeifContext.read_from_bytes(data)
        item = back.get_item(back.primary_item_id)
        cmpd = item.get_property(Box_cmpd)
        uncC = item.get_property(Box_uncC)
        cpat = item.get_property(Box_cpat)
        types = [c.component_type for c in cmpd.components]
        assert 11 in types and {4, 5, 6} <= set(types)
        assert len(uncC.components) == 1            # only the plane
        assert [types[i] for i in cpat.components] == [4, 5, 5, 6]
