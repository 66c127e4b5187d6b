"""ISO 23001-17 uncompressed decode — bit-exact against reference fixtures.

Model: reference tests/uncompressed_decode_*.cc (~3600 LoC of golden
pixel assertions over tests/data/uncompressed_*.heif).  Strategy:

1. assert the exact pixel values the reference tests REQUIRE (color-bar
   pattern, uncompressed_decode_rgb.cc:100-140 etc.);
2. cross-variant equality: every interleave variant of the same image
   must decode to identical planes;
3. every uncompressed fixture must decode without error.
"""

import glob
import os

import numpy as np
import pytest

from libheif_tpu.file import HeifFile
from libheif_tpu.boxes.unc import Box_uncC, Box_cmpd, Box_cmpC, Box_icef
from libheif_tpu.boxes.meta import Box_ispe
from libheif_tpu.codecs.unc import UnciDecoder

DATA = "/root/reference/tests/data"


def decode_file(path):
    hf = HeifFile.from_file(path)
    pid = hf.primary_item_id
    ispe = hf.get_property(pid, Box_ispe)
    dec = UnciDecoder(
        hf.get_property(pid, Box_uncC), hf.get_property(pid, Box_cmpd),
        ispe.width, ispe.height,
        cmpC=hf.get_property(pid, Box_cmpC),
        icef=hf.get_property(pid, Box_icef))
    return dec.decode(hf.get_item_data(pid)), dec


def fixture(name):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not available")
    return path


# The color-bar pattern all RGB fixtures contain (matches the
# reference REQUIRE values in uncompressed_decode_rgb.cc): 4px-wide
# vertical bars cycling a 10-color palette, rotating by one every
# 4-row band: color(x, y) = PALETTE[(x//4 + y//4) % 10].
BAR_COLORS = [
    (255, 0, 0), (0, 128, 0), (0, 0, 255), (255, 255, 255),
    (0, 0, 0), (255, 255, 0), (0, 255, 255), (128, 128, 128),
    (255, 165, 0), (238, 130, 238),
]


def expected_rgb(width, height):
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        band = y // 4
        for x in range(width):
            bar = x // 4
            img[y, x] = BAR_COLORS[(bar + band) % len(BAR_COLORS)]
    return img


class TestRGBPattern:
    def test_comp_rgb_matches_reference_values(self):
        img, _ = decode_file(fixture("uncompressed_comp_RGB.heif"))
        R = np.asarray(img.plane("R"))
        G = np.asarray(img.plane("G"))
        B = np.asarray(img.plane("B"))
        assert img.width == 30 and img.height == 20
        # exact values from uncompressed_decode_rgb.cc:108-140 (rows 0-4)
        for row in range(4):
            assert R[row, 0] == 255 and R[row, 3] == 255
            assert R[row, 4] == 0 and R[row, 7] == 0
            assert R[row, 8] == 0 and R[row, 11] == 0
            assert R[row, 12] == 255 and R[row, 15] == 255
            assert R[row, 16] == 0 and R[row, 19] == 0
            assert R[row, 20] == 255 and R[row, 23] == 255
            assert R[row, 24] == 0 and R[row, 27] == 0
            assert R[row, 28] == 128 and R[row, 29] == 128
        for row in range(4, 8):
            assert R[row, 0] == 0 and R[row, 3] == 0
            assert R[row, 4] == 0 and R[row, 7] == 0
            assert R[row, 8] == 255 and R[row, 11] == 255
            assert R[row, 12] == 0 and R[row, 15] == 0
            assert R[row, 16] == 255 and R[row, 19] == 255
            assert R[row, 20] == 0 and R[row, 23] == 0
            assert R[row, 24] == 128 and R[row, 27] == 128
        # G/B spot checks, row 0
        assert G[0, 4] == 128 and B[0, 8] == 255 and B[0, 24] == 255

    def test_pattern_model_matches(self):
        """Validate our bar-pattern model against the decoded image, then
        use it as the golden for every other variant."""
        img, _ = decode_file(fixture("uncompressed_comp_RGB.heif"))
        exp = expected_rgb(30, 20)
        got = np.stack([np.asarray(img.plane(c)) for c in "RGB"], axis=-1)
        np.testing.assert_array_equal(got, exp)


def rgb_variants():
    pats = ["uncompressed_{}_RGB.heif", "uncompressed_{}_ABGR.heif",
            "uncompressed_{}_RGxB.heif"]
    out = []
    for p in pats:
        for mode in ("comp", "pix", "row"):
            name = p.format(mode)
            if os.path.exists(os.path.join(DATA, name)):
                out.append(name)
    return out


class TestCrossVariantEquality:
    @pytest.mark.parametrize("suffix", ["RGB", "ABGR", "RGxB"])
    def test_untiled_variants_agree(self, suffix):
        imgs = {}
        for mode in ("comp", "pix", "row"):
            name = f"uncompressed_{mode}_{suffix}.heif"
            if not os.path.exists(os.path.join(DATA, name)):
                continue
            imgs[mode], _ = decode_file(os.path.join(DATA, name))
        assert len(imgs) >= 2
        ref_mode = next(iter(imgs))
        ref = imgs[ref_mode]
        for mode, img in imgs.items():
            assert img.channels() == ref.channels() or \
                set(img.channels()) == set(ref.channels())
            for ch in ref.channels():
                np.testing.assert_array_equal(
                    np.asarray(img.plane(ch)), np.asarray(ref.plane(ch)),
                    err_msg=f"{mode} vs {ref_mode} channel {ch}")

    @pytest.mark.parametrize("suffix", [
        "RGB_tiled", "ABGR_tiled", "RGxB_tiled", "B16R16G16_tiled",
        "M_tiled", "R5G6B5_tiled", "R7G7B7_tiled", "R7+1G7+1B7+1_tiled",
        "R7G7+1B7_tiled", "YUV_tiled", "RGB_tiled_row_tile_align",
    ])
    def test_tiled_variants_agree(self, suffix):
        imgs = {}
        for mode in ("comp", "pix", "row", "tile"):
            name = f"uncompressed_{mode}_{suffix}.heif"
            if not os.path.exists(os.path.join(DATA, name)):
                continue
            imgs[mode], _ = decode_file(os.path.join(DATA, name))
        assert len(imgs) >= 2, f"not enough variants for {suffix}"
        ref_mode = next(iter(imgs))
        ref = imgs[ref_mode]
        for mode, img in imgs.items():
            for ch in ref.channels():
                np.testing.assert_array_equal(
                    np.asarray(img.plane(ch)), np.asarray(ref.plane(ch)),
                    err_msg=f"{suffix}: {mode} vs {ref_mode} channel {ch}")

    def test_tiled_rgb_matches_untiled_pattern(self):
        """Tiled fixtures contain the same bar pattern."""
        img, _ = decode_file(fixture("uncompressed_comp_RGB_tiled.heif"))
        assert img.height == 20
        exp = expected_rgb(img.width, img.height)
        got = np.stack([np.asarray(img.plane(c)) for c in "RGB"], axis=-1)
        np.testing.assert_array_equal(got, exp)

    def test_rgb7_matches_8bit_rescaled(self):
        """R7G7B7 stores the same pattern rescaled: v7 = v8*127//255
        (fixture generation rule, verified against reference decode)."""
        img7, _ = decode_file(fixture("uncompressed_comp_R7G7B7_tiled.heif"))
        img8, _ = decode_file(fixture("uncompressed_comp_RGB_tiled.heif"))
        for ch in "RGB":
            v8 = np.asarray(img8.plane(ch)).astype(np.uint32)
            np.testing.assert_array_equal(
                np.asarray(img7.plane(ch)), (v8 * 127) // 255, err_msg=ch)

    def test_rgb565_matches_8bit_rescaled(self):
        img5, _ = decode_file(fixture("uncompressed_comp_R5G6B5_tiled.heif"))
        img8, _ = decode_file(fixture("uncompressed_comp_RGB_tiled.heif"))
        for ch, bits in (("R", 5), ("G", 6), ("B", 5)):
            v8 = np.asarray(img8.plane(ch)).astype(np.uint32)
            np.testing.assert_array_equal(
                np.asarray(img5.plane(ch)),
                (v8 * ((1 << bits) - 1)) // 255, err_msg=ch)

    def test_rgb16_matches_8bit_scaled(self):
        """B16R16G16 fixtures hold the 8-bit pattern left-shifted."""
        img16, _ = decode_file(fixture("uncompressed_comp_B16R16G16.heif"))
        img8, _ = decode_file(fixture("uncompressed_comp_RGB.heif"))
        r16 = np.asarray(img16.plane("R"))
        r8 = np.asarray(img8.plane("R")).astype(np.uint16)
        assert r16.dtype == np.uint16
        # same spatial pattern whichever the scale factor
        assert ((r16 > 0) == (r8 > 0)).all()
        # and 1:1 value mapping
        for v8 in np.unique(r8):
            vals16 = np.unique(r16[r8 == v8])
            assert len(vals16) == 1, f"8-bit {v8} maps to {vals16}"


class TestYCbCr:
    @pytest.mark.parametrize("sub", ["420", "422"])
    def test_yuv_variant_consistency(self, sub):
        imgs = {}
        for name in (f"uncompressed_comp_YUV_{sub}.heif",
                     f"uncompressed_comp_YVU_{sub}.heif",
                     f"uncompressed_comp_VUY_{sub}.heif",
                     f"uncompressed_mix_YUV_{sub}.heif",
                     f"uncompressed_mix_YVU_{sub}.heif",
                     f"uncompressed_mix_VUY_{sub}.heif"):
            p = os.path.join(DATA, name)
            if os.path.exists(p):
                imgs[name], _ = decode_file(p)
        assert len(imgs) >= 4
        ref_name = next(iter(imgs))
        ref = imgs[ref_name]
        assert ref.chroma == sub
        for ch in ("Y", "Cb", "Cr"):
            assert ref.has_channel(ch)
        # chroma plane sizes
        assert ref.plane("Cb").shape[1] == (ref.width + 1) // 2
        if sub == "420":
            assert ref.plane("Cb").shape[0] == (ref.height + 1) // 2
        for name, img in imgs.items():
            for ch in ("Y", "Cb", "Cr"):
                np.testing.assert_array_equal(
                    np.asarray(img.plane(ch)), np.asarray(ref.plane(ch)),
                    err_msg=f"{name} channel {ch}")

    def test_yuv16_consistency(self):
        for sub in ("420", "422"):
            comp = os.path.join(DATA, f"uncompressed_comp_Y16U16V16_{sub}.heif")
            mix = os.path.join(DATA, f"uncompressed_mix_Y16U16V16_{sub}.heif")
            if not (os.path.exists(comp) and os.path.exists(mix)):
                pytest.skip("16-bit YUV fixtures missing")
            a, _ = decode_file(comp)
            b, _ = decode_file(mix)
            for ch in ("Y", "Cb", "Cr"):
                assert np.asarray(a.plane(ch)).dtype == np.uint16
                np.testing.assert_array_equal(np.asarray(a.plane(ch)),
                                              np.asarray(b.plane(ch)),
                                              err_msg=f"{sub}/{ch}")


class TestMonochromeAlpha:
    def test_mono(self):
        img, _ = decode_file(fixture("uncompressed_comp_M.heif"))
        assert img.has_channel("Y")
        assert img.colorspace == "monochrome"
        variants = ["uncompressed_pix_M.heif", "uncompressed_row_M.heif"]
        for v in variants:
            p = os.path.join(DATA, v)
            if os.path.exists(p):
                other, _ = decode_file(p)
                np.testing.assert_array_equal(np.asarray(img.plane("Y")),
                                              np.asarray(other.plane("Y")))

    def test_abgr_has_alpha(self):
        img, _ = decode_file(fixture("uncompressed_comp_ABGR.heif"))
        assert img.has_channel("Alpha")
        a = np.asarray(img.plane("Alpha"))
        assert a.shape == (20, 30)

    def test_rgxb_padded_component_skipped(self):
        img, _ = decode_file(fixture("uncompressed_comp_RGxB.heif"))
        assert set(img.channels()) == {"R", "G", "B"}
        # same pattern as plain RGB
        rgb, _ = decode_file(fixture("uncompressed_comp_RGB.heif"))
        for ch in "RGB":
            np.testing.assert_array_equal(np.asarray(img.plane(ch)),
                                          np.asarray(rgb.plane(ch)))


class TestGenericCompression:
    """All generic-compression fixtures contain the same 128x72 test
    card; every compression method/unit-granularity variant must decode
    to identical planes (cmpC whole-image, per-row and per-tile icef
    units, zlib/deflate/brotli)."""

    NAMES = ["rgb_generic_compressed_defl.heif",
             "rgb_generic_compressed_zlib.heif",
             "rgb_generic_compressed_zlib_rows.heif",
             "rgb_generic_compressed_zlib_tiled.heif",
             "rgb_generic_compressed_tile_deflate.heif",
             "rgb_generic_compressed_brotli.heif"]

    def test_all_variants_agree(self):
        from libheif_tpu.codecs.unc.codec import _HAS_BROTLI
        imgs = {}
        for name in self.NAMES:
            p = os.path.join(DATA, name)
            if not os.path.exists(p):
                continue
            if "brotli" in name and not _HAS_BROTLI:
                continue
            imgs[name], _ = decode_file(p)
        assert len(imgs) >= 4
        ref_name = next(iter(imgs))
        ref = imgs[ref_name]
        assert (ref.width, ref.height) == (128, 72)
        # spot values of the test card (verified vs reference decode):
        rgb = np.stack([np.asarray(ref.plane(c)) for c in "RGB"], axis=-1)
        assert tuple(rgb[0, 0]) == (255, 0, 0)
        assert tuple(rgb[0, 40]) == (0, 255, 0)
        assert tuple(rgb[0, 70]) == (0, 0, 255)
        assert tuple(rgb[30, 0]) == (255, 255, 255)
        assert tuple(rgb[60, 0]) == (192, 192, 192)
        for name, img in imgs.items():
            for ch in "RGB":
                np.testing.assert_array_equal(
                    np.asarray(img.plane(ch)), np.asarray(ref.plane(ch)),
                    err_msg=f"{name} ch {ch}")


class TestAllFixturesDecode:
    def test_every_uncompressed_fixture_decodes(self, ref_data_dir):
        from libheif_tpu.codecs.unc.codec import _HAS_BROTLI
        failures = []
        for path in sorted(glob.glob(os.path.join(ref_data_dir,
                                                  "uncompressed_*.heif"))):
            try:
                img, _ = decode_file(path)
                assert img.channels(), "no channels"
            except Exception as e:  # noqa: BLE001
                failures.append((os.path.basename(path), repr(e)))
        assert not failures, failures


class TestTileDecode:
    def test_single_tile_random_access(self):
        path = fixture("uncompressed_comp_RGB_tiled.heif")
        full, dec = decode_file(path)
        hf = HeifFile.from_file(path)
        data = hf.get_item_data(hf.primary_item_id)
        tw, th = dec.layout.tile_width, dec.layout.tile_height
        for ty in range(dec.layout.tile_rows):
            for tx in range(dec.layout.tile_cols):
                tile = dec.decode_tile(data, tx, ty)
                for ch in "RGB":
                    np.testing.assert_array_equal(
                        np.asarray(tile.plane(ch)),
                        np.asarray(full.plane(ch))[ty*th:(ty+1)*th,
                                                   tx*tw:(tx+1)*tw],
                        err_msg=f"tile {tx},{ty} ch {ch}")
