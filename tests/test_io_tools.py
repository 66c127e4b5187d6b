"""IO codecs (PNG/Y4M/PPM), brands, and CLI tool tests
(ref behavior: heifio/*, examples/heif_{info,dec,enc}.cc,
libheif/brands.cc)."""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

from libheif_tpu import brands
from libheif_tpu.io import (read_png, write_png, read_y4m, write_y4m,
                            read_ppm, write_ppm)

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


@pytest.mark.parametrize("shape,bd", [
    ((7, 5), 8), ((7, 5, 3), 8), ((4, 4, 4), 8), ((3, 9, 2), 8),
    ((5, 6, 3), 16),
])
def test_png_roundtrip(shape, bd):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 2 ** bd, shape,
                       np.uint16 if bd == 16 else np.uint8)
    out, obd = read_png(write_png(arr, bd))
    ref = arr[:, :, None] if arr.ndim == 2 else arr
    assert obd == bd and np.array_equal(out, ref)


def _png_with_filter(arr, ft):
    h, w, c = arr.shape
    raw = arr.reshape(h, -1)
    lines = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        lines.append(ft)
        cur = raw[y].astype(np.int32)
        enc = np.zeros(w * c, np.int32)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            pred = [0, a, b, (a + b) >> 1][ft] if ft < 4 else None
            if ft == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    def ck(t, p):
        return struct.pack(">I", len(p)) + t + p + \
            struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + ck(b"IHDR", ihdr) +
            ck(b"IDAT", zlib.compress(bytes(lines))) + ck(b"IEND", b""))


@pytest.mark.parametrize("ft", range(5))
def test_png_all_filters(ft):
    rng = np.random.default_rng(ft)
    arr = rng.integers(0, 256, (6, 5, 3), np.uint8)
    out, _ = read_png(_png_with_filter(arr, ft))
    assert np.array_equal(out, arr)


def test_y4m_roundtrip():
    rng = np.random.default_rng(1)
    frames = [(rng.integers(0, 256, (8, 12), np.uint8),
               rng.integers(0, 256, (4, 6), np.uint8),
               rng.integers(0, 256, (4, 6), np.uint8)) for _ in range(2)]
    r = read_y4m(write_y4m(frames, (25, 1)))
    assert r["fps"] == (25, 1) and len(r["frames"]) == 2
    for a, b in zip(frames, r["frames"]):
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_ppm_roundtrip():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (4, 7, 3), np.uint8)
    assert np.array_equal(read_ppm(write_ppm(rgb)), rgb)
    g = rng.integers(0, 256, (4, 7), np.uint8)
    assert np.array_equal(read_ppm(write_ppm(g)), g)


def test_brands_computation():
    m, c = brands.compute_brands(["hvc1"], "hvc1")
    assert m == "heic" and "mif1" in c and "miaf" in c
    m, c = brands.compute_brands([], None, ["hvc1"])
    assert m == "msf1" and "hevc" in c
    m, c = brands.compute_brands(["av01"], "av01")
    assert m == "avif"
    m, c = brands.compute_brands(["unci"], "unci")
    assert m == "mif2"


def test_brands_reading():
    data = open("/root/reference/examples/example.heic", "rb").read(64)
    assert brands.read_main_brand(data) == "mif1"
    assert "heic" in brands.list_compatible_brands(data)
    assert brands.has_compatible_filetype(data)
    assert not brands.has_compatible_filetype(b"\0" * 32)


def test_write_sets_brands_from_content():
    from libheif_tpu.context import HeifContext
    from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                               Colorspace, Chroma)
    img = PixelImage(16, 16, Colorspace.YCbCr, Chroma.C444)
    for ch in (Channel.Y, Channel.Cb, Channel.Cr):
        img.set_plane(ch, np.full((16, 16), 100, np.uint8), 8)
    ctx = HeifContext()
    ctx.encode_image(img, fmt="hevc")
    d = ctx.write()
    assert brands.read_main_brand(d) == "heic"
    assert "MiHB" in brands.list_compatible_brands(d)


def test_cli_enc_dec_info(tmp_path):
    import heif_enc, heif_dec, heif_info
    x = np.linspace(0, 255, 64)[None, :] * np.ones((48, 1))
    arr = np.dstack([x, x * 0.8, x * 0.5]).astype(np.uint8)
    src = str(tmp_path / "in.png")
    with open(src, "wb") as f:
        f.write(write_png(arr))
    heic = str(tmp_path / "out.heic")
    assert heif_enc.main([src, "-c", "hevc", "-o", heic]) == 0
    out = str(tmp_path / "out.png")
    assert heif_dec.main([heic, out]) == 0
    dec, _ = read_png(open(out, "rb").read())
    mse = np.mean((dec.astype(np.float64) - arr) ** 2)
    assert mse < 100
    assert heif_info.main([heic]) == 0
    assert heif_info.main([heic, "-d"]) == 0


class TestJpegTiffIO:
    """heifio JPEG/TIFF converter equivalents (ref: heifio/decoder_jpeg.cc,
    encoder_jpeg.cc, decoder_tiff.cc, encoder_tiff.cc)."""

    def _rgb(self, w=40, h=30, seed=9, alpha=False, depth=8):
        import numpy as np
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(seed)
        hi = 1 << depth
        dt = np.uint16 if depth > 8 else np.uint8
        img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
        for ch in (Channel.R, Channel.G, Channel.B):
            img.set_plane(ch, rng.integers(0, hi, (h, w), dt), depth)
        if alpha:
            img.set_plane(Channel.Alpha, rng.integers(0, hi, (h, w), dt),
                          depth)
        return img

    def test_tiff_roundtrip_rgba(self):
        import numpy as np
        from libheif_tpu.io.tiff import read_tiff, write_tiff
        from libheif_tpu.image.pixel_image import Channel
        img = self._rgb(alpha=True)
        out = read_tiff(write_tiff(img))
        for ch in (Channel.R, Channel.G, Channel.B, Channel.Alpha):
            np.testing.assert_array_equal(np.asarray(img.plane(ch)),
                                          np.asarray(out.plane(ch)))

    def test_tiff_16bit_and_pil_crosscheck(self):
        import io
        import numpy as np
        import pytest
        from libheif_tpu.io.tiff import write_tiff, read_tiff
        from libheif_tpu.image.pixel_image import Channel
        img = self._rgb(depth=16)
        data = write_tiff(img)
        out = read_tiff(data)
        np.testing.assert_array_equal(np.asarray(img.plane(Channel.R)),
                                      np.asarray(out.plane(Channel.R)))
        PIL = pytest.importorskip("PIL.Image")
        pim = PIL.open(io.BytesIO(data))
        pim.load()
        assert pim.size == (img.width, img.height)

    def test_tiff_big_endian_read(self):
        import numpy as np
        import pytest
        from libheif_tpu.io.tiff import read_tiff
        from libheif_tpu.image.pixel_image import Channel
        PIL = pytest.importorskip("PIL.Image")
        import io
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (12, 17, 3), np.uint8)
        pim = PIL.fromarray(arr, "RGB")
        buf = io.BytesIO()
        pim.save(buf, format="TIFF")  # PIL writes II; also test MM below
        out = read_tiff(buf.getvalue())
        np.testing.assert_array_equal(np.asarray(out.plane(Channel.R)),
                                      arr[:, :, 0])

    def test_jpeg_roundtrip_via_own_codec(self):
        import numpy as np
        from libheif_tpu.io.jpeg import read_jpeg, write_jpeg
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(11)
        img = PixelImage(48, 32, Colorspace.YCbCr, Chroma.C420)
        img.set_plane(Channel.Y,
                      rng.integers(40, 200, (32, 48), np.uint8), 8)
        img.set_plane(Channel.Cb, np.full((16, 24), 110, np.uint8), 8)
        img.set_plane(Channel.Cr, np.full((16, 24), 150, np.uint8), 8)
        data = write_jpeg(img, quality=92)
        assert data[:2] == b"\xff\xd8"
        out = read_jpeg(data)
        a = np.asarray(img.plane(Channel.Y), dtype=np.float64)
        b = np.asarray(out.plane(Channel.Y), dtype=np.float64)
        psnr = 10 * np.log10(255 ** 2 / max(1e-9, np.mean((a - b) ** 2)))
        assert psnr > 30

    def test_jpeg_pil_crosscheck(self):
        import io
        import numpy as np
        import pytest
        from libheif_tpu.io.jpeg import write_jpeg
        PIL = pytest.importorskip("PIL.Image")
        img = self._rgb()
        from libheif_tpu.color.pipeline import convert_image
        from libheif_tpu.image.pixel_image import Colorspace, Chroma
        yuv = convert_image(img, Colorspace.YCbCr, Chroma.C420)
        data = write_jpeg(yuv, quality=90)
        pim = PIL.open(io.BytesIO(data))
        pim.load()
        assert pim.size == (img.width, img.height)


class TestWebP:
    """heifio WebP converter parity (ref: heifio/decoder_webp.cc,
    encoder_webp.cc) — ctypes wrap of the same system libwebp."""

    def _img(self, w=40, h=24, alpha=False):
        import numpy as np
        from libheif_tpu.image.pixel_image import (PixelImage, Channel,
                                                   Colorspace, Chroma)
        rng = np.random.default_rng(5)
        img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
        img.set_plane(Channel.R, (np.mgrid[0:h, 0:w][1] * 6 % 256
                                  ).astype(np.uint8), 8)
        img.set_plane(Channel.G, np.full((h, w), 77, np.uint8), 8)
        img.set_plane(Channel.B, rng.integers(0, 256, (h, w),
                                              dtype=np.uint8), 8)
        if alpha:
            img.set_plane(Channel.Alpha,
                          rng.integers(0, 255, (h, w), dtype=np.uint8), 8)
        return img

    def test_lossless_roundtrip(self):
        import numpy as np
        from libheif_tpu import io as hio
        from libheif_tpu.image.pixel_image import Channel
        img = self._img()
        data = hio.write_webp(img, lossless=True)
        assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
        out = hio.read_webp(data)
        assert (out.width, out.height) == (img.width, img.height)
        for ch in (Channel.R, Channel.G, Channel.B):
            assert np.array_equal(np.asarray(out.plane(ch)),
                                  np.asarray(img.plane(ch))), ch

    def test_lossy_alpha(self):
        import numpy as np
        from libheif_tpu import io as hio
        from libheif_tpu.image.pixel_image import Channel
        img = self._img(alpha=True)
        data = hio.write_webp(img, quality=85)
        out = hio.read_webp(data)
        assert out.has_channel(Channel.Alpha)
        r0 = np.asarray(img.plane(Channel.R)).astype(np.int64)
        r1 = np.asarray(out.plane(Channel.R)).astype(np.int64)
        assert ((r0 - r1) ** 2).mean() < 2000     # lossy but sane

    def test_bad_data_raises(self):
        import pytest
        from libheif_tpu import io as hio
        from libheif_tpu.core.error import HeifError
        with pytest.raises(HeifError):
            hio.read_webp(b"not a webp file at all")


def test_cli_heif_test_and_view(tmp_path, capsys):
    """heif-test raw-plane dump + heif-view renderers (ref:
    examples/heif_test.cc, examples/heif_view.cc)."""
    import heif_test, heif_view
    from libheif_tpu.context import HeifContext

    src = "/root/reference/tests/data/uncompressed_comp_RGB.heif"
    ctx = HeifContext.read_from_file(src)
    pid = ctx.primary_item_id
    img = ctx.decode_image(pid)

    import contextlib, io as _io
    from libheif_tpu.image.pixel_image import Channel
    buf = _io.BytesIO()

    class _Out:
        buffer = buf
    old = sys.stdout
    sys.stdout = _Out()
    try:
        assert heif_test.main(["-d", str(pid), src]) == 0
    finally:
        sys.stdout = old
    raw = buf.getvalue()
    planes = b"".join(
        np.ascontiguousarray(np.asarray(img.plane(c))).tobytes()
        for c in (Channel.R, Channel.G, Channel.B))
    assert raw == planes

    png = str(tmp_path / "v.png")
    assert heif_view.main(["--png", png, src]) == 0
    from libheif_tpu.io import read_png
    arr, _ = read_png(open(png, "rb").read())
    assert arr.shape[:2] == (20, 30)

    assert heif_view.main(["-w", "16", src]) == 0
    out = capsys.readouterr().out
    assert "\x1b[38;2;" in out
