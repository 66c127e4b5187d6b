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
