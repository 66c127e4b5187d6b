"""JPEG codec core conformance: difftest against libjpeg (via PIL).

Mirrors the reference's situation where JPEG items are decoded by
libjpeg behind the plugin ABI (plugins/decoder_libjpeg.cc /
encoder_libjpeg.cc): our in-tree codec must land on the same samples.

- Decode: luma and (for 4:4:4) chroma planes must be BIT-EXACT vs
  libjpeg's islow IDCT output (PIL `draft("YCbCr")` bypasses PIL's
  color conversion and returns libjpeg's raw output).
- Encode: decoding our stream with PIL must give the same PSNR as
  decoding a PIL/libjpeg-encoded stream at identical settings.
"""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from libheif_tpu.codecs.jpeg import decode_jpeg, encode_jpeg  # noqa: E402
from libheif_tpu.image.pixel_image import (  # noqa: E402
    PixelImage, Channel, Colorspace, Chroma)
from libheif_tpu.core.error import HeifError  # noqa: E402


def _test_rgb(w=96, h=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 4 + 1, w // 4 + 1, 3), dtype=np.uint8)
    return np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))


def _pil_jpeg(arr, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _libjpeg_ycbcr(data):
    im = Image.open(io.BytesIO(data))
    im.draft("YCbCr", im.size)
    assert im.mode == "YCbCr"
    return np.asarray(im)


@pytest.mark.parametrize("subsampling,chroma", [
    (0, Chroma.C444), (1, Chroma.C422), (2, Chroma.C420)])
def test_decode_luma_bit_exact(subsampling, chroma):
    data = _pil_jpeg(_test_rgb(), quality=85, subsampling=subsampling)
    out = decode_jpeg(data)
    assert out.chroma == chroma
    ref = _libjpeg_ycbcr(data)
    assert np.array_equal(ref[:, :, 0], np.asarray(out.plane(Channel.Y)))


def test_decode_444_all_planes_bit_exact():
    data = _pil_jpeg(_test_rgb(), quality=92, subsampling=0)
    out = decode_jpeg(data)
    ref = _libjpeg_ycbcr(data)
    for i, ch in enumerate((Channel.Y, Channel.Cb, Channel.Cr)):
        assert np.array_equal(ref[:, :, i], np.asarray(out.plane(ch))), ch


def test_decode_grayscale_bit_exact():
    img = _test_rgb()[:, :, 0]
    data = _pil_jpeg(img, quality=80)
    out = decode_jpeg(data)
    assert out.colorspace == Colorspace.Monochrome
    ref = np.asarray(Image.open(io.BytesIO(data)))
    assert np.array_equal(ref, np.asarray(out.plane(Channel.Y)))


def test_decode_odd_size_with_restarts():
    img = _test_rgb(93, 61)
    data = _pil_jpeg(img, quality=90, subsampling=2, restart_marker_blocks=2)
    out = decode_jpeg(data)
    assert (out.width, out.height) == (93, 61)
    ref = _libjpeg_ycbcr(data)
    assert np.array_equal(ref[:, :, 0], np.asarray(out.plane(Channel.Y)))


def test_decode_rejects_progressive():
    data = _pil_jpeg(_test_rgb(), quality=85, progressive=True)
    with pytest.raises(HeifError):
        decode_jpeg(data)


def test_decode_rejects_garbage():
    with pytest.raises(HeifError):
        decode_jpeg(b"\xff\xd8\x00\x01garbage")
    with pytest.raises(HeifError):
        decode_jpeg(b"not a jpeg at all")


def _rgb_pixel_image(arr):
    h, w = arr.shape[:2]
    img = PixelImage(w, h, Colorspace.RGB, Chroma.C444)
    for i, c in enumerate((Channel.R, Channel.G, Channel.B)):
        img.set_plane(c, arr[:, :, i], 8)
    return img


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / mse)


@pytest.mark.parametrize("chroma,pil_sub", [
    (Chroma.C444, 0), (Chroma.C420, 2)])
def test_encode_rd_parity_with_libjpeg(chroma, pil_sub):
    from libheif_tpu.color import convert_image
    arr = _test_rgb()
    ycc = convert_image(_rgb_pixel_image(arr), Colorspace.YCbCr, chroma)
    ours = encode_jpeg(ycc, quality=90)
    dec = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    pil_stream = _pil_jpeg(arr, quality=90, subsampling=pil_sub)
    pil_dec = np.asarray(Image.open(io.BytesIO(pil_stream)).convert("RGB"))
    ours_psnr = _psnr(dec, arr)
    pil_psnr = _psnr(pil_dec, arr)
    assert ours_psnr >= pil_psnr - 0.5, (ours_psnr, pil_psnr)


def test_encode_self_roundtrip_and_gray():
    arr = _test_rgb()
    g = PixelImage(96, 64, Colorspace.Monochrome, Chroma.Monochrome)
    g.set_plane(Channel.Y, arr[:, :, 0], 8)
    data = encode_jpeg(g, quality=95)
    ours = decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)))
    assert np.array_equal(ref, np.asarray(ours.plane(Channel.Y)))
    assert _psnr(ref, arr[:, :, 0]) > 35


def test_jpeg_item_in_heif_container_roundtrip(tmp_path):
    """jpeg item encode → HEIF write → read → decode
    (ref: ImageItem_JPEG jpeg.h:31 + heif_enc --format=jpeg path)."""
    from libheif_tpu.context import HeifContext, EncodingOptions
    arr = _test_rgb(64, 48)
    img = _rgb_pixel_image(arr)
    ctx = HeifContext()
    opts = EncodingOptions(quality=92)
    item_id = ctx.encode_image(img, fmt="jpeg", options=opts)
    ctx.set_primary_item(item_id)
    path = str(tmp_path / "jpeg_item.heif")
    ctx.write_to_file(path)

    ctx2 = HeifContext.read_from_file(path)
    item = ctx2.get_item(ctx2.primary_item_id)
    assert item.item_type == "jpeg"
    out = ctx2.decode_image(colorspace=Colorspace.RGB, chroma=Chroma.C444)
    dec = np.stack([np.asarray(out.plane(c))
                    for c in (Channel.R, Channel.G, Channel.B)], axis=-1)
    assert dec.shape == arr.shape
    assert _psnr(dec, arr) > 25


def test_native_encode_byte_identical_to_anchor(monkeypatch):
    """The C FDCT/quant + Huffman emitter must produce byte-identical
    streams to the jnp/Python anchor path (the same engine-vs-anchor
    discipline as the HEVC/AVC native encoders)."""
    from libheif_tpu import native
    if native.get_lib() is None:
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(11)
    for w, h, chroma in ((96, 64, Chroma.C420), (80, 48, Chroma.C444),
                         (41, 35, Chroma.C420)):
        img = PixelImage(w, h, Colorspace.YCbCr, chroma)
        img.set_plane(Channel.Y,
                      rng.integers(0, 256, (h, w), np.uint8), 8)
        cw = w if chroma == Chroma.C444 else (w + 1) // 2
        ch = h if chroma == Chroma.C444 else (h + 1) // 2
        img.set_plane(Channel.Cb,
                      rng.integers(0, 256, (ch, cw), np.uint8), 8)
        img.set_plane(Channel.Cr,
                      rng.integers(0, 256, (ch, cw), np.uint8), 8)
        monkeypatch.setenv("LIBHEIF_TPU_JPEG_BACKEND", "native")
        nat = encode_jpeg(img, quality=80)
        monkeypatch.setenv("LIBHEIF_TPU_JPEG_BACKEND", "cpu")
        ref = encode_jpeg(img, quality=80)
        assert nat == ref
        # and PIL decodes the stream
        dec = Image.open(io.BytesIO(nat))
        dec.load()
        assert dec.size == (w, h)
